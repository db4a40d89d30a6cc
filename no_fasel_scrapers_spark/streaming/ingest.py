"""Structured Streaming face of the engine — incremental page ingest.

The reference has no streaming at all (daily cron re-scrape,
``.github/workflows/autoupdater.yml:5-6``); the batch wave loop
(plans/crawl.py) is the parity path.  This module maps the same operators
onto an unbounded pages feed, which is how a production crawl actually
lands data: WARC/page files appear continuously, and extraction, dedup and
rollups should be incremental rather than daily-batch.

Pieces (each a thin composition of the batch operators):

- ``stream_pages``        file-source stream over a pages directory
                          (swap for Kafka/Kinesis via ``readStream.format``
                          on a real cluster — the transformations are
                          source-agnostic).
- ``streaming_extract``   the same Arrow-batched extraction UDF
                          (functions/extract.py) — mapInPandas works
                          unchanged on streaming DataFrames.
- ``dedup_stream``        URL-seen dedup as streaming state:
                          ``dropDuplicatesWithinWatermark`` on url_hash —
                          state bounded by the watermark horizon instead of
                          a bloom blob (the batch engine's seen-filter
                          covers the unbounded-history case; a stream only
                          needs the horizon where duplicates can still
                          arrive).
- ``hourly_lang_rollup``  watermarked tumbling-window aggregate (late pages
                          beyond the watermark are dropped, on time ones
                          update their window).
- ``politeness_state``    custom stateful operator via
                          ``applyInPandasWithState``: per-host fetch
                          sequence numbers + token-bucket schedule carried
                          ACROSS micro-batches (the batch engine's window
                          function can only order within one wave).

Scale notes: state is keyed by (host) for politeness and (url_hash) for
dedup — both hash-partitioned by Spark's streaming state store, so state
shards scale with ``spark.sql.shuffle.partitions``; no driver state.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.canonical import with_url_keys
from ..functions.extract import EXTRACT_SCHEMA, extract_map_in_pandas

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of pages parquet dropped into ``path``."""
    reader = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def streaming_extract(pages: DataFrame, role: str = "detail") -> DataFrame:
    """Extraction on the stream — identical UDF to the batch path."""
    return (
        pages.withColumn("role", F.lit(role))
        .select("url", "role", "html")
        .mapInPandas(extract_map_in_pandas, schema=EXTRACT_SCHEMA)
    )


def dedup_stream(pages: DataFrame, horizon: str = "2 hours") -> DataFrame:
    """Keep first sighting of each canonical URL within the watermark.

    State store holds one entry per url_hash inside the horizon; entries
    age out with the watermark, so state is bounded regardless of stream
    length."""
    keyed = with_url_keys(pages).withWatermark("warc_ts", horizon)
    return keyed.dropDuplicatesWithinWatermark(["url_hash"])


def exact_dedup_stream(
    docs: DataFrame,
    horizon: str = "2 hours",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of ``operators/dedup.exact_dedup``: drop later
    sightings of an already-seen text fingerprint within the watermark
    horizon (``dropDuplicatesWithinWatermark``).

    State is one entry per distinct fingerprint inside the horizon —
    never the text itself — and entries age out with the watermark, so
    state stays bounded regardless of stream length (the 10^10-doc
    shape).  Survivor CHOICE is arrival order (a stream cannot keep the
    min-id survivor without total-ordering the stream), so the emitted
    deterministic surface is the fingerprint set itself, which equals
    batch ``exact_dedup``'s key set exactly once the stream drains;
    NULL text fingerprints to NULL and forms its own group, matching the
    batch operator's null-safe grouping.
    """
    keyed = docs.withColumn("text_md5", F.md5(F.col(text_col)))
    keyed = keyed.withWatermark(ts_col, horizon)
    ded = keyed.dropDuplicatesWithinWatermark(["text_md5"])
    return ded.select(
        "text_md5", F.length(F.col(text_col)).alias("text_len")
    )


def hourly_lang_rollup(pages: DataFrame, lateness: str = "1 hour") -> DataFrame:
    """Tumbling 1h window per lang; late data beyond watermark dropped."""
    return (
        pages.withWatermark("warc_ts", lateness)
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("html").cast("long")).alias("bytes_in"),
        )
        .select(
            F.col("w.start").alias("window_start"), "lang", "n_pages",
            "bytes_in",
        )
    )


POLITENESS_STATE_DDL = "next_seq long, last_ms long"
POLITENESS_OUT_DDL = (
    "host string, url string, fetch_seq long, scheduled_ms long"
)


def _politeness_fn(
    key: Tuple[str],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-host token bucket across micro-batches.

    State = (next_seq, last_ms): the fetch sequence number and schedule
    offset survive between triggers, so a host crawled over many
    micro-batches still respects one global per-host budget — the streaming
    upgrade of operators/politeness.py (whose window only orders within a
    single wave)."""
    (host,) = key
    next_seq, last_ms = state.get if state.exists else (0, 0)
    out = []
    for pdf in batches:
        pdf = pdf.sort_values("url_hash")  # deterministic within batch
        delay = int(pdf["crawl_delay_ms"].iloc[0]) if len(pdf) else 0
        for url in pdf["url"]:
            out.append((host, url, next_seq, last_ms))
            next_seq += 1
            last_ms += delay
    state.update((next_seq, last_ms))
    yield pd.DataFrame(
        out, columns=["host", "url", "fetch_seq", "scheduled_ms"]
    )


def politeness_state(frontier: DataFrame) -> DataFrame:
    """Streaming per-host schedule: frontier rows (url, url_hash, host,
    crawl_delay_ms) → (host, url, fetch_seq, scheduled_ms) with state."""
    return frontier.groupBy("host").applyInPandasWithState(
        _politeness_fn,
        outputStructType=POLITENESS_OUT_DDL,
        stateStructType=POLITENESS_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_sink(
    stream: DataFrame,
    checkpoint: str,
    out_path: str | None = None,
    query_name: str = "nfs_stream",
    output_mode: str = "append",
):
    """Start an availableNow query: parquet sink (or memory sink for tests).

    availableNow processes everything present then stops — the incremental
    analog of one batch wave, and what a cron-triggered incremental ingest
    job would run.  Re-starting with the same checkpoint resumes streaming
    state (dedup horizon, politeness counters) exactly."""
    writer = (
        stream.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    if out_path:
        return (
            writer.format("parquet").outputMode(output_mode)
            .option("path", out_path).start()
        )
    return writer.format("memory").outputMode(output_mode).start()
