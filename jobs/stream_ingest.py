"""Incremental page-ingest job (Structured Streaming) — run via
spark-submit.

    spark-submit --py-files nfs_spark.zip jobs/stream_ingest.py \
        --src /data/pages_incoming --checkpoint /data/ckpt \
        --out /data/extracted [--dedup-horizon "2 hours"]

Processes everything currently in ``--src`` with trigger availableNow and
exits (cron-friendly incremental ingest); re-running with the same
checkpoint resumes dedup state, so a URL landing twice across runs is
extracted once.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--dedup-horizon", default="2 hours")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from no_fasel_scrapers_spark.session import get_spark
    from no_fasel_scrapers_spark.streaming.ingest import (
        dedup_stream,
        run_stream_to_sink,
        stream_pages,
        streaming_extract,
    )

    spark = get_spark(app_name="nfs-stream-ingest", master=args.master)
    pages = stream_pages(spark, args.src)
    fresh = dedup_stream(pages, horizon=args.dedup_horizon).drop(
        "canonical_url", "url_hash", "host", "host_salt"
    )
    extracted = streaming_extract(fresh)
    q = run_stream_to_sink(
        extracted, checkpoint=args.checkpoint, out_path=args.out,
        query_name="nfs_stream_ingest",
    )
    q.awaitTermination()
    out_rows = spark.read.parquet(args.out).count()
    print(json.dumps({"out_rows_total": out_rows}))
    spark.stop()


if __name__ == "__main__":
    main()
