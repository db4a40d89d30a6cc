"""WARC Python DataSource: round-trip, framing edge cases, per-file
partitioning, and sidecar-index file pruning under url-prefix pushdown."""

import glob
import gzip
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from no_fasel_scrapers_spark.sources.warc import (
    WarcDataSource,
    _http_payload,
    iter_warc_records,
)

TS = datetime(2026, 1, 2, 3, 4, 5)


@pytest.fixture(scope="module")
def registered(spark):
    from no_fasel_scrapers_spark.sources import warc

    warc.register(spark)
    return spark


def _pages(spark, host, n, start=0):
    rows = [
        (
            f"https://{host}/p/{i}",
            TS,
            f"<html><body>doc {host} {i} é</body></html>".encode(),
            None,
            None,
        )
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def test_roundtrip_gzip(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "w")
    _pages(spark, "a.test", 25).repartition(3).write.format("warc").mode(
        "append"
    ).save(out)
    files = glob.glob(os.path.join(out, "part-*.warc.gz"))
    assert len(files) == 3                       # one file per task
    assert all(os.path.exists(f + ".hosts.json") for f in files)

    back = spark.read.format("warc").load(out)
    assert back.columns == ["url", "warc_ts", "html", "text", "lang"]
    rows = sorted(back.collect(), key=lambda r: r.url)
    assert len(rows) == 25
    assert rows[0].url == "https://a.test/p/0"
    assert rows[0].warc_ts == TS
    assert bytes(rows[0].html) == "<html><body>doc a.test 0 é</body></html>".encode()
    assert rows[0].text is None and rows[0].lang is None


def test_one_partition_per_file(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "files")
    _pages(spark, "b.test", 10).repartition(4).write.format("warc").mode("append").save(out)
    got = spark.read.format("warc").load(out)
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 10


def test_url_prefix_pushdown_prunes_files(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "pruned")
    _pages(spark, "keep.test", 8).coalesce(1).write.format("warc").mode(
        "append"
    ).save(out)
    _pages(spark, "drop.test", 8).coalesce(1).write.format("warc").mode(
        "append"
    ).save(out)

    q = (
        spark.read.format("warc")
        .load(out)
        .filter(F.col("url").startswith("https://keep.test/"))
    )
    # sidecar index eliminates the drop.test file before any read
    assert q.rdd.getNumPartitions() == 1
    assert q.count() == 8
    assert all(
        r.url.startswith("https://keep.test/") for r in q.collect()
    )


def test_overwrite_replaces(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "ovr")
    _pages(spark, "x.test", 5).coalesce(1).write.format("warc").mode("append").save(out)
    _pages(spark, "y.test", 3).coalesce(1).write.format("warc").mode(
        "overwrite"
    ).save(out)
    got = spark.read.format("warc").load(out)
    assert got.count() == 3
    assert all(r.url.startswith("https://y.test/") for r in got.collect())


def test_non_response_records_skipped(tmp_path):
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Length: 4\r\n\r\nabcd\r\n\r\n"
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://z.test/1\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        b"Content-Length: 50\r\n\r\n"
        b"HTTP/1.1 200 OK\r\nContent-Length: 11\r\n\r\nhello world\r\n\r\n"
    )
    p = tmp_path / "mini.warc.gz"
    with gzip.open(p, "wb") as fh:
        fh.write(raw)
    with gzip.open(p, "rb") as fh:
        recs = list(iter_warc_records(fh))
    assert [h.get("warc-type") for h, _ in recs] == ["warcinfo", "response"]
    assert _http_payload(recs[1][1]) == b"hello world"


def test_truncated_record_raises(tmp_path):
    import io

    bad = io.BytesIO(
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99\r\n\r\nshort"
    )
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_records(bad))


def test_multiple_pushed_prefixes_are_anded(registered, tmp_path):
    """Spark's pushFilters contract: accepted filters combine with AND and
    are NOT re-applied by Spark — two conflicting prefixes must yield 0."""
    from pyspark.sql import functions as F

    spark = registered
    out = str(tmp_path / "warc_and")
    docs = spark.createDataFrame(
        [("https://a.test/x", b"<p>a</p>"), ("https://b.test/y", b"<p>b</p>")],
        "url string, html binary",
    ).withColumn("warc_ts", F.lit(None).cast("timestamp")).withColumn(
        "text", F.lit(None).cast("string")
    ).withColumn("lang", F.lit(None).cast("string"))
    docs.write.format("warc").mode("overwrite").save(out)
    back = spark.read.format("warc").load(out)
    both = back.filter(F.col("url").startswith("https://a.test/")).filter(
        F.col("url").startswith("https://b.test/")
    )
    assert both.count() == 0
    one = back.filter(F.col("url").startswith("https://a.test/"))
    assert one.count() == 1
