"""O15 live upload stage: retry budget, dead-letter, webp conversion,
placeholder short-circuit — deterministic injected transports (the
requests/PIL defaults are honest NotImplementedError stubs here)."""

import pytest
from pyspark.sql import functions as F

from no_fasel_scrapers_spark.functions.decode_tables import PLACEHOLDER_IMAGE
from no_fasel_scrapers_spark.plans.image_upload import (
    UploadConfig,
    pil_webp_converter,
    requests_fetcher,
    upload_images,
    upload_images_foreach,
)


def _df(spark):
    rows = [
        ("a-fasel", "https://img.test/a.jpg"),     # uploads first try
        ("b-fasel", "https://img.test/b.webp"),    # webp → converted
        ("c-fasel", ""),                           # empty → placeholder
        ("d-fasel", "https://img.test/flaky.jpg"),  # succeeds on retry 3
        ("e-fasel", "https://img.test/dead.jpg"),  # exhausts the budget
    ]
    return spark.createDataFrame(rows, "content_id string, image_url string")


def _transports():
    def fetcher(url: str) -> bytes:
        if "dead" in url:
            raise ConnectionError("down")
        return f"BYTES:{url}".encode()

    def converter(payload: bytes) -> bytes:
        return b"JPG:" + payload

    flaky_state = {"d-fasel": 0}

    def uploader(cid: str, payload: bytes) -> str:
        if cid == "d-fasel":
            flaky_state[cid] += 1
            if flaky_state[cid] < 3:
                raise TimeoutError("busy")
        return f"https://i.hosted.test/{cid}/{len(payload)}"

    return fetcher, converter, uploader


def test_upload_images_retry_dead_letter_and_convert(spark):
    fetcher, converter, uploader = _transports()
    # single partition so the flaky counter's state survives across rows
    out = upload_images(
        _df(spark).coalesce(1),
        UploadConfig(max_retries=3, backoff_ms=0),
        fetcher=fetcher, converter=converter, uploader=uploader,
        sleep=lambda s: None,
    )
    got = {r["content_id"]: r for r in out.collect()}
    assert len(got) == 5

    assert got["a-fasel"]["status"] == "uploaded"
    assert got["a-fasel"]["attempts"] == 1
    # webp body went through the converter (length includes "JPG:" prefix)
    n_raw = len(f"BYTES:https://img.test/b.webp".encode())
    assert got["b-fasel"]["hosted_url"].endswith(f"/b-fasel/{n_raw + 4}")

    assert got["c-fasel"]["status"] == "placeholder"
    assert got["c-fasel"]["hosted_url"] == PLACEHOLDER_IMAGE
    assert got["c-fasel"]["attempts"] == 0

    assert got["d-fasel"]["status"] == "uploaded"
    assert got["d-fasel"]["attempts"] == 3

    assert got["e-fasel"]["status"] == "dead"
    assert got["e-fasel"]["attempts"] == 4  # 1 + max_retries
    assert got["e-fasel"]["hosted_url"] == PLACEHOLDER_IMAGE


def test_upload_foreach_accumulators(spark):
    fetcher, converter, uploader = _transports()
    stats = upload_images_foreach(
        _df(spark).coalesce(1),
        UploadConfig(max_retries=3, backoff_ms=0),
        fetcher=fetcher, converter=converter, uploader=uploader,
        sleep=lambda s: None,
    )
    assert stats == {"uploaded": 3, "placeholder": 1, "dead": 1}


def test_default_transports_are_stubbed():
    # PIL is absent in this container → honest stub; requests may or may
    # not be importable, so only assert behavior, not absence
    with pytest.raises(NotImplementedError):
        pil_webp_converter()
    try:
        import requests  # noqa: F401

        assert callable(requests_fetcher(UploadConfig()))
    except ImportError:
        with pytest.raises(NotImplementedError):
            requests_fetcher(UploadConfig())


def test_uploaded_rows_feed_the_cache_join(spark):
    """The result table closes the loop: uploaded rows become cache rows,
    and resolve_image then serves them as cache hits (Common.py:223-225)."""
    from no_fasel_scrapers_spark.plans.assemble import resolve_image

    fetcher, converter, uploader = _transports()
    out = upload_images(
        _df(spark).coalesce(1),
        UploadConfig(max_retries=3, backoff_ms=0),
        fetcher=fetcher, converter=converter, uploader=uploader,
        sleep=lambda s: None,
    )
    cache = out.filter(F.col("status") == "uploaded").select(
        F.col("content_id"), F.col("hosted_url").alias("image_url")
    )
    records = spark.createDataFrame(
        [("a-fasel", "https://img.test/a.jpg")],
        "ckey string, raw string",
    )
    resolved = resolve_image(
        F.col("ckey"), F.col("raw"), cache, records
    ).collect()[0]
    assert resolved["image_source"].startswith("https://i.hosted.test/a-fasel")
