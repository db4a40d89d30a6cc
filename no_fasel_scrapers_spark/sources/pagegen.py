"""Distributed deterministic pages-table generator for the throughput bench.

The test Fixture (sources/fixture.py) builds a coherent mini-web on the
driver — right for golden tests, wrong for a throughput benchmark: at bench
scale the pages table itself must be produced in parallel.  Here every page
derives purely from its item index, so ``spark.range(n).mapInPandas`` builds
an arbitrarily large pages table with zero driver memory and identical bytes
at any parallelism (the determinism contract that makes the local[8] vs
local[32] scaling comparison an apples-to-apples run).

Pages are fasel-style detail pages (the reference's richest flat extractor
family, FaselMoviesScraper.py:14-47) plus one listing page per
``items_per_page`` items — so the benched extract stage runs the same
selector work production would.

Addressing: ``base_index`` offsets the item-id space, so a 10^10-URL
frontier is *addressed* by slicing generation windows without materializing
it (SURVEY.md §6 bench-input note).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .fixture import (
    EPOCH,
    H,
    _slug,
    fasel_detail_common,
    fasel_format,
    fasel_genres,
    fasel_iframe,
    fasel_image,
    raw_title,
)

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
_HOST = "fasel.test"


def detail_page(i: int) -> tuple[str, bytes, str]:
    """(url, html, expected_text) for item index ``i`` — pure function."""
    item_id = str(7000 + i)
    title_raw = raw_title("F", i)
    url = f"https://{_HOST}/movies/{item_id}-{_slug(title_raw, i)}"
    h = H()
    h.leaf("h2", title_raw)
    fasel_detail_common(h, item_id, fasel_format(i), fasel_genres(i))
    h.leaf("iframe", None, src=fasel_iframe(i))
    h.leaf("img", None, data_src=fasel_image(i, item_id))
    markup, text = h.page()
    return url, markup.encode("utf-8"), text


def gen_pages_mapper(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for i in pdf["id"]:
            url, html, text = detail_page(int(i))
            rows.append(
                {
                    "url": url,
                    "warc_ts": pd.Timestamp(EPOCH)
                    + pd.Timedelta(seconds=int(i) % 86400),
                    "html": html,
                    "text": text,
                    "lang": "ar" if int(i) % 10 < 6 else "en",
                }
            )
        yield pd.DataFrame(
            rows, columns=["url", "warc_ts", "html", "text", "lang"]
        )


def gen_pages(
    spark: SparkSession,
    n: int,
    partitions: int | None = None,
    base_index: int = 0,
) -> DataFrame:
    """Pages table of ``n`` fasel detail pages, generated distributed."""
    parts = partitions or spark.sparkContext.defaultParallelism * 2
    rng = spark.range(base_index, base_index + n, 1, parts)
    return rng.mapInPandas(gen_pages_mapper, schema=PAGES_SCHEMA)
