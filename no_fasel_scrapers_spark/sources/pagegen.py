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


# ---------------------------------------------------------------------------
# Full crawlable site (listings + pagination + details) at scale
# ---------------------------------------------------------------------------

def listing_page(
    p: int, n_items: int, per: int = 16
) -> tuple[str, bytes, str]:
    """Listing page ``p`` of the scale site — pure function of (p, n).

    Byte-compatible with the Fixture's fasel listing markup (same card
    divs ``_x_fasel_listing`` scans, same ``»``-anchor pagination
    ``_last_page_fasel`` parses), so the crawl engine discovers detail
    links and the pagination extent exactly as on the golden fixture."""
    last = max((n_items + per - 1) // per, 1)
    h = H()
    h.leaf("h3", f"Page {p}")
    lo = (p - 1) * per
    for i in range(lo, min(lo + per, n_items)):
        item_id = str(7000 + i)
        title_raw = raw_title("F", i)
        detail = f"https://{_HOST}/movies/{item_id}-{_slug(title_raw, i)}"
        h.open("div", class_="col-xl-2 col-lg-2 col-md-3 col-sm-3")
        h.open("a", href=detail)
        h.leaf("div", title_raw, class_="h1")
        h.close("a")
        h.leaf("img", None, data_src=fasel_image(i, item_id))
        h.close("div")
    h.open("ul", class_="pag")
    h.leaf("li", "1", class_="page-item")
    h.leaf("li", str(last), class_="page-item")
    h.close("ul")
    h.leaf("a", "»", href=f"https://{_HOST}/movies/page/{last}")
    markup, text = h.page()
    return f"https://{_HOST}/movies/page/{p}", markup.encode("utf-8"), text


def _listing_mapper(n_items: int, per: int):
    def mapper(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["id"]:
                url, html, text = listing_page(int(p), n_items, per)
                rows.append(
                    {
                        "url": url,
                        "warc_ts": pd.Timestamp(EPOCH)
                        + pd.Timedelta(seconds=int(p) % 86400),
                        "html": html,
                        "text": text,
                        "lang": "en",
                    }
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return mapper


def gen_site_pages(
    spark: SparkSession,
    n_items: int,
    per: int = 16,
    partitions: int | None = None,
) -> DataFrame:
    """Crawlable single-host site at arbitrary scale: the root listing +
    all listing pages + all detail pages, generated distributed.

    Feeding this to ``plans.crawl.run_crawl`` with the matching seed row
    (:func:`site_seed_rows`) exercises the FULL engine — pagination-extent
    discovery, frontier waves, bloom dedup, salted single-mega-host
    politeness — at real wave sizes (one listing wave of n/per pages, one
    detail wave of n pages), unlike the golden fixture's ~330-page web.
    """
    parts = partitions or spark.sparkContext.defaultParallelism * 2
    details = gen_pages(spark, n_items, parts)
    last = max((n_items + per - 1) // per, 1)
    listings = spark.range(1, last + 1, 1, max(parts // per, 1)).mapInPandas(
        _listing_mapper(n_items, per), schema=PAGES_SCHEMA
    )
    _root_url, root_html, root_text = listing_page(1, n_items, per)
    root = spark.createDataFrame(
        [(
            f"https://{_HOST}/movies",
            pd.Timestamp(EPOCH).to_pydatetime(),
            root_html,
            root_text,
            "en",
        )],
        PAGES_SCHEMA,
    )
    return details.unionByName(listings).unionByName(root)


# ---------------------------------------------------------------------------
# Training-corpus generator (documents table at arbitrary scale)
# ---------------------------------------------------------------------------

def gen_docs(
    spark: SparkSession,
    n: int,
    partitions: int | None = None,
    words_per_doc: int = 60,
    vocab: int = 50_000,
    dup_every: int = 17,
) -> DataFrame:
    """Deterministic documents table of ``n`` rows for the corpus-op bench
    (minhash_dedup / decontaminate / text_stats at ≥1M docs).

    Pure JVM columns (``sequence`` + ``transform`` + ``xxhash64`` — no
    Python mapper), so a timed operator run over this table measures the
    operator, not the generator.  Every ``dup_every``-th doc re-seeds its
    word sequence from the previous id and differs only in the final tail
    token — a planted near-dup pair (word-3-gram Jaccard ≈ 0.93 at 60
    words) that exact dedup must NOT collapse and MinHash+LSH must."""
    from pyspark.sql import functions as F

    parts = partitions or spark.sparkContext.defaultParallelism * 2
    base = spark.range(0, n, 1, parts)
    seed_id = (
        F.when(
            (F.col("id") % dup_every == 0) & (F.col("id") > 0),
            F.col("id") - 1,
        )
        .otherwise(F.col("id"))
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.lit(42), seed_id, i), F.lit(vocab)).cast(
                "string"
            ),
        ),
    )
    return base.select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.array_join(words, " "), F.lit(" t"), F.col("id").cast("string")
        ).alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("ar"), F.lit("zh")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )


def site_seed_rows() -> list[dict]:
    """Seed + robots rows matching :func:`gen_site_pages`."""
    return [
        {
            "url": f"https://{_HOST}/movies",
            "site": "fasel",
            "category": "movies",
            "priority": 0,
            "depth": 0,
            "role": "listing",
            "url_template": f"https://{_HOST}/movies/page/{{p}}",
        }
    ]
