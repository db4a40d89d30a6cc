"""Derived batch jobs: trending joins (O19-O21) and the postprocess family
(genre scrub O22a, prune O22b, all-content index O23, integrity manifest
O24, image index) — small constructed inputs with exact expectations."""

import pytest
from pyspark.sql import functions as F

from no_fasel_scrapers_spark.plans.postprocess import (
    all_content_index,
    image_index,
    integrity_manifest,
    prune_records,
    scrub_record_genres,
)
from no_fasel_scrapers_spark.plans.trending import akwam_trending, fasel_trending

FLAT_DDL = (
    "item_id string, title string, image_source string, category string, "
    "rating string, tmdb_id long, genres array<string>, source string"
)
SERIES_DDL = (
    "series_id string, title string, image_source string, category string, "
    "genres array<string>, episodes_total long"
)


@pytest.fixture(scope="module")
def flat(spark):
    rows = [
        ("100", "Alpha One", "img/100", "movies", "7.9", 11, ["Action"], "s100"),
        ("101", "Beta Two", "img/101", "movies", None, None, None, ""),
        ("102", "Alpha One", "img/102", "movies", "6.0", 12, ["Drama"], "s102"),
        ("200", "Gamma", "img/200", "arabic-movies", "5.5", None,
         ["Action", "%d8%af", "/"], "s200"),
    ]
    return spark.createDataFrame(rows, FLAT_DDL)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        ("300", "Delta Show", "img/300", "series", ["Drama"], 12),
        ("301", "Empty Show", "img/301", "series", None, 0),
        ("400", "Waw Series", "img/400", "arabic-series", ["Action"], 8),
    ]
    return spark.createDataFrame(rows, SERIES_DDL)


# ---------------------------------------------------------------------------
# trending (O19-O21)
# ---------------------------------------------------------------------------

def test_akwam_trending_id_join(spark, flat, series):
    links = spark.createDataFrame(
        [
            ("https://akwam.test/series/400/waw-series",),   # match
            ("https://akwam.test/movie/200/gamma",),         # match
            ("https://akwam.test/movie/999/unknown",),       # id not stored
            ("https://akwam.test/shows/300/other",),         # category dropped
        ],
        "link string",
    )
    got = {
        (r.item_id, r.category): r.title
        for r in akwam_trending(
            links,
            series.filter("category = 'arabic-series'"),
            flat.filter("category = 'arabic-movies'"),
        ).collect()
    }
    assert got == {
        ("400", "arabic-series"): "Waw Series",
        ("200", "arabic-movies"): "Gamma",
    }


def test_fasel_trending_normalized_first_match(spark, flat):
    trending = spark.createDataFrame(
        [
            # movies category via the encoded فيلم substring; title matches
            # "Alpha One" after lower + whitespace removal
            ("https://fasel.test/%d9%81%d9%8a%d9%84%d9%85/x", "ALPHA   ONE"),
            ("https://fasel.test/%d9%81%d9%8a%d9%84%d9%85/y", "No Match"),
        ],
        "link string, title string",
    )
    got = fasel_trending(trending, flat).collect()
    assert len(got) == 1
    r = got[0]
    # two stored records normalize to 'alphaone' — first match wins = lowest id
    assert r.item_id == "100" and r.title == "Alpha One"
    assert r.rating == "7.9" and r.category == "movies"


def test_fasel_trending_defaults(spark, flat):
    trending = spark.createDataFrame(
        [("https://fasel.test/%d9%81%d9%8a%d9%84%d9%85/z", "beta two")],
        "link string, title string",
    )
    r = fasel_trending(trending, flat).collect()[0]
    assert r.item_id == "101"
    assert r.rating == "N/A"      # None → 'N/A' (TrendingScraper.py:92-100)
    assert r.genres == []          # None → []


# ---------------------------------------------------------------------------
# postprocess (O22-O24)
# ---------------------------------------------------------------------------

def test_scrub_genres_junk_and_missing(spark, flat):
    got = {r.item_id: r.genres for r in scrub_record_genres(flat).collect()}
    assert got["200"] == ["Action"]   # '%…' and '/' entries dropped
    assert got["101"] == []           # missing → []
    assert got["100"] == ["Action"]


def test_prune_records(spark, flat, series):
    flat_p, series_p = prune_records(flat, series)
    assert {r.item_id for r in flat_p.collect()} == {"100", "102", "200"}
    assert {r.series_id for r in series_p.collect()} == {"300", "400"}


def test_all_content_index_defaults(spark, flat, series):
    got = {r.key: r for r in all_content_index(flat, series).collect()}
    assert len(got) == 7
    assert got["101"].rating == "N/A" and got["101"].genres == []
    assert got["300"].rating == "N/A" and got["300"].genres == ["Drama"]
    assert got["100"].rating == "7.9"


def test_integrity_manifest_deterministic_order_insensitive(spark, flat):
    m1 = {r.category: r.manifest_md5
          for r in integrity_manifest(flat).collect()}
    # same rows in a different physical order → identical manifest
    shuffled = flat.orderBy(F.rand(seed=7)).repartition(5)
    m2 = {r.category: r.manifest_md5
          for r in integrity_manifest(shuffled).collect()}
    assert m1 == m2
    assert set(m1) == {"movies", "arabic-movies"}
    # any value change flips the group hash
    m3 = {
        r.category: r.manifest_md5
        for r in integrity_manifest(
            flat.withColumn(
                "rating",
                F.when(F.col("item_id") == "100", "8.0").otherwise(
                    F.col("rating")
                ),
            )
        ).collect()
    }
    assert m3["movies"] != m1["movies"]
    assert m3["arabic-movies"] == m1["arabic-movies"]


def test_image_index_suffixes(spark, flat, series):
    got = {r.content_id: r.image_url
           for r in image_index(flat, series).collect()}
    assert got["100-fasel"] == "img/100"
    assert got["200-akwam-movies"] == "img/200"
    assert got["400-akwam-series"] == "img/400"
    assert got["300-fasel"] == "img/300"
