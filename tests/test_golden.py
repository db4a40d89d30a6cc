"""Golden-record parity: crawl → assemble → byte-identical vs the fixture's
independently-computed reference-semantics goldens (BASELINE invariant)."""

import pytest
from pyspark.sql import functions as F

from no_fasel_scrapers_spark.functions.decode_tables import (
    akwam_genres_df,
    cimanow_genres_df,
)
from no_fasel_scrapers_spark.plans.assemble import (
    assemble_all_flat,
    assemble_all_series,
)
from no_fasel_scrapers_spark.plans.crawl import run_crawl
from no_fasel_scrapers_spark.plans.postprocess import enrich_tmdb
from no_fasel_scrapers_spark.sources.catalog import Catalog

FLAT_COLS = [
    "site", "category", "item_id", "title", "fmt", "genres", "image_source",
    "source", "rating", "tmdb_id", "sources_json", "season_number",
]
SERIES_COLS = [
    "site", "category", "series_id", "title", "fmt", "genres",
    "image_source", "episodes_total", "seasons_json",
]


@pytest.fixture(scope="module")
def assembled(spark, fixture, tmp_path_factory):
    cat = Catalog(str(tmp_path_factory.mktemp("golden") / "cat"))
    res = run_crawl(
        spark,
        fixture.pages_df(spark),
        fixture.seeds_df(spark),
        fixture.robots_df(spark),
        cat,
    )
    flat = assemble_all_flat(
        res.extracted,
        fixture.image_cache_df(spark),
        akwam_genres_df(spark),
        cimanow_genres_df(spark),
        fixture.tmdb_df(spark),
    )
    # TMDb backfill applies to fasel movies (Postprocessing.py:51-73);
    # cimanow IDs arrive at scrape time (CimaNowMovieScraper.py:70)
    flat = enrich_tmdb(flat, fixture.tmdb_df(spark))
    series = assemble_all_series(
        res.extracted, fixture.image_cache_df(spark), akwam_genres_df(spark)
    )
    return flat, series


def _norm(row, cols):
    out = []
    for c in cols:
        v = row[c]
        if isinstance(v, list):
            v = tuple(v)
        out.append(v)
    return tuple(out)


class TestGoldenFlat:
    def test_flat_records_byte_identical(self, assembled, fixture):
        flat, _ = assembled
        got = sorted(_norm(r, FLAT_COLS) for r in flat.collect())
        exp = sorted(
            _norm(
                {
                    **g,
                    "tmdb_id": g["tmdb_id"],
                    "genres": g["genres"],
                },
                FLAT_COLS,
            )
            for g in fixture.golden_flat
        )
        assert len(got) == len(exp), (len(got), len(exp))
        for g, e in zip(got, exp):
            assert g == e, f"\ngot: {g}\nexp: {e}"


class TestGoldenSeries:
    def test_series_records_byte_identical(self, assembled, fixture):
        _, series = assembled
        got = sorted(_norm(r, SERIES_COLS) for r in series.collect())
        exp = sorted(_norm(g, SERIES_COLS) for g in fixture.golden_series)
        assert len(got) == len(exp), (len(got), len(exp))
        for g, e in zip(got, exp):
            assert g == e, f"\ngot: {g}\nexp: {e}"
