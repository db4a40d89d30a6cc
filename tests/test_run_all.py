"""Full-DAG orchestration (O26): crawl → assemble/merge → trending +
postprocess → index/manifest/stamp, twice — second run must be a no-op
upsert (same content, bumped snapshot versions), mirroring the
reference's daily re-run semantics without its stage-2 file race."""

import pytest

from jobs.run_all import run_all
from no_fasel_scrapers_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def two_runs(spark, fixture, tmp_path_factory):
    cat = Catalog(str(tmp_path_factory.mktemp("runall") / "cat"))
    kw = dict(
        image_cache=fixture.image_cache_df(spark),
        tmdb=fixture.tmdb_df(spark),
        trending_links=fixture.trending_links_df(spark),
        trending_titles=fixture.trending_titles_df(spark),
    )

    def one(run_date):
        return run_all(
            spark,
            fixture.pages_df(spark),
            fixture.seeds_df(spark),
            fixture.robots_df(spark),
            cat,
            run_date=run_date,
            **kw,
        )

    s1 = one("2026-08-17")
    s2 = one("2026-08-18")
    return cat, s1, s2


def _rows(spark, cat, name, version=None):
    return sorted(
        map(tuple, cat.read(spark, name, version=version).collect())
    )


def test_all_output_tables_published(spark, two_runs):
    cat, s1, _ = two_runs
    for name in (
        "content_flat", "content_series", "trending_content",
        "image_indices", "all_content", "file_hashes", "run_stamp",
    ):
        assert cat.exists(name), name
    assert s1["content_flat"] > 0 and s1["content_series"] > 0
    assert s1["all_content"] == s1["content_flat"] + s1["content_series"]


def test_trending_nonempty_and_shaped(spark, two_runs):
    cat, s1, _ = two_runs
    t = cat.read(spark, "trending_content", version=0)
    rows = t.collect()
    assert s1["trending"] == len(rows) > 0
    by_site = {r.source_site for r in rows}
    assert by_site == {"akwam", "fasel"}
    # akwam side: only ids that exist in stored arabic-* tables
    flat_ids = {
        r.item_id
        for r in cat.read(spark, "content_flat", version=0).collect()
    }
    series_ids = {
        r.series_id
        for r in cat.read(spark, "content_series", version=0).collect()
    }
    for r in rows:
        assert r.item_id in flat_ids | series_ids


def test_second_run_is_idempotent_upsert(spark, two_runs):
    cat, s1, s2 = two_runs
    assert s2["versions"]["content_flat"] == s1["versions"]["content_flat"] + 1
    # identical content at both versions (same input universe)
    for name in ("content_flat", "content_series", "all_content"):
        assert _rows(spark, cat, name, version=0) == _rows(
            spark, cat, name, version=1
        ), name
    # manifest identical too (hash of canonical records, not of run date)
    assert _rows(spark, cat, "file_hashes", version=0) == _rows(
        spark, cat, "file_hashes", version=1
    )
    # stamp DOES advance (last-scraped.txt analog)
    assert cat.read(spark, "run_stamp").collect()[0].last_scraped == "2026-08-18"


def test_manifest_covers_every_category(spark, two_runs):
    cat, _, _ = two_runs
    cats_in_content = {
        r.category for r in cat.read(spark, "all_content").collect()
    }
    cats_in_manifest = {
        r.category for r in cat.read(spark, "file_hashes").collect()
    }
    assert cats_in_manifest == cats_in_content
