"""Checkpoint/resume: kill after wave k, restart, identical final state
(north_rule resumability)."""

from pyspark.sql import functions as F

from no_fasel_scrapers_spark.plans.crawl import resume_crawl, run_crawl
from no_fasel_scrapers_spark.sources.catalog import Catalog


def test_resume_equals_uninterrupted(spark, fixture, tmp_path):
    pages = fixture.pages_df(spark)
    seeds = fixture.seeds_df(spark)
    robots = fixture.robots_df(spark)

    full_cat = Catalog(str(tmp_path / "full"))
    full = run_crawl(spark, pages, seeds, robots, full_cat, audit=True)

    # interrupted run: stop after 2 waves (simulates a kill — the catalog
    # holds only the snapshots published before the "crash")
    part_cat = Catalog(str(tmp_path / "part"))
    run_crawl(spark, pages, seeds, robots, part_cat, audit=True, max_waves=2)
    resumed = resume_crawl(spark, pages, seeds, robots, part_cat, audit=True)

    a = sorted((r["wave"], r["rank"], r["url"]) for r in full.seen.collect())
    b = sorted((r["wave"], r["rank"], r["url"]) for r in resumed.seen.collect())
    assert a == b

    ea = sorted(
        (r["url"], r["wave"], r["text"])
        for r in full.extracted.select("url", "wave", "text").collect()
    )
    eb = sorted(
        (r["url"], r["wave"], r["text"])
        for r in resumed.extracted.select("url", "wave", "text").collect()
    )
    assert ea == eb


def test_torn_manifest_ignored(spark, fixture, tmp_path):
    """A crash mid-write leaves a .tmp manifest — readers must not see it."""
    cat = Catalog(str(tmp_path / "torn"))
    df = spark.range(3).select(F.col("id"))
    cat.write(df, "t")
    import os

    tmp = os.path.join(cat.root, "t", "_snapshots", ".v1.json.tmp")
    with open(tmp, "w") as fp:
        fp.write("{ partial")
    assert cat.latest("t").version == 0
    assert cat.read(spark, "t").count() == 3
