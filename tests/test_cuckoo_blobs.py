"""Distributed cuckoo blobs: build, vectorized probe parity with the exact
set, cogrouped insert/delete deltas, and recrawl invalidation through the
crawl engine (a recrawled URL is fetched again)."""

import pytest
from pyspark.sql import functions as F

from no_fasel_scrapers_spark.operators.seen_filter import (
    build_cuckoo_blobs,
    dedup_against_seen,
    invalidate_recrawl,
    mark_maybe_seen_cuckoo,
    update_cuckoo_blobs,
)


@pytest.fixture(scope="module")
def seen(spark):
    return spark.range(0, 2000).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id").cast("string"))).alias(
            "url_hash"
        ),
        F.col("id").alias("key_id"),
    )


@pytest.fixture(scope="module")
def candidates(spark):
    # ids 1000..2999: half seen (1000-1999), half new (2000-2999)
    return spark.range(1000, 3000).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id").cast("string"))).alias(
            "url_hash"
        ),
        F.col("id").alias("key_id"),
    )


def test_cuckoo_probe_no_false_negatives(spark, seen, candidates):
    blobs = build_cuckoo_blobs(seen.select("url_hash"), n_shards=8)
    rows = blobs.collect()
    assert len(rows) == 8 and all(r.kind == "cuckoo" for r in rows)

    marked = mark_maybe_seen_cuckoo(candidates, blobs, n_shards=8)
    got = {r.key_id: r.maybe_seen for r in marked.collect()}
    # every truly-seen candidate must probe positive (no false negatives)
    assert all(got[i] for i in range(1000, 2000))
    # false-positive rate on the new half stays filter-like
    fp = sum(got[i] for i in range(2000, 3000))
    assert fp < 100  # < 10% (16-bit fingerprints → typically ≪ 1%)


def test_cuckoo_delete_then_probe_negative(spark, seen):
    blobs = build_cuckoo_blobs(seen.select("url_hash"), n_shards=8)
    to_delete = seen.filter(F.col("key_id") % 10 == 0).select("url_hash")
    updated = update_cuckoo_blobs(blobs, deletes=to_delete, n_shards=8)

    marked = mark_maybe_seen_cuckoo(seen, updated, n_shards=8)
    got = {r.key_id: r.maybe_seen for r in marked.collect()}
    deleted = [i for i in range(0, 2000, 10)]
    live = [i for i in range(2000) if i % 10 != 0]
    # deleted keys gone (cuckoo delete, impossible with bloom)...
    assert sum(got[i] for i in deleted) < len(deleted) * 0.1
    # ...and NO live key was evicted by the deletes (no false negatives)
    assert all(got[i] for i in live)


def test_cuckoo_insert_delta(spark, seen):
    blobs = build_cuckoo_blobs(seen.select("url_hash"), n_shards=8)
    extra = spark.range(5000, 5200).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id").cast("string"))).alias(
            "url_hash"
        )
    )
    updated = update_cuckoo_blobs(blobs, inserts=extra, n_shards=8)
    marked = mark_maybe_seen_cuckoo(
        extra.withColumn("key_id", F.lit(0)), updated, n_shards=8
    )
    assert all(r.maybe_seen for r in marked.collect())
    assert updated.filter(F.col("n_items") < 0).count() == 0  # no overflow


def test_invalidate_recrawl_exact_and_filter(spark, seen, candidates):
    blobs = build_cuckoo_blobs(seen.select("url_hash"), n_shards=8)
    recrawl = seen.filter(F.col("key_id") < 100).select("url_hash")
    new_seen, new_blobs = invalidate_recrawl(
        seen, recrawl, cuckoo_blobs=blobs, n_shards=8
    )
    assert new_seen.count() == 1900
    # the full dedup path now lets the recrawled urls through again
    fresh = dedup_against_seen(
        seen.select("url_hash", "key_id"), new_seen, None, 8
    )
    ids = {r.key_id for r in fresh.collect()}
    assert ids == set(range(100))


def test_crawl_recrawl_param_refetches(spark, fixture, tmp_path):
    from no_fasel_scrapers_spark.plans.crawl import run_crawl
    from no_fasel_scrapers_spark.sources.catalog import Catalog

    pages = fixture.pages_df(spark)
    seeds = fixture.seeds_df(spark)
    robots = fixture.robots_df(spark)
    prior = fixture.seen_prior_df(spark)
    if prior.isEmpty():
        pytest.skip("fixture has no prior-seen rows")

    # baseline incremental run: prior-seen detail pages are NOT refetched
    base = run_crawl(
        spark, pages, seeds, robots, Catalog(str(tmp_path / "c1")),
        seen_prior=prior, max_waves=3,
    )
    base_urls = {r.url for r in base.extracted.select("url").collect()}
    prior_urls = {r.url for r in prior.select("url").collect()}
    assert not (base_urls & prior_urls)

    # same run but with one prior url marked for recrawl → it IS refetched
    target = sorted(prior_urls)[0]
    rec = run_crawl(
        spark, pages, seeds, robots, Catalog(str(tmp_path / "c2")),
        seen_prior=prior, max_waves=3,
        recrawl=spark.createDataFrame([(target,)], "url string"),
    )
    rec_urls = {r.url for r in rec.extracted.select("url").collect()}
    assert target in rec_urls
    extra = rec_urls - base_urls
    assert target in extra
    # everything else newly fetched must be a child discovered FROM the
    # recrawled page (refetching a hub legitimately re-opens its children);
    # no unrelated prior-seen url sneaks back in
    assert not ((extra - {target}) & prior_urls)
    assert base_urls <= rec_urls


def test_failed_insert_rolls_back_no_false_negatives():
    """A full table's failed insert must not evict live fingerprints."""
    from no_fasel_scrapers_spark.operators.seen_filter import CuckooFilter

    cf = CuckooFilter(n_buckets=4)  # tiny: 4 buckets × SLOTS entries
    inserted = []
    h = 1
    while True:
        if not cf.insert(h):
            break
        inserted.append(h)
        h += 7919
    assert len(inserted) > 0
    # every successfully inserted key still reports present
    for x in inserted:
        assert cf.contains(x), x
    # the failed insert left the table byte-identical on repeat failure
    before = cf.to_bytes()
    assert cf.insert(h) is False
    assert cf.to_bytes() == before
