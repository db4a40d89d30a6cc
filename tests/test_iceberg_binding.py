"""Iceberg runtime binding (sources/iceberg.py): the statement builders
and marker/meta codecs are pure and fully tested jar-free; the live
end-to-end surface is gated on the runtime jar and SKIPS in this sandbox
(SURVEY.md §7.0 — no Iceberg jar, no network), which is precisely the
seam the module exists to document and close on a real cluster.
"""

import pytest

from no_fasel_scrapers_spark.sources.catalog import Snapshot
from no_fasel_scrapers_spark.sources.iceberg import (
    IcebergCatalog,
    iceberg_available,
    lineage_order,
    marker_base_index,
    merge_sql,
    quote_ident,
    snapshot_props,
    snapshots_sql,
    summary_meta,
)


# ---------------------------------------------------------------------------
# pure builders
# ---------------------------------------------------------------------------

def test_quote_ident():
    assert quote_ident("iceberg.crawl", "seen") == "`iceberg`.`crawl`.`seen`"
    assert quote_ident("tbl") == "`tbl`"
    assert quote_ident("we`ird") == "`we``ird`"
    with pytest.raises(ValueError, match="empty identifier"):
        quote_ident("a..b")


def test_snapshot_props_roundtrip_through_summary():
    meta = {"wave": 3, "kind": "base", "site": "akwam"}
    props = snapshot_props(meta)
    assert props == {
        "snapshot-property.nfs-kind": "base",
        "snapshot-property.nfs-meta-wave": "3",
        "snapshot-property.nfs-meta-site": "akwam",
    }
    # what Iceberg stores in the snapshot summary is the props without the
    # write-option prefix; summary_meta must invert that exactly
    summary = {k.removeprefix("snapshot-property."): v for k, v in props.items()}
    summary["total-records"] = "42"  # Iceberg's own keys pass through untouched
    assert summary_meta(summary) == {
        "kind": "base", "wave": "3", "site": "akwam",
    }
    assert snapshot_props(None) == {}
    assert snapshot_props({}, kind="compact") == {
        "snapshot-property.nfs-kind": "compact"
    }


def test_snapshots_sql_orders_oldest_first():
    sql = snapshots_sql("`iceberg`.`crawl`.`seen`")
    assert "FROM `iceberg`.`crawl`.`seen`.snapshots" in sql
    assert sql.rstrip().endswith("ORDER BY committed_at, snapshot_id")


def test_merge_sql_precedences():
    new_wins = merge_sql("`c`.`d`.`items`", "src_view", "url_hash", True)
    assert new_wins == (
        "MERGE INTO `c`.`d`.`items` t USING `src_view` s "
        "ON t.`url_hash` = s.`url_hash` "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    old_wins = merge_sql("`c`.`d`.`items`", "src_view", ["site", "slug"], False)
    assert old_wins == (
        "MERGE INTO `c`.`d`.`items` t USING `src_view` s "
        "ON t.`site` = s.`site` AND t.`slug` = s.`slug` "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert "WHEN MATCHED" not in old_wins


def _snap(version, meta):
    return Snapshot(version=version, rows=0, meta=meta, path="t")


def test_marker_base_index_last_marker_wins():
    snaps = [
        _snap(10, {}),
        _snap(11, {"kind": "base"}),
        _snap(12, {}),
        _snap(13, {"kind": "compact"}),
        _snap(14, {}),
    ]
    assert marker_base_index(snaps) == 3
    assert marker_base_index([_snap(1, {}), _snap(2, {})]) == 0
    assert marker_base_index([]) == 0
    # mirrors Catalog.read_log: marker KINDS other than base/compact are
    # ordinary snapshots
    assert marker_base_index([_snap(1, {}), _snap(2, {"kind": "delta"})]) == 0


def test_lineage_order_walks_parent_chain():
    # random ids, shuffled input, same-millisecond-safe: only parent ids
    # determine the order
    pairs = [(77, 903), (903, None), (12, 77), (5, 12)]
    assert lineage_order(pairs) == [903, 77, 12, 5]
    assert lineage_order([]) == []
    assert lineage_order([(9, None)]) == [9]
    # expired parent (snapshot GC'd away): the oldest survivor roots the
    # chain
    assert lineage_order([(3, 2), (4, 3)]) == [3, 4]
    # branched history falls back to the SQL's committed_at order
    branched = [(1, None), (2, 1), (3, 1)]
    assert lineage_order(branched) == [1, 2, 3]
    # two roots (disconnected) likewise
    assert lineage_order([(1, None), (2, None)]) == [1, 2]


# ---------------------------------------------------------------------------
# sandbox behavior: probe false, constructor refuses loudly
# ---------------------------------------------------------------------------

def test_probe_is_false_in_sandbox_and_constructor_refuses(spark):
    if iceberg_available(spark):  # pragma: no cover - cluster-only branch
        pytest.skip("Iceberg jar present; the live class below covers this")
    with pytest.raises(RuntimeError, match="Iceberg runtime jar"):
        IcebergCatalog(spark, "iceberg.crawl")


# ---------------------------------------------------------------------------
# live surface — runs only where the runtime jar + a configured catalog
# exist (spark.sql.catalog.iceberg.*); everything above pins the logic
# ---------------------------------------------------------------------------

@pytest.fixture
def live_catalog(spark):
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar in this environment")
    cat = IcebergCatalog(spark, "iceberg.nfs_test")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS `iceberg`.`nfs_test`")
    yield cat
    for t in ("roundtrip", "log", "merged"):
        cat.drop(t)


def test_live_write_read_snapshot_meta(spark, live_catalog):
    df = spark.range(5).withColumnRenamed("id", "url_hash")
    snap = live_catalog.write(df, "roundtrip", meta={"wave": 0})
    assert snap.rows == 5
    assert live_catalog.latest("roundtrip").meta["wave"] == "0"
    assert live_catalog.read(spark, "roundtrip").count() == 5
    live_catalog.write(
        spark.range(5, 8).withColumnRenamed("id", "url_hash"),
        "roundtrip", meta={"wave": 1},
    )
    # read() = latest snapshot's delta; read_union() = everything;
    # Snapshot.rows = the per-commit delta (added-records), like the
    # local manifest — run_crawl's frontier-empty detection depends on it
    assert live_catalog.read(spark, "roundtrip").count() == 3
    assert live_catalog.read_union(spark, "roundtrip").count() == 8
    assert live_catalog.latest("roundtrip").rows == 3


def test_live_read_log_honors_markers(spark, live_catalog):
    mk = lambda a, b: spark.range(a, b).withColumnRenamed("id", "url_hash")
    live_catalog.write(mk(0, 4), "log", meta={})
    live_catalog.write(mk(4, 6), "log", meta={"kind": "base"})
    live_catalog.write(mk(6, 7), "log", meta={})
    assert live_catalog.read_log(spark, "log").count() == 3  # 2 + 1


def test_live_merge_precedence(spark, live_catalog):
    base = spark.createDataFrame([(1, "old"), (2, "old")], "k long, v string")
    live_catalog.write(base, "merged", meta={})
    upd = spark.createDataFrame([(2, "new"), (3, "new")], "k long, v string")
    live_catalog.merge(upd, "merged", key="k", new_wins=False)
    vals = {
        r.k: r.v for r in live_catalog.read_union(spark, "merged").collect()
    }
    assert vals == {1: "old", 2: "old", 3: "new"}
