"""Connected components + near-dup group resolution (operators/components).

The graphs below are the shapes that break one-level pair collapse:
chains (A~B~C with A!~C), stars, rings, and random graphs checked against
a plain union-find oracle.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from no_fasel_scrapers_spark.operators.components import (
    connected_components,
    near_dup_groups,
    resolve_survivors,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df, **kw).collect()
    return {r["id"]: r["component"] for r in rows}


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of each component
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in parent}


def test_chain_collapses_to_min(spark):
    # path 0-1-2-...-9: transitive closure is ONE group; one-level pair
    # collapse would need 9 hops
    edges = [(i, i + 1) for i in range(9)]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(10)}


def test_two_components_and_star(spark):
    edges = [(5, 3), (3, 8), (20, 21), (22, 20), (23, 20)]
    got = _cc(spark, edges)
    assert got == {3: 3, 5: 3, 8: 3, 20: 20, 21: 20, 22: 20, 23: 20}


def test_ring_and_self_loops_and_dup_edges(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 1), (2, 1), (2, 1)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _cc(spark, edges) == _union_find(edges)


def test_custom_column_names(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    rows = connected_components(df, "id_a", "id_b").collect()
    assert {r["id"]: r["component"] for r in rows} == {1: 1, 2: 1, 3: 1}


def test_near_dup_groups_labels_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["group_id"]
        for r in near_dup_groups(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_resolve_survivors_default_min_id(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "bb"), (3, "c")], "doc_id long, text string"
    )
    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "doc_id long, group_id long"
    )
    rows = resolve_survivors(docs, groups).collect()
    surv = {r["doc_id"]: r["is_survivor"] for r in rows}
    assert surv == {1: True, 2: False, 3: True}


def test_resolve_survivors_longest_text_policy(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "bbbb"), (3, "cc")], "doc_id long, text string"
    )
    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, group_id long"
    )
    rows = resolve_survivors(
        docs, groups, order_col=F.length("text").desc()
    ).collect()
    surv = {r["doc_id"]: r["is_survivor"] for r in rows}
    assert surv == {1: False, 2: True, 3: False}


def test_empty_edges(spark):
    docs = spark.createDataFrame([(7,), (9,)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["group_id"]
        for r in near_dup_groups(docs, pairs).collect()
    }
    assert got == {7: 7, 9: 9}


def test_long_chain_converges_logarithmically(spark):
    # 200-node path: naive label propagation needs ~200 rounds; the
    # alternating-star loop must finish well inside max_iter=25
    edges = [(i, i + 1) for i in range(199)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0} and len(got) == 200


def test_reliable_checkpoint_dir_chain(spark, tmp_path):
    """checkpoint_dir switches localCheckpoint -> reliable checkpoint
    (VERDICT r2 #5): the per-round state lands in the checkpoint store, so
    an executor loss recomputes from the last round instead of failing.
    Local-mode stand-in for the kill: drop every cached/in-memory block
    after the run and recompute the result — with localCheckpoint the
    lineage roots in executor-memory blocks; with a reliable dir it roots
    in checkpoint FILES, which this asserts exist and still serve reads."""
    import os

    ckpt = str(tmp_path / "cc_ckpt")
    edges = [(i, i + 1) for i in range(99)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, checkpoint_dir=ckpt)
    first = {r["id"]: r["component"] for r in out.collect()}
    assert first == {i: 0 for i in range(100)}

    # reliable checkpoint files were written (one dir per round)
    written = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(ckpt)
        for f in fs
        if not f.startswith(".")
    ]
    assert written, "no reliable checkpoint files under checkpoint_dir"

    # kill stand-in: evict all block-manager state, then recompute the
    # SAME result DataFrame — it must re-serve from the checkpoint files
    spark.catalog.clearCache()
    for (_id, rdd) in spark.sparkContext._jsc.getPersistentRDDs().items():
        rdd.unpersist()
    again = {r["id"]: r["component"] for r in out.collect()}
    assert again == first


def test_near_dup_groups_threads_checkpoint_dir(spark, tmp_path):
    import os

    ckpt = str(tmp_path / "ndg_ckpt")
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["group_id"]
        for r in near_dup_groups(docs, pairs, checkpoint_dir=ckpt).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}
    assert any(fs for _, _, fs in os.walk(ckpt))
