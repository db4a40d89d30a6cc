"""Distributed connected components + near-dup group resolution.

``minhash_dedup`` (``operators/dedup.py``) collapses duplicate PAIRS one
level (drop every ``id_b`` that has a smaller ``id_a`` twin).  That is
correct for dedup-by-representative only when duplicate relations are
transitively closed within one hop; real near-dup corpora form CHAINS
(A~B, B~C, A!~C after thresholding) whose one-level collapse can keep two
documents from the same cluster.  At 100 TB those chains are common
(template drift across a crawl), so group resolution needs true connected
components.

The operator implements the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", ACM SoCC
2014 — public literature): each round is two shuffles (a window-min per
endpoint partition), edge count stays bounded, and convergence is
O(log n) rounds even for adversarial chains — vs O(diameter) for naive
label propagation.  No driver-side data beyond a per-round convergence
checksum (count + hash aggregate, one scalar row).

Reference parity note: the reference engine has no grouping step at all
(its dedup is the exact-URL seen set, ``Common.py`` id joins); this
operator is part of the training-data pipeline surface the engine adds on
top (SURVEY §2 "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "near_dup_groups",
    "resolve_survivors",
]


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: ∀v ∈ Γ(u) with v > u, emit (v, min(Γ⁺(u))).

    Symmetrize, then one shuffle (window over the src partition) computes
    the neighborhood minimum; strictly-larger neighbors re-point at it.
    """
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    w = Window.partitionBy("src")
    m = F.least(F.min("dst").over(w), F.col("src"))
    return (
        sym.withColumn("m", m)
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient edges high→low, group by the high end u;
    every member of Γ(u) ∪ {u} except the minimum re-points at it."""
    o = (
        edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    w = Window.partitionBy("src")
    o = o.withColumn("m", F.min("dst").over(w))
    to_min = (
        o.where(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edge = o.select("src", F.col("m").alias("dst"))
    return to_min.union(self_edge).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """``(src, dst)`` undirected edges → ``(id, component)`` labels.

    ``component`` is the minimum node id of each component (deterministic
    canonical label).  Every node that appears in an edge gets a row;
    singleton handling (nodes with no edges) is the caller's join —
    see :func:`near_dup_groups`.

    Scale shape per round: two window shuffles + distincts, all keyed on
    node id; the only driver action is a one-row convergence checksum.
    Converges in O(log n) rounds (alternating-star bound), and dedup
    graphs (small diameter) typically finish in 3-5.

    ``checkpoint_dir``: directory for RELIABLE per-round checkpoints
    (HDFS/S3 path on a cluster).  Without it rounds truncate lineage via
    ``localCheckpoint`` — fast, but a lost executor loses its cached
    blocks and the job fails (local-mode/test default).  With it each
    round materializes to the reliable store, so executor loss recomputes
    from the last round, not from scratch; round count is O(log n), so
    retained snapshots stay bounded.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    if checkpoint_dir is not None:
        e.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    prev_chk = None
    for _ in range(max_iter):
        # Checkpointing truncates the logical plan each round — without
        # it the nested union/window/distinct lineage doubles per round
        # and Catalyst plan compilation OOMs after ~8 rounds (hit on a
        # 200-node chain).  Eager → the round materializes here, so the
        # checksum below reads the cache/store.
        stepped = _small_star(_large_star(e))
        e = (
            stepped.checkpoint(eager=True)
            if checkpoint_dir is not None
            else stepped.localCheckpoint(eager=True)
        )
        row = e.agg(
            F.count("*").alias("n"),
            # bit_xor: order-independent set checksum that cannot
            # overflow (sum of xxhash64 longs trips ANSI overflow checks)
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).first()
        chk = (row["n"], row["h"])
        if chk == prev_chk:
            break
        prev_chk = chk
    # Converged: edges are stars (node → component minimum).
    leaves = e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    roots = (
        e.select(F.col("dst").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    return leaves.union(roots).distinct()


def near_dup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Docs + verified duplicate pairs → ``(id_col, group_id)`` for EVERY
    doc (singletons label themselves).  ``group_id`` = min doc id of the
    duplicate cluster under the transitive closure of ``pairs``.
    ``checkpoint_dir`` → :func:`connected_components` (reliable per-round
    checkpoints for executor-loss tolerance on a cluster)."""
    comp = connected_components(pairs, pair_a, pair_b,
                                checkpoint_dir=checkpoint_dir)
    return (
        docs.select(id_col)
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("group_id"),
        )
    )


def resolve_survivors(
    docs: DataFrame,
    groups: DataFrame,
    id_col: str = "doc_id",
    order_col: Column | None = None,
) -> DataFrame:
    """Pick one survivor per duplicate group.

    Default policy: minimum doc id (deterministic, matches the group
    label).  Pass ``order_col`` (e.g. ``F.length("text").desc()``) for a
    content-aware policy — the window tiebreaks on doc id so the choice
    stays deterministic either way.  Output: docs + ``group_id`` +
    ``is_survivor`` (one true row per group; one shuffle on group_id).
    """
    joined = docs.join(groups, id_col)
    order = [order_col, F.col(id_col).asc()] if order_col is not None else [
        F.col(id_col).asc()
    ]
    w = Window.partitionBy("group_id").orderBy(*order)
    return joined.withColumn(
        "is_survivor", F.row_number().over(w) == F.lit(1)
    )
