"""Link-graph PageRank as a frontier-priority / recrawl-priority signal.

The reference crawls its catalogs in a fixed hand-ordered sequence
(``ScrapeAll.py:7-22`` launches one subprocess per site in list order,
no notion of page importance); a web-scale frontier
instead wants a *computed* priority — pages that the crawled web itself
points at most should be refreshed first.  This module implements the
classic PageRank power iteration (Page, Brin, Motwani, Winograd 1999,
"The PageRank Citation Ranking") over the crawl output's link graph,
Spark-first: edges and ranks are DataFrames, every iteration is one
equi-join + one map-side-combinable aggregation, and the only driver
value per iteration is the 8-byte dangling-mass scalar.

Fixed-point arithmetic, deliberately
------------------------------------
Ranks are carried as **integer micro-units** (``unit`` = 1e12 of total
mass 1.0) and every step uses integer division (``div``), so per-vertex
inflow sums are order-independent — IEEE double summation is not, and a
groupBy SUM's accumulation order varies with partitioning, which would
make float ranks differ between cluster sizes (and between the engine
and its oracle) in the low bits, exactly where top-k tie-breaks live.
With longs the result is **bit-identical at any parallelism**: the same
property the north rule's N→4N criterion demands of the crawl itself,
extended to the priority signal (pinned by
``tests/test_linkrank.py::test_parallelism_invariance``).  Floor losses
shrink total mass by < (2·k·N + k) units over k iterations — at
unit=1e12 that is ~1e-9 of mass per iteration for the fixture graph,
invisible at ranking granularity (and bounded in tests).

Scale shape (100 TB / 10^10 vertices)
-------------------------------------
* Edges are cleaned and degree-annotated ONCE (distinct + two semi-joins
  + one groupBy), persisted, and re-joined each iteration — the per-
  iteration cost is one shuffle of the slim rank table (16 bytes/row)
  on the join key plus one partially-aggregated shuffle of inflow; the
  wide edge table never re-shuffles after the first iteration (AQE
  reuses its exchange output).
* In-degree skew (every page links to the homepage) is absorbed by the
  partial aggregation: map-side combine reduces each task's
  contributions to one row per hot dst before the shuffle.
* The dangling-vertex key set is loop-invariant and computed once; the
  per-iteration dangling mass is a single SUM — one scalar to the
  driver, never rows.
* Rank lineage is cut every ``checkpoint_every`` iterations with
  ``localCheckpoint`` (same pattern as the connected-components loop,
  ``operators/components.py``) so long runs do not accumulate a k-deep
  plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

UNIT_DEFAULT = 10**12


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    vertex_col: str = "url",
    src: str = "src",
    dst: str = "dst",
    k: int = 8,
    unit: int = UNIT_DEFAULT,
    damp_num: int = 85,
    damp_den: int = 100,
    checkpoint_every: int = 6,
) -> DataFrame:
    """Fixed-point PageRank over ``edges`` restricted to ``vertices``.

    Returns one row per vertex: (``vertex_col``, ``pr`` BIGINT) where
    ``pr`` is the rank in integer ``unit``-ths of total mass.  The exact
    recurrence (mirrored verbatim by the Python oracle,
    ``oracle/analytic.link_pagerank_rows``):

        base        = unit div N
        resid       = (unit * (damp_den - damp_num) div damp_den) div N
        contrib(e)  = pr[src(e)] div outdeg[src(e)]
        dang_share  = (sum of pr over out-degree-0 vertices) div N
        pr'[v]      = resid + (damp_num * (inflow[v] + dang_share))
                              div damp_den

    Parallel edges collapse (distinct); self-loops are kept (they are
    real links and the recurrence handles them); edges with either
    endpoint outside ``vertices`` are dropped.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    verts = vertices.select(vertex_col).distinct()
    n = verts.count()
    if n == 0:
        return verts.withColumn("pr", F.lit(0).cast("long"))

    e = (
        edges.select(src, dst)
        .filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
        .join(verts.withColumnRenamed(vertex_col, src), src, "left_semi")
        .join(verts.withColumnRenamed(vertex_col, dst), dst, "left_semi")
    )
    outdeg = e.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))
    # degree-annotated edge table: built once, reused every iteration
    e_deg = e.join(outdeg, src).persist()

    # loop-invariant dangling key set (vertices with no out-edges)
    dang_keys = verts.join(
        e_deg.select(F.col(src).alias(vertex_col)), vertex_col, "left_anti"
    ).persist()

    base = unit // n
    resid = (unit * (damp_den - damp_num) // damp_den) // n
    pr = verts.select(vertex_col, F.lit(base).cast("long").alias("pr"))
    pr = pr.persist()

    # One Spark job per iteration: the dangling-mass agg both yields the
    # scalar AND (as a side effect of scanning the persisted frame)
    # materializes the current ranks' cache — so the PREVIOUS iteration's
    # cache is dropped here, one step deferred, instead of paying a
    # separate count() job per iteration just to materialize-then-drop.
    stale: DataFrame | None = None
    for i in range(k):
        dang = (
            pr.join(dang_keys, vertex_col, "left_semi")
            .agg(F.sum("pr").alias("s"))
            .first()["s"]
        ) or 0
        if stale is not None:
            stale.unpersist()
            stale = None
        dang_share = dang // n
        inflow = (
            e_deg.join(pr.withColumnRenamed(vertex_col, src), src)
            .select(
                F.col(dst).alias(vertex_col),
                F.expr("pr div outdeg").alias("c"),
            )
            .groupBy(vertex_col)
            .agg(F.sum("c").alias("inflow"))
        )
        new_pr = (
            verts.join(inflow, vertex_col, "left")
            .select(
                vertex_col,
                (
                    F.lit(resid)
                    + F.expr(
                        f"({damp_num} * (coalesce(inflow, 0L) + "
                        f"{dang_share}L)) div {damp_den}"
                    )
                ).cast("long").alias("pr"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            # cut lineage the same way the CC loop does — eager, so the
            # old cache is immediately droppable
            new_pr = new_pr.localCheckpoint(eager=True)
            pr.unpersist()
        else:
            new_pr = new_pr.persist()
            stale = pr  # still backs new_pr until new_pr materializes
        pr = new_pr

    # materialize the final ranks before releasing the working caches so
    # the caller's action never recomputes the iteration chain
    pr.count()
    if stale is not None:
        stale.unpersist()
    e_deg.unpersist()
    dang_keys.unpersist()
    return pr
