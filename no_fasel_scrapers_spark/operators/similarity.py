"""Approximate-nearest-neighbor search over an embedding column.

Brute-force cosine top-k is the correctness baseline (one pass, JVM-side
``zip_with``/``aggregate`` dot products + TakeOrderedAndProject); the scale
path is IVF-style bucketing: deterministic hyperplane-LSH cells (shared
with operators/dedup.py) probed with the query's own cell plus its
1-bit-flip neighbors — the classic multi-probe trick, all as joins.

At 100 TB the brute-force path is a full scan per query (fine for batch
query sets — queries broadcast, one pass total); the IVF path prunes to
|cells probed|/|cells| of the corpus per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import cosine_sim, plane_weight



def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast queries, one corpus pass.

    Output: (query_id, vec_id, cosine, rank) with rank 1..k, deterministic
    tie-break on vec_id."""
    joined = corpus.crossJoin(F.broadcast(queries)).withColumn(
        "cosine", cosine_sim(F.col(vec_col), F.col(q_vec_col))
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )


def _cell_bits(vec: Column, n_planes: int) -> list[Column]:
    dim_idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = []
    for p in range(n_planes):
        w = F.transform(dim_idx, plane_weight(p))
        dot = F.aggregate(
            F.zip_with(vec, w, lambda x, ww: x * ww), F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit(1)).otherwise(F.lit(0)))
    return bits


def cell_id(vec: Column, n_planes: int = 8) -> Column:
    """Deterministic LSH cell id (int) — the IVF coarse quantizer."""
    bits = _cell_bits(vec, n_planes)
    acc = F.lit(0)
    for b in bits:
        acc = acc * F.lit(2) + b
    return acc


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
    probe_depth: int = 1,
) -> DataFrame:
    """ANN top-k: probe every cell within Hamming distance ``probe_depth``
    of the query's cell (classic multi-probe LSH).

    corpus is bucketed once (reusable across query batches); per query the
    scan touches sum(C(n_planes, d) for d<=depth)/2^n_planes of the corpus
    in expectation — ``probe_depth`` is the recall/scan-fraction dial (the
    ``ivf_recall`` driver query measures the curve against brute force)."""
    import itertools

    masks = [0]
    for d in range(1, probe_depth + 1):
        for bits in itertools.combinations(range(n_planes), d):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    bucketed = corpus.withColumn("cell", cell_id(F.col(vec_col), n_planes))
    qcell = queries.withColumn("qcell", cell_id(F.col(q_vec_col), n_planes))
    probes = qcell.select(
        q_id_col,
        q_vec_col,
        F.explode(
            F.array(
                *[F.col("qcell").bitwiseXOR(F.lit(m)) for m in masks]
            )
        ).alias("cell"),
    )
    joined = bucketed.join(F.broadcast(probes), "cell").withColumn(
        "cosine", cosine_sim(F.col(vec_col), F.col(q_vec_col))
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )
