"""Range (point-in-interval) join without a nested-loop plan.

Spark turns a plain ``p.x BETWEEN i.lo AND i.hi`` join condition into a
BroadcastNestedLoopJoin (or a cartesian product) — O(|points|·|intervals|)
once the broadcast no longer fits.  The scalable shape is the standard
bucketing trick: explode each interval to the fixed-width buckets it
covers, map each point to its single bucket, equi-join on
(key, bucket) — one hash shuffle — and refine with the exact BETWEEN
predicate.  Work is O(points + intervals·(width/bucket + 1) + output).

``bucket_size`` trades replication for candidate precision: pick it near
the typical interval width so most intervals explode to 1-2 buckets.
Intervals wider than ``max_buckets_per_interval`` take a fallback path —
a plain key-equi join + refine — so results stay exact without exploding
a pathological interval into millions of bucket rows (the skew-guard
pattern: handle the heavy tail separately instead of replicating it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_size: float,
    max_buckets_per_interval: int = 1024,
) -> DataFrame:
    """Inner join: point rows × interval rows of the same ``on`` key with
    ``lo <= point <= hi``.  Returns all columns from both sides.

    Empty/inverted intervals (hi < lo) produce no matches.  The bucket
    decomposition is an internal detail — results equal the naive
    inequality join exactly (the final filter re-checks the bounds).
    """
    bs = float(bucket_size)
    refine = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
    )
    valid = intervals.filter(F.col(hi_col) >= F.col(lo_col))
    lo_b = F.floor(F.col(lo_col) / F.lit(bs)).cast("long")
    n_span = F.floor(F.col(hi_col) / F.lit(bs)).cast("long") - lo_b
    narrow = valid.filter(n_span <= max_buckets_per_interval)
    wide = valid.filter(n_span > max_buckets_per_interval)

    p_b = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / F.lit(bs)).cast("long")
    )
    i_b = narrow.withColumn(
        "__bucket", F.explode(F.sequence(lo_b, lo_b + n_span))
    )
    out = (
        p_b.join(i_b, [on, "__bucket"]).filter(refine).drop("__bucket")
    )
    # heavy tail: pathologically wide intervals would replicate to huge
    # bucket fan-outs; join them per key and refine instead (exact, rare)
    wide_out = points.join(wide, on).filter(refine)
    return out.unionByName(wide_out)
