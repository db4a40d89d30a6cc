"""As-of (point-in-time) join — a temporal operator Spark lacks natively.

For every left row, attach the most recent right row of the same key whose
timestamp is ≤ the left row's (optionally within a tolerance window) — the
standard enrichment for event streams and time-series features.

Spark-first plan: no per-key UDF and no range-explode.  Tag the two sides,
union them, and run one window pass per key ordered by (ts, side) with
``last(..., ignorenulls=True)`` carrying the right side's values forward;
left rows then read the carried values.  Exactly ONE shuffle (the window's
hash partitioning on the key) regardless of table sizes — the same shape a
sort-merge join would need, but with the inequality resolved in the sorted
pass instead of a join condition Catalyst can't hash.

Tie semantics: a right row at exactly the left row's timestamp IS matched
(``ts >= right.ts``, DuckDB ``ASOF JOIN`` semantics — the window orders the
right-side tag before the left-side tag at equal timestamps).

Right-side timestamps must be unique per key (pre-aggregate duplicates
upstream, e.g. ``groupBy(key, ts).agg(...)``) — with duplicates the carried
value is the last in an engine-dependent order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts: str,
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` row with
    ``right[ts] <= left[ts]`` for the same ``on`` key.

    Right value columns come back null when no right row precedes the left
    row (or none within ``tolerance``, an interval/numeric difference bound
    on ``left[ts] - right[ts]``).  The matched right timestamp is returned
    as ``__asof_ts`` alongside the right value columns.
    """
    val_cols = [c for c in right.columns if c not in (on, ts)]
    # the right row is carried as ONE struct so the match stays row-atomic:
    # carrying columns independently with last(ignorenulls) would pair a
    # newer row's timestamp with an older row's value whenever the matched
    # row legitimately holds NULL in a value column
    r_struct = F.struct(
        F.col(ts).alias("__ts"), *[F.col(c) for c in val_cols]
    )
    l_tag = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in (on, ts)],
        F.lit(None).cast(
            right.select(r_struct.alias("__r")).schema["__r"].dataType
        ).alias("__r"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (on, ts)],
        r_struct.alias("__r"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts → ties are matched
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__c")
    )
    out = carried.filter(F.col("__side") == 1)
    in_tol = (
        F.lit(True)
        if tolerance is None
        else (F.col(ts) - F.col("__c.__ts")) <= tolerance
    )
    keep = F.col("__c").isNotNull() & in_tol
    return out.select(
        on,
        ts,
        *[c for c in left.columns if c not in (on, ts)],
        *[
            F.when(keep, F.col(f"__c.{c}")).alias(c)
            for c in val_cols
        ],
        F.when(keep, F.col("__c.__ts")).alias("__asof_ts"),
    )
