"""Union-with-precedence + incremental delta merge (O11/O14).

The reference merges worker dicts with two opposite conventions:
``new | old`` (old wins, FaselSeriesScraper.py:217) and ``old.update(new)``
(new wins, AkwamSeriesScraper.py:148-149).  Here precedence is explicit: a
source-rank column + row_number window — impossible to get silently wrong,
and the asymmetry is a parameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def union_with_precedence(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    old_wins: bool = True,
) -> DataFrame:
    """unionByName + keep one row per key by precedence.

    old_wins=True reproduces ``new | old``; False reproduces
    ``old.update(new)``.  ``key`` may be a single column or a composite key
    list (e.g. the content tables key on (site, category, item_id)).

    Ties WITHIN a side (duplicate keys in old or in new) break on a
    content hash of the whole row, so repeated runs publish the identical
    snapshot regardless of partitioning — the deterministic-resume
    contract the catalog is built on.
    """
    keys = [key] if isinstance(key, str) else list(key)
    o = old.withColumn("__rank", F.lit(0 if old_wins else 1))
    n = new.withColumn("__rank", F.lit(1 if old_wins else 0))
    u = o.unionByName(n, allowMissingColumns=True)
    row_fingerprint = F.xxhash64(
        F.to_json(F.struct(*[c for c in u.columns if c != "__rank"]))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col("__rank").asc(), row_fingerprint.asc()
    )
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rank", "__rn")
    )


def episode_delta(
    old_counts: DataFrame,
    current: DataFrame,
    key: str = "series_id",
    old_count_col: str = "episode_count",
    new_count_col: str = "episodes_total",
) -> DataFrame:
    """Incremental tail-only recompute set (O11).

    Reference FaselSeriesScraper.py:70-88 / AkwamSeriesScraper.py:78-87:
    skip series whose stored episode count equals the current count; rescrape
    only the tail.  Returns current rows with ``old_count`` (0 if new) and
    ``needs_update`` — downstream fetch planning limits episode work to
    rows where needs_update, slicing from old_count."""
    oc = old_counts.select(
        F.col(key), F.col(old_count_col).alias("old_count")
    )
    j = current.join(F.broadcast(oc), key, "left").withColumn(
        "old_count", F.coalesce(F.col("old_count"), F.lit(0))
    )
    return j.withColumn(
        "needs_update", F.col(new_count_col) != F.col("old_count")
    )
