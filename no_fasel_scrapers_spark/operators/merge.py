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


ANIME_EPS_SCHEMA = "map<string, struct<`Episode Number` int, Source string>>"


def anime_episode_delta(
    prior: DataFrame,
    current_entries: DataFrame,
    key: str = "series_id",
) -> DataFrame:
    """Anime incremental merge — FaselAnimeScraper.py:112-124 semantics.

    The anime scraper's delta structure is per-EPISODE-LIST, without the
    series family's seasons level: for a known anime whose current anchor
    count equals the stored ``Number Of Episodes``, nothing is rescraped
    (the old record passes through untouched); on a count mismatch only
    the episodes PAST the stored count are scraped and appended
    (``scrape_episodes(current, episodes, start=old_number)``, line 119),
    and the stored count grows by the number of newly-scraped episodes
    (line 121).  Unknown anime (KeyError, line 124) get a full record.

    Inputs:
      prior:            (series_id, old_count, old_eps_json) — the stored
                        records; old_eps_json in ANIME_EPS_SCHEMA shape
      current_entries:  (series_id, eid, num, src[, pos]) — this crawl's
                        episode rows; ``pos`` = 1-based position in the
                        anchor list.  The slice is POSITIONAL — the
                        reference splits ``episodes_sources[old_count:]``
                        by list position (``scrape_episodes(current,
                        episodes, start=old)``, FaselAnimeScraper.py:60-67)
                        — so callers whose anchor numbering can be
                        non-sequential must pass ``pos``; without it the
                        anchor-text ``num`` is used (equivalent only for
                        sequential 1..N anchors).  Rows whose episode page
                        failed to scrape carry NULL ``eid``/``src``: they
                        count toward the anchor total (``cur_count``, line
                        108's ``len(anime_episodes_list)``) but never land
                        in the merged map nor in ``n_new`` —
                        ``get_iframe_source`` skips them (lines 42/49) and
                        ``+= len(new_episodes)`` (line 121) counts only
                        landed entries.
    Output: one row per merged episode
      (series_id, eid, num, src, old_count, episodes_total, n_new)
    with episodes_total = old_count + n_new where n_new = distinct landed
    episode ids in the slice (the reference accumulates into a dict keyed
    by episode id — duplicates collapse, last list position wins — and
    ``Episodes.update(new_episodes)`` lets a re-scraped id replace the
    stored entry while the count still grows by ``len(new_episodes)``).
    Computed entirely as joins + groupBys — no driver loops, so a 10^7-
    series catalog merges in a bounded number of shuffles."""
    pr = prior.select(
        F.col(key),
        F.col("old_count"),
        F.explode_outer(
            F.from_json(F.col("old_eps_json"), ANIME_EPS_SCHEMA)
        ).alias("eid", "v"),
    ).select(
        key, "old_count", "eid",
        F.col("v.`Episode Number`").alias("num"),
        F.col("v.Source").alias("src"),
    )
    counts = current_entries.groupBy(key).agg(
        F.count("*").cast("int").alias("cur_count")
    )
    oc = prior.select(key, "old_count")
    state = counts.join(F.broadcast(oc), key, "left").withColumn(
        "old_count", F.coalesce(F.col("old_count"), F.lit(0))
    )

    # unchanged series: old episodes pass through untouched
    unchanged_keys = state.filter(
        F.col("cur_count") == F.col("old_count")
    ).select(key)
    unchanged = pr.join(unchanged_keys, key, "left_semi").filter(
        F.col("eid").isNotNull()
    )

    # changed/new series: old episodes + the positional slice past
    # old_count, landed (non-NULL eid+src) rows only
    changed = state.filter(F.col("cur_count") != F.col("old_count"))
    old_part = pr.join(changed.select(key), key, "left_semi").filter(
        F.col("eid").isNotNull()
    )
    pos = F.col("pos" if "pos" in current_entries.columns else "num")
    landed = (
        current_entries.join(F.broadcast(changed), key, "inner")
        .filter(
            (pos > F.col("old_count"))
            & F.col("eid").isNotNull()
            & F.col("src").isNotNull()
        )
    )
    # dict semantics: one entry per episode id, last list position wins
    w_eid = Window.partitionBy(key, "eid").orderBy(
        pos.desc(), F.col("src").asc()
    )
    new_part = (
        landed.withColumn("__rn", F.row_number().over(w_eid))
        .filter(F.col("__rn") == 1)
        .select(key, "eid", "num", "src")
    )
    # Episodes.update(new_episodes): a re-scraped id replaces the stored one
    merged = (
        old_part.select(key, "eid", "num", "src")
        .join(new_part.select(key, "eid"), [key, "eid"], "left_anti")
        .unionByName(new_part)
    )

    n_new = landed.groupBy(key).agg(
        F.count_distinct("eid").cast("int").alias("n_new")
    )
    totals = (
        state.join(n_new, key, "left")
        .withColumn("n_new", F.coalesce(F.col("n_new"), F.lit(0)))
        .withColumn("episodes_total", F.col("old_count") + F.col("n_new"))
        .select(key, "old_count", "episodes_total", "n_new")
    )
    return merged.unionByName(unchanged.select(key, "eid", "num", "src")).join(
        F.broadcast(totals), key, "inner"
    )
