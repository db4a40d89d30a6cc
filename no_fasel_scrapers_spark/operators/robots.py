"""robots.txt gating — pure join + array filter (north_rule requirement).

Absent from the reference entirely (SURVEY.md §4): its fetches are
unthrottled and ungated.  Here: frontier ⋈ robots (broadcast — the robots
table is one row per host) then drop rows whose canonical path starts with
any disallowed prefix.  ``F.exists`` over the prefix array keeps the whole
gate inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_path(url) -> "F.Column":
    """Path component of a canonical URL (always starts with '/')."""
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    path = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_extract(path, r"^([^?#]*)", 1)
    return F.when(path == "", F.lit("/")).otherwise(path)


def apply_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Return (allowed, blocked) frontier rows."""
    joined = frontier.join(
        F.broadcast(robots.select("host", "disallow_prefixes")), "host", "left"
    ).withColumn("__path", url_path(F.col("url")))
    blocked_cond = F.coalesce(
        F.exists(
            F.col("disallow_prefixes"),
            lambda p: F.col("__path").startswith(p),
        ),
        F.lit(False),
    )
    allowed = (
        joined.filter(~blocked_cond).drop("disallow_prefixes", "__path")
    )
    blocked = joined.filter(blocked_cond).drop("disallow_prefixes", "__path")
    return allowed, blocked
