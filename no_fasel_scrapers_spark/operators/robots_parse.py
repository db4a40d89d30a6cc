"""robots.txt parsing as pure Spark columns — no per-row Python.

Turns raw robots.txt bodies ``(host, robots_txt)`` into the parsed robots
table the crawl gate consumes ``(host, disallow_prefixes, crawl_delay_ms)``
(operators/robots.apply_robots, politeness.schedule_fetches).

robots.txt looks stateful (a group = a run of ``User-agent`` lines followed
by its rules), but the grammar resolves with two windows:

1. ``group_id`` = running count of group STARTS, where a start is a
   User-agent line not directly preceded by another User-agent line
   (``lag`` + running ``sum`` per host, ordered by line number);
2. group selection = RFC 9309 specificity: groups naming the agent exactly
   beat ``*`` groups; rules outside any matching group are ignored.

Comments (``# …``) and blank lines are stripped; directives match
case-insensitively; empty Disallow values (allow-all) are dropped.
Unknown directives are ignored.  One shuffle on host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def parse_robots_txt(
    robots_bodies: DataFrame,
    agent: str = "*",
    default_delay_ms: int = 0,
) -> DataFrame:
    """(host, robots_txt) → (host, disallow_prefixes array, crawl_delay_ms).

    ``agent`` is the crawler's User-agent token.  Hosts whose body yields
    no applicable rules come back with an empty prefix array and the
    default delay (crawl everything, politely)."""
    lines = robots_bodies.select(
        "host",
        F.posexplode(F.split(F.col("robots_txt"), "\n")).alias(
            "ln", "raw"
        ),
    ).select(
        "host",
        "ln",
        F.trim(F.regexp_replace(F.col("raw"), "#.*", "")).alias("line"),
    ).filter(F.col("line") != "")

    directive = F.lower(F.trim(F.substring_index(F.col("line"), ":", 1)))
    value = F.trim(
        F.expr("substring(line, instr(line, ':') + 1, length(line))")
    )
    parsed = lines.filter(F.col("line").contains(":")).select(
        "host", "ln", directive.alias("d"), value.alias("v")
    )

    w = Window.partitionBy("host").orderBy("ln")
    grouped = parsed.withColumn(
        "is_ua", (F.col("d") == "user-agent").cast("int")
    ).withColumn(
        "group_id",
        F.sum(
            (
                (F.col("d") == "user-agent")
                & (
                    F.coalesce(
                        F.lag("d").over(w) != F.lit("user-agent"),
                        F.lit(True),
                    )
                )
            ).cast("int")
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )

    agents = (
        grouped.filter(F.col("d") == "user-agent")
        .groupBy("host", "group_id")
        .agg(
            F.max(
                (F.lower(F.col("v")) == agent.lower()).cast("int")
            ).alias("named"),
            F.max((F.col("v") == "*").cast("int")).alias("wild"),
        )
    )
    # RFC 9309 group selection: exact-agent groups win over '*' groups
    host_has_named = agents.groupBy("host").agg(
        F.max("named").alias("host_named")
    )
    applicable = (
        agents.join(host_has_named, "host")
        .filter(
            ((F.col("host_named") == 1) & (F.col("named") == 1))
            | ((F.col("host_named") == 0) & (F.col("wild") == 1))
        )
        .select("host", "group_id")
    )

    rules = grouped.join(applicable, ["host", "group_id"])
    disallows = (
        rules.filter((F.col("d") == "disallow") & (F.col("v") != ""))
        .groupBy("host")
        .agg(
            F.array_sort(F.collect_set("v")).alias("disallow_prefixes")
        )
    )
    delays = (
        rules.filter(F.col("d") == "crawl-delay")
        .groupBy("host")
        .agg(
            (F.max(F.col("v").cast("double")) * 1000).cast("long").alias(
                "delay_ms"
            )
        )
    )
    hosts = robots_bodies.select("host").distinct()
    return (
        hosts.join(disallows, "host", "left")
        .join(delays, "host", "left")
        .select(
            "host",
            F.coalesce(
                F.col("disallow_prefixes"),
                F.array().cast("array<string>"),
            ).alias("disallow_prefixes"),
            F.coalesce(F.col("delay_ms"), F.lit(default_delay_ms))
            .cast("long")
            .alias("crawl_delay_ms"),
        )
    )
