"""URL frontier: schema, wave materialization, salted host partitioning.

The reference's frontier is implicit — static page ranges + per-page link
lists (``Common.py:141-160``, O4/O13).  Here it is an explicit DataFrame
with a deterministic total order, which is what makes the crawl reproducible
at any parallelism (north_rule):

    wave ordering key = (priority ASC, depth ASC, url_hash ASC)

``take_wave`` materializes one wave as ``ORDER BY key LIMIT budget`` —
Spark plans that as TakeOrderedAndProject (no full sort at the driver), and
the leftover rows carry to the next wave.  Partitioning for the fetch stage
is ``repartition(host, host_salt)`` so one mega-host spreads over
``n_salts`` tasks instead of straggling one (AQE skew-join handles the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.canonical import canonicalize_url, url_host

FRONTIER_SCHEMA = (
    "url string, url_hash long, host string, host_salt int, site string, "
    "category string, role string, url_template string, depth int, "
    "priority int, discovered_from string"
)

ORDER_COLS = ["priority", "depth", "url_hash"]

# pagination expansion: pages per explode task (see _pagination_cols) —
# bounds both the per-task URL-build work and the sequence() array size
PAGINATION_CHUNK = 8_192


from functools import lru_cache


@lru_cache(maxsize=8)
def _frontier_key_cols(n_salts: int):
    """Loop-invariant Column trees for :func:`with_frontier_keys`.

    Column objects are immutable unresolved-expression trees bound by NAME,
    so the same objects re-apply to any DataFrame with a ``url`` column.
    Building them costs ~100 py4j roundtrips (the canonicalization tree is
    deep); the crawl loop calls this every wave, so caching removes a
    measurable slice of per-wave driver latency.

    Single-gateway assumption (ADVICE r3): the cached Columns hold py4j
    ``_jc`` refs into the process-wide JVM gateway, which classic local
    ``getOrCreate`` never recycles in-process.  Under Spark Connect or a
    relaunched gateway the refs would go stale — call
    ``_frontier_key_cols.cache_clear()`` after any gateway restart."""
    canon = canonicalize_url(F.col("url"))
    h = F.xxhash64(canon)
    return (
        canon.alias("url"),
        h.alias("url_hash"),
        url_host(canon).alias("host"),
        F.pmod(h, F.lit(n_salts)).cast("int").alias("host_salt"),
    )


def with_frontier_keys(df: DataFrame, n_salts: int = 8) -> DataFrame:
    """Normalize raw (url, …) rows into frontier rows: canonicalize the url
    and attach url_hash / host / host_salt.  Output column order: the four
    key columns first, then the remaining input columns (callers select
    their exact shape afterwards)."""
    url_c, hash_c, host_c, salt_c = _frontier_key_cols(n_salts)
    others = [
        c for c in df.columns
        if c not in ("url", "url_hash", "host", "host_salt")
    ]
    return df.select(url_c, hash_c, host_c, salt_c, *others)


def seeds_to_frontier(seeds: DataFrame, n_salts: int = 8) -> DataFrame:
    base = (
        seeds.withColumn("depth", F.coalesce(F.col("depth"), F.lit(0)))
        .withColumn("priority", F.coalesce(F.col("priority"), F.lit(0)))
        .withColumn("discovered_from", F.lit(None).cast("string"))
    )
    return with_frontier_keys(base, n_salts).select(
        "url", "url_hash", "host", "host_salt", "site", "category", "role",
        "url_template", "depth", "priority", "discovered_from",
    )


def dedup_within(frontier: DataFrame) -> DataFrame:
    """Keep one row per url_hash — lowest (priority, depth) wins, then the
    lexicographically-first discovered_from for determinism."""
    w = F.row_number().over(
        _order_window(partition=["url_hash"])
    )
    return frontier.withColumn("__rn", w).filter(F.col("__rn") == 1).drop("__rn")


def _order_window(partition: list[str] | None = None):
    from pyspark.sql.window import Window

    cols = [
        F.col("priority").asc(),
        F.col("depth").asc(),
        F.col("url_hash").asc(),
        F.col("discovered_from").asc_nulls_first(),
    ]
    w = Window.orderBy(*cols)
    if partition:
        w = Window.partitionBy(*partition).orderBy(*cols)
    return w


def take_wave(
    frontier: DataFrame, budget: int | None
) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (this_wave, leftover) by the deterministic order.

    With a budget this is a global top-K (TakeOrderedAndProject); leftovers
    are the anti-join of the original against the taken keys.  Without a
    budget the whole frontier is the wave (no sort materialized — ordering
    is only a logical contract unless an audit rank is requested).
    """
    if budget is None:
        return frontier, frontier.limit(0)
    wave = frontier.orderBy(*[F.col(c).asc() for c in ORDER_COLS]).limit(budget)
    leftover = frontier.join(wave.select("url_hash"), "url_hash", "left_anti")
    return wave, leftover


def with_audit_rank(wave: DataFrame) -> DataFrame:
    """Attach the global deterministic rank within the wave (audit mode).

    A global row_number forces a single-partition window — fine for audit
    runs and tests; production runs skip it (the order exists logically and
    per-host ranks are computed partitioned, see politeness)."""
    from pyspark.sql.window import Window

    w = Window.orderBy(*[F.col(c).asc() for c in ORDER_COLS])
    return wave.withColumn("rank", F.row_number().over(w) - 1)


def repartition_for_fetch(wave: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Salted host repartition before the fetch/extract stage (skew control)."""
    if n_partitions:
        return wave.repartition(n_partitions, "host", "host_salt")
    return wave.repartition("host", "host_salt")


def expand_pagination_df(
    probes: DataFrame, n_salts: int = 8, max_pages: int = 100_000
) -> DataFrame:
    """Distributed pagination expansion (O4/O5): probe rows → one listing
    frontier row per page 1..last_page.

    ``probes`` columns: site, category, url_template (with a ``{p}`` page
    placeholder), last_page, depth, priority, from_url.  The expansion is
    ``explode(sequence(...))`` — no driver-side collect and a plan of
    constant size regardless of probe count, so a wave that discovers a
    million listing extents expands entirely on executors.  This replaces
    the reference's split_into_ranges + thread pools (O13) outright.

    ``max_pages`` clamps each probe's extent: ``sequence`` materializes
    the range as one in-memory array per probe row, so a single corrupt
    page whose parsed last_page is absurd must degrade to a bounded
    expansion, not an executor OOM / array-size error that kills the wave.

    Probes collapse per (site, category, url_template, depth, priority)
    BEFORE expansion: every listing page of a category re-declares the
    same pagination extent, so a wave of L listing pages would otherwise
    explode L × last_page rows (measured: a 10^6-page site's listing wave
    expanded 3.9 BILLION rows that dedup then discarded).  The collapse
    is survivor-identical to naive-expand + ``dedup_within`` INCLUDING
    provenance: page ``p``'s ``from_url`` is the min over probes whose
    extent covers ``p`` (probes group per declared ``last_page``, then
    each band between consecutive extents expands once with the running
    min ``from_url`` of the extents covering it), so when probes disagree
    on the extent — the corrupt-page case — pages beyond a smaller
    probe's range are never attributed to it.  Extents per group are
    few (they agree except for corruption), so the band window is tiny;
    expanded row count stays exactly ``max(last_page)`` per group.
    NULL ``from_url`` probes are ignored by the min (probes always carry
    the url that declared them).
    """
    probe_filter, band_cols, chunk_cols, expand_cols, out_cols = (
        _pagination_cols(max_pages)
    )
    ex = (
        probes.filter(probe_filter)
        # one row per distinct declared extent
        .groupBy(
            "site", "category", "url_template", "depth", "priority",
            "last_page",
        )
        .agg(F.min("from_url").alias("from_url"))
        # band (next_smaller_extent, this_extent] is covered by this and
        # all larger extents → running min of from_url in desc order
        .select(*band_cols)
        .filter(F.col("band_start") <= F.col("band_stop"))
        # chunk starts, spread across the cluster BEFORE the page explode
        # so no single task builds a whole extent's URLs.  The explicit
        # partition count pins the exchange (AQE leaves user-numbered
        # repartitions alone — size-based coalescing would see tiny chunk
        # rows and re-serialize the expansion it exists to spread).  The
        # count tracks the cluster (defaultParallelism), floored by
        # n_salts, so direct run_crawl callers who never tune n_salts
        # still spread a mega-extent over every core (ADVICE r4).
        .select(*chunk_cols)
        .repartition(
            max(
                n_salts,
                probes.sparkSession.sparkContext.defaultParallelism,
            ),
            "site", "category", "url_template", "chunk_start",
        )
        .select(*expand_cols)
        .select(*out_cols)
    )
    return with_frontier_keys(ex, n_salts).select(
        "url", "url_hash", "host", "host_salt", "site", "category", "role",
        "url_template", "depth", "priority", "discovered_from",
    )


@lru_cache(maxsize=8)
def _pagination_cols(max_pages: int):
    """Loop-invariant Column trees for :func:`expand_pagination_df` (same
    rationale as :func:`_frontier_key_cols`)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(
        "site", "category", "url_template", "depth", "priority"
    ).orderBy(F.col("last_page").desc())
    probe_filter = (
        F.col("last_page").isNotNull()
        & (F.col("last_page") >= 1)
        & F.col("url_template").isNotNull()
    )
    band_cols = (
        F.col("site"), F.col("category"), F.col("url_template"),
        F.col("depth"), F.col("priority"),
        F.min("from_url")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("from_url"),
        # wide types until after the clamp: casting a corrupt long to
        # int can wrap negative and defeat the guard
        (F.lead(F.col("last_page").cast("long"), 1, 0).over(w) + 1)
        .alias("band_start"),
        F.least(
            F.col("last_page").cast("long"),
            F.lit(max_pages).cast("long"),
        ).alias("band_stop"),
    )
    # two-level explode: band → fixed-size chunks → pages.  A single
    # explode(sequence(band_start, band_stop)) expands one extent in ONE
    # task — a mega-extent (a host declaring 10^5-10^9 listing pages)
    # serializes its whole URL build on one core (measured: 187,500 pages
    # of the 3M bench site built in 3 tasks ≈ 5.5 s serial per wave).
    # Chunk starts are cheap (1 row per PAGINATION_CHUNK pages), get
    # hash-repartitioned across the cluster, and each task then explodes
    # at most PAGINATION_CHUNK pages.  Union of chunk ranges == the band
    # range, and from_url is constant per band, so output rows are
    # identical.
    chunk_cols = (
        F.col("site"), F.col("category"), F.col("url_template"),
        F.col("depth"), F.col("priority"), F.col("from_url"),
        F.col("band_stop"),
        F.explode(
            F.sequence(
                F.col("band_start"),
                F.col("band_stop"),
                F.lit(PAGINATION_CHUNK).cast("long"),
            )
        ).alias("chunk_start"),
    )
    expand_cols = (
        F.col("site"), F.col("category"), F.col("url_template"),
        F.col("depth"), F.col("priority"), F.col("from_url"),
        F.explode(
            F.sequence(
                F.col("chunk_start").cast("int"),
                F.least(
                    F.col("chunk_start") + F.lit(PAGINATION_CHUNK - 1),
                    F.col("band_stop"),
                ).cast("int"),
            )
        ).alias("page"),
    )
    out_cols = (
        F.replace(
            F.col("url_template"), F.lit("{p}"),
            F.col("page").cast("string"),
        ).alias("url"),
        F.col("site"),
        F.col("category"),
        F.lit("listing").alias("role"),
        F.lit(None).cast("string").alias("url_template"),
        (F.coalesce(F.col("depth"), F.lit(0)) + 1).cast("int").alias("depth"),
        F.coalesce(F.col("priority"), F.lit(0)).cast("int").alias("priority"),
        F.col("from_url").cast("string").alias("discovered_from"),
    )
    return probe_filter, band_cols, chunk_cols, expand_cols, out_cols


def expand_pagination(
    spark: SparkSession,
    probes: list[dict],
    n_salts: int = 8,
) -> DataFrame | None:
    """List-of-dicts convenience wrapper over :func:`expand_pagination_df`
    (driver-seeded probes, e.g. a fresh crawl's seed extents)."""
    rows = [
        (
            p.get("site"), p.get("category"), p.get("url_template"),
            int(p["last_page"]), int(p.get("depth", 0)),
            int(p.get("priority", 0)), p.get("from_url"),
        )
        for p in probes
        if p.get("last_page") and p.get("url_template")
    ]
    if not rows:
        return None
    df = spark.createDataFrame(
        rows,
        "site string, category string, url_template string, last_page int, "
        "depth int, priority int, from_url string",
    )
    return expand_pagination_df(df, n_salts)
