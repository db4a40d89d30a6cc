"""The crawl engine: deterministic frontier waves over an offline pages table.

Replaces the reference's whole orchestration machinery — nested thread/
process pools (O13), static page ranges (O4), per-dict dedup (O10), cookie
mutex (O1/O2) — with one declarative wave loop:

    wave k:  frontier ──take_wave(budget)──▶ wave rows
             ──robots gate──▶ allowed        (O-north: robots)
             ──bloom + exact anti-join──▶ fresh   (O10 at scale)
             ──politeness schedule──▶ scheduled   (O-north: token bucket)
             ──join pages table──▶ fetched        ("fetch" = offline join)
             ──mapInPandas extract──▶ extracted   (O6/O7, Arrow batches)
             links + pagination expansion ──▶ frontier k+1
             seen ∪= attempted;  lineage += wave metrics
             checkpoint (frontier, seen, outputs) → catalog snapshot

Every wave checkpoints to the snapshot catalog with per-partition lineage
(wave id, host, rows fetched/deduped) so a killed job resumes exactly
(north_rule); ``resume_crawl`` proves it in tests/test_resume.py.

Scale notes (100 TB / 10^10 URLs) — the big tables are never shuffled:
- "fetch": a broadcast left-semi streams the pages table once per wave,
  reduced to the wave's url_hashes; the outer join then runs between two
  wave-sized inputs.  No shuffle of the corpus, ever;
- the seen set is append-only (per-wave O(delta) snapshots, read_log
  reassembly, atomic 'compact' markers for recrawl invalidation) and its
  exact-dedup check streams it the same semi-reduce way — the anti-join
  runs against the wave-bounded hit set, broadcast; the frontier
  pre-prune follows the same discipline (leftover vs the wave delta,
  discoveries vs a semi-reduced hit set — see the loop-bottom comment),
  so no stage anywhere shuffles the seen set;
- bloom blobs are incremental: pinned (m, k) sizing from expected_urls,
  per-wave delta build + per-shard OR merge (O(filter bytes) per wave),
  checkpointed and restored on resume; only bloom-positive rows reach the
  exact backstop;
- a global audit rank is OFF by default (single-partition window); the
  deterministic order still exists logically via the (priority, depth,
  url_hash) key;
- the frontier staging table IS rewritten per wave (leftover ∪
  discoveries) — a deliberate trade-off: unlike the monotonically-growing
  seen set, the frontier shrinks toward exhaustion and the total cost is
  bounded by max_waves × |frontier| (linear in waves, not quadratic in
  crawl size).  An append-log frontier would need a second
  processed-url exclusion log (robots-blocked rows never enter seen) and
  an iterative top-K; the rewrite buys the simple deterministic
  take_wave contract instead.

Live-fetch note: the offline join stands in for HTTP.  A live adapter
replaces ``_fetch_offline`` with a mapInPandas batch fetcher consuming
``scheduled_ms`` (token bucket) + a driver-refreshed auth token broadcast
(cookie gate O1) — deliberately isolated so the engine itself stays
deterministic and testable.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions.extract import EXTRACT_SCHEMA, extract_page
from ..operators.frontier import (
    ORDER_COLS,
    dedup_within,
    expand_pagination_df,
    seeds_to_frontier,
    take_wave,
    with_audit_rank,
    with_frontier_keys,
)
from ..operators.politeness import politeness_metrics, schedule_fetches
from ..operators.robots import apply_robots
from ..operators.seen_filter import (
    bloom_params as _bloom_params,
    BROADCAST_MAX_BYTES,
    build_filter_blobs,
    dedup_against_seen,
    merge_filter_blobs,
)
from ..sources.catalog import Catalog

PASSTHROUGH = ["site", "category", "depth", "priority", "url_template"]
CRAWL_EXTRACT_SCHEMA = (
    EXTRACT_SCHEMA
    + ", category string, depth int, priority int, url_template string, wave int"
)


def _extractor(wave_no: int):
    """mapInPandas body with frontier-column passthrough."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                out = extract_page(rec["url"], rec["role"], rec["html"])
                out["category"] = rec["category"]
                out["depth"] = rec["depth"]
                out["priority"] = rec["priority"]
                out["url_template"] = rec["url_template"]
                out["wave"] = wave_no
                rows.append(out)
            cols = [
                "url", "role", "site", "links", "cards", "fields",
                "last_page", "text", "category", "depth", "priority",
                "url_template", "wave",
            ]
            yield pd.DataFrame(rows, columns=cols)

    return run


@dataclass
class CrawlResult:
    extracted: DataFrame          # all waves, CRAWL_EXTRACT_SCHEMA
    seen: DataFrame               # url_hash, url, wave (+rank in audit mode)
    lineage: list[dict] = field(default_factory=list)
    waves: int = 0


def _obs_n(obs: Observation, fallback_df: DataFrame, col: str = "n") -> int:
    """Observation metric with an empty-plan fallback.

    When a wave's ``scheduled`` set materializes EMPTY at runtime (every
    candidate robots-blocked or already seen — e.g. a recrawled page
    re-discovering only a disallowed link, or a resume whose whole
    frontier is already in the seen set), AQE's empty-relation propagation
    can rewrite the wave's write plan around the CollectMetrics nodes, so
    the Observation never fires and PySpark's ``get`` trips a JVM-side
    assertion.  The fallback count only runs for such degenerate waves,
    where the input is the wave-bounded (persisted) frontier slice —
    never the pages or seen tables."""
    try:
        return int(obs.get[col] or 0)
    except Exception:
        return fallback_df.count()


def _prep_pages(pages: DataFrame) -> DataFrame:
    """Slim fetch-side projection keyed by url_hash.

    If the pages table already carries ``url_hash`` (contract: it MUST be
    ``xxhash64(url)``), reuse it instead of recomputing — critically, this
    keeps a url_hash-BUCKETED corpus table's output partitioning intact,
    so the per-wave fetch join reads co-located buckets and the HTML side
    never shuffles at all (the 100 TB ingest pattern: pay one bucketed
    write at ingest, amortize it over every crawl/recrawl).  Computing
    ``xxhash64(url)`` fresh would be a new expression Catalyst can't
    relate to the bucket spec."""
    if "url_hash" in pages.columns:
        return pages.select(
            F.col("url").alias("p_url"), "url_hash", "html"
        )
    return pages.select(
        F.col("url").alias("p_url"),
        F.xxhash64(F.col("url")).alias("url_hash"),
        "html",
    )


def _empty_seen(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "url_hash long, url string, wave int, rank int")


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    catalog: Catalog,
    *,
    wave_budget: int | None = None,
    max_waves: int = 24,
    n_salts: int = 8,
    n_shards: int = 32,
    bloom_min_seen: int = 50_000,
    expected_urls: int = 2_000_000,
    seen_prior: DataFrame | None = None,
    recrawl: DataFrame | None = None,
    audit: bool = False,
    start_wave: int = 0,
    frontier: DataFrame | None = None,
    seen: DataFrame | None = None,
    lineage: list[dict] | None = None,
    cache_pages: bool = True,
    max_pagination: int = 100_000,
    overlap_frontier: bool = True,
) -> CrawlResult:
    pages_k = _prep_pages(pages)
    # The pages side is scanned once per wave.  Caching pays when the
    # source is expensive to recompute (the test fixtures materialize from
    # driver-side rows) and fits in memory; at corpus scale (10^6+ pages,
    # 100 TB on a cluster) the deserialized-html cache is strictly worse
    # than re-scanning columnar parquet with the semi-join's pushdown —
    # pass cache_pages=False there (bench.py --crawl-scale does).
    if cache_pages:
        pages_k.cache()

    if frontier is None:
        frontier = seeds_to_frontier(seeds, n_salts)
    # Whether the CALLER handed us a seen set: the wave-0 dedup-skip below
    # must never fire in that case, even when lineage says seen_count == 0 —
    # lineage counts are absent for direct callers, so emptiness cannot be
    # inferred from them (ADVICE r3).
    caller_seen = seen is not None
    if seen is None:
        seen = _empty_seen(spark)
        if seen_prior is not None:
            seen = seen.unionByName(
                with_frontier_keys(seen_prior.select("url"), n_salts).select(
                    "url_hash", "url",
                    F.lit(-1).alias("wave"), F.lit(-1).alias("rank"),
                )
            )
    if recrawl is not None:
        # recrawl invalidation (cuckoo-delete semantics on the exact set):
        # dropped urls become fetchable again this run
        from ..operators.seen_filter import invalidate_recrawl

        keys = with_frontier_keys(recrawl.select("url"), n_salts).select(
            "url_hash"
        )
        seen, _ = invalidate_recrawl(seen, keys, n_shards=n_shards)
        if catalog.exists("seen"):
            # the invalidated set replaces the append-log atomically: one
            # snapshot marked 'compact' restarts the log (Iceberg REPLACE)
            catalog.write(
                seen, "seen",
                meta={"wave": start_wave - 1, "kind": "compact"},
            )
            seen = catalog.read_log(spark, "seen")
    if (seen_prior is not None or caller_seen) and not catalog.exists(
        "seen"
    ):
        # fresh run with imported history (seen_prior=) OR a caller-passed
        # seen set (seen=) over a fresh catalog: publish it as the log base
        # so per-wave writes stay O(delta) (the seen set is never
        # rewritten).  The caller_seen case matters beyond efficiency: the
        # wave loop re-reads `seen` from the log after every wave, so a
        # caller-passed set that never reached the log would silently stop
        # deduping from wave 1 on (found building recrawl_delta, round 5 —
        # the resume path always has a catalog base, which masked it).
        catalog.write(
            seen, "seen", meta={"wave": start_wave - 1, "kind": "base"}
        )
        seen = catalog.read_log(spark, "seen")

    lineage = list(lineage or [])
    # running seen-set size, maintained incrementally from wave metrics so
    # the bloom gate below costs no extra count() job
    seen_count = sum(l.get("attempted", 0) for l in lineage)
    if seen_prior is not None or (lineage == [] and start_wave > 0):
        seen_count = max(seen_count, seen.select("url_hash").distinct().count())

    robots_b = robots
    wave_no = start_wave
    # frontier size as known from the last frontier snapshot's manifest
    # (footer counts, job-free); None = unknown (initial/resumed frontier)
    frontier_rows: int | None = None

    # Bloom blobs are maintained INCREMENTALLY: built once from the full
    # seen set when it first crosses bloom_min_seen (or restored from the
    # catalog on resume), then each wave ORs in a pinned-size delta blob —
    # O(filter bytes) per wave, never an O(|seen|) rebuild.  (m, k) are
    # pinned from expected_urls so delta blobs stay OR-mergeable; blowing
    # past the estimate only degrades fpp, the exact backstop keeps dedup
    # exact.  Stale bits after recrawl invalidation are likewise safe:
    # bloom false positives are always corrected by the backstop.
    n_per_shard = max(1, expected_urls // n_shards)
    # How the probe ships the filter to executors: decided ONCE from the
    # pinned sizing (total filter bytes = expected_urls * bits_per_key/8),
    # not per wave — the "auto" path would re-agg the blob table every
    # wave for an answer the driver already knows.
    blob_strategy = (
        "broadcast"
        if expected_urls * 10 // 8 <= BROADCAST_MAX_BYTES
        else "cogroup"
    )
    blobs = (
        catalog.read(spark, "blobs") if catalog.exists("blobs") else None
    )
    if blobs is not None:
        # Fail-fast guard (ADVICE r1): restored blobs carry pinned (m, k);
        # a resume launched with a different --expected-urls would only
        # blow up executor-side at merge time, mid-wave, after robots/
        # dedup/fetch work.  Check on the driver up front — n_shards rows —
        # and trigger a one-shot rebuild from the seen set instead of
        # dying later (the loop below rebuilds whenever blobs is None).
        exp_m, exp_k = _bloom_params(n_per_shard)
        got = blobs.select("m", "k").distinct().collect()
        if any((r["m"], r["k"]) != (exp_m, exp_k) for r in got):
            print(
                f"crawl: restored filter blobs have (m, k) = "
                f"{[(r['m'], r['k']) for r in got]} but expected_urls="
                f"{expected_urls} pins {(exp_m, exp_k)}; discarding and "
                "rebuilding from the seen set"
            )
            blobs = None

    # Pruned-frontier invariant: the frontier written at the bottom of a
    # wave never contains an already-attempted url_hash.  Fresh runs start
    # with empty seen (holds trivially); resumed runs restored a frontier
    # that was pruned before checkpointing (holds); ONLY a fresh run
    # importing prior history starts with a frontier that may overlap the
    # seen set — its first wave prunes leftover against the FULL seen set
    # once (flag below), after which the invariant lets every later wave
    # prune with wave-bounded joins only.
    leftover_vs_full = seen_prior is not None

    # Loop-invariant Column trees, built ONCE: Columns are immutable
    # name-bound expression trees, so the same objects re-apply every wave.
    # Rebuilding them per wave cost ~0.5s of py4j roundtrips per wave at
    # any scale (driver fixed cost, measured round 3).
    _links_cols = (
        F.explode_outer("links").alias("l"),
        F.col("url").alias("discovered_from"),
        F.col("category"), F.col("depth"), F.col("priority"),
    )
    _child_cols = (
        F.col("l.url").alias("url"),
        F.lit(None).cast("string").alias("site"),
        F.col("category"),
        F.col("l.role").alias("role"),
        F.lit(None).cast("string").alias("url_template"),
        (F.col("depth") + 1).cast("int").alias("depth"),
        F.col("priority").cast("int").alias("priority"),
        F.col("discovered_from"),
    )
    _site_expr = _site_col(F.col("host"))
    _frontier_shape = [
        "url", "url_hash", "host", "host_salt", "site", "category",
        "role", "url_template", "depth", "priority", "discovered_from",
    ]
    _probe_cols = (
        F.col("site"), F.col("category"), F.col("url_template"),
        # reference HDW over-scan quirk: pages 1..last+1
        # (HDWMoviesScraper.py:60)
        (
            F.col("last_page")
            + F.when(F.col("site") == "hdw", 1).otherwise(0)
        ).alias("last_page"),
        F.col("depth"), F.col("priority"), F.col("url").alias("from_url"),
    )
    _extract_in_cols = (
        "url", "role", "html", "site", "category", "depth", "priority",
        "url_template",
    )
    # upper-bound bookkeeping for the pipelined frontier (see the tail):
    # mirrors expand_pagination_df's probe filter
    _extent_pred = (
        F.col("last_page").isNotNull()
        & (F.col("last_page") >= 1)
        & F.col("url_template").isNotNull()
    )
    _links_size = F.when(F.col("links").isNull(), F.lit(0)).otherwise(
        F.size(F.col("links"))
    )

    # ---- pipelined-frontier state (overlap_frontier=True) ---------------
    # The wave-k frontier writer runs on a thread UNDER wave k+1's fetch
    # stage; `_f_prev` tracks (thread, error holder, wall holder, pins to
    # unpersist once it lands).  `frontier_ub` carries a row-count UPPER
    # BOUND for the frontier the writer is still materializing — what the
    # broadcast-safety decision (bounded_wave) uses in place of the
    # manifest count the serial tail would have.
    _f_prev: dict | None = None
    _prev_nxt: DataFrame | None = None
    frontier_ub: int | None = None

    def _join_prev_frontier():
        nonlocal _f_prev
        if _f_prev is None:
            return
        _f_prev["thread"].join()
        if _f_prev["err"]:
            raise _f_prev["err"][0]
        t_ms["frontier_write_bg"] = _f_prev["ms"][0] if _f_prev["ms"] else 0
        for h in _f_prev["pins"]:
            h.unpersist()
        _f_prev = None

    while wave_no < max_waves:
        t_ms: dict = {}
        _t0 = time.monotonic()

        def _mark(stage):
            nonlocal _t0
            now = time.monotonic()
            t_ms[stage] = round((now - _t0) * 1000)
            _t0 = now

        # emptiness comes free from the frontier snapshot's manifest row
        # count whenever this frontier was published by the previous wave;
        # the isEmpty() job only runs for an initial/resumed frontier whose
        # size the manifest doesn't know (wave fixed-cost pass, VERDICT r1
        # next-steps #9 — dedup_within cannot turn nonempty into empty)
        if frontier_rows == 0:
            break
        if frontier_ub == 0:
            # pipelined tail: the upper bound is exact at zero (leftover,
            # link and pagination masses all zero), so the frontier the
            # background writer is publishing is provably empty
            break
        frontier = dedup_within(frontier)
        if (
            frontier_rows is None
            and frontier_ub is None
            and frontier.isEmpty()
        ):
            # initial/resumed frontier of unknown size only: under the
            # pipelined tail an isEmpty here would force the in-flight
            # frontier's broadcasts to build a second time (broadcast
            # exchanges are not shared across jobs); a nonzero-ub-but-
            # empty frontier instead drains through one degenerate empty
            # wave that the tail detects (n_wave == 0) and stops after
            break
        _mark("frontier_check")

        wave, leftover = take_wave(frontier, wave_budget)
        # wave/allowed/fresh sizes are collected as Observations on the one
        # write action below — zero extra count() jobs per wave; blocked and
        # dropped counts follow arithmetically
        obs_wave, obs_allowed, obs_sched = (
            Observation(), Observation(), Observation(),
        )
        # persist wave: its subplan (frontier sort + top-K) is referenced
        # from both dedup union branches and the fetch path — caching runs
        # it once per wave instead of per duplicate subtree
        wave = wave.observe(obs_wave, F.count(F.lit(1)).alias("n")).persist()
        allowed, _blocked = apply_robots(wave, robots_b)
        allowed = allowed.observe(obs_allowed, F.count(F.lit(1)).alias("n"))

        # Below bloom_min_seen the exact backstop alone is cheaper than
        # building + probing blobs (two extra Python stages per wave);
        # semantics are identical either way.  First crossing builds the
        # blobs once from the full seen set.
        if blobs is None and seen_count >= bloom_min_seen:
            blobs = build_filter_blobs(
                seen, n_shards, n_expected_per_shard=n_per_shard
            )
            catalog.write(blobs, "blobs", meta={"wave": wave_no})
            blobs = catalog.read(spark, "blobs")
        # a broadcast hint is only safe when the wave is KNOWN bounded:
        # either by an explicit budget, or because the previous wave's
        # frontier-snapshot manifest counted this frontier small (exact
        # footer counts, job-free — ≤5M rows is ≤~40MB of hash keys).
        # Unbudgeted unknown-size waves leave the strategy to AQE (which
        # still broadcasts small runtime sizes, and falls back instead of
        # OOMing).
        bounded_wave = (
            (wave_budget is not None and wave_budget <= 50_000_000)
            or (frontier_rows is not None and frontier_rows <= 5_000_000)
            # pipelined tail: the manifest count is still in flight, but
            # the observation-derived UPPER bound (leftover + raw link
            # mentions + deduped pagination extents) is >= the true size,
            # so a small bound is just as safe to broadcast on
            or (frontier_ub is not None and frontier_ub <= 5_000_000)
        )
        if (
            seen_count == 0 and wave_no == 0 and seen_prior is None
            and not caller_seen
        ):
            # truly-fresh first wave: the seen set is empty, the anti-join
            # is the identity — skip its broadcast build + probe stages
            fresh = allowed
        else:
            fresh = dedup_against_seen(
                allowed, seen, blobs, n_shards,
                broadcast_hint=bounded_wave, blob_strategy=blob_strategy,
            )
        scheduled = schedule_fetches(fresh, robots_b, n_salts).observe(
            obs_sched,
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("host").alias("n_hosts"),
        )

        # scheduled feeds several downstream actions this wave (host
        # metrics, seen delta, fetch join); persist so the robots/bloom/
        # politeness chain runs once, not once per action
        scheduled = scheduled.persist()

        # "fetch" = join the wave against the pages table WITHOUT ever
        # shuffling the big side: a broadcast left-semi first reduces pages
        # to the wave's url_hashes in one streaming pass (a LeftOuter with
        # pages on the build side would fall back to shuffling the whole
        # pages table once the fixture-sized broadcast no longer fits); the
        # outer join then runs between two wave-sized inputs, which AQE
        # broadcasts.  The broadcast is one 8-byte hash per wave row,
        # bounded by wave_budget.
        wave_keys = scheduled.select("url_hash")
        if bounded_wave:
            wave_keys = F.broadcast(wave_keys)
        pages_wave = pages_k.join(wave_keys, "url_hash", "left_semi")
        # NO repartition_for_fetch here: the join output is already
        # uniformly hash-partitioned on url_hash, and a (host, host_salt)
        # repartition after the join would shuffle the wave's FULL HTML a
        # second time (measured: the single largest cost of a 10^6-page
        # wave).  Host grouping only matters for LIVE fetching — the live
        # path (plans/live_fetch.py) salt-repartitions its slim wave
        # BEFORE fetching, when rows are still url-metadata only; here the
        # politeness schedule (fetch_seq/scheduled_ms) is already computed
        # on the slim side, and extraction is row-wise.
        #
        # SHUFFLE_HASH pin (measured pathology, round 2): AQE estimated
        # the semi-joined pages side small from the semi's selectivity
        # guess and converted this join to broadcast — materializing the
        # wave's FULL HTML (1 GB+ at 10^6 pages, unbounded at 10^10) as a
        # broadcast relation AFTER already shuffling it for the initial
        # sort-merge plan.  The hint gives the one plan that is safe at
        # every wave size: each side shuffles once on url_hash, per-
        # partition hash build, no sort of the html side, no html
        # broadcast ever.
        #
        # The hint sits on the SLIM side (round-4 fix): hinting pages_wave
        # made the SHJ BuildRight — every task built its hash relation out
        # of the wave's HTML (~250k rows × ~3 KB ≈ 750 MB per partition at
        # a 12M-page wave; allocation failures killed the crawl).  Spark
        # ≥3.3 builds the preserved side of a left-outer SHJ (SPARK-36612
        # landed in 3.3.0; this repo floors on PySpark 4.x anyway), so
        # hinting `scheduled` gives BuildLeft: the hash
        # relation holds only slim url rows and the HTML side streams
        # through the probe — bounded build memory at ANY wave size.
        fetched = scheduled.hint("SHUFFLE_HASH").join(
            pages_wave, "url_hash", "left"
        ).filter(
            F.col("p_url").isNull() | (F.col("p_url") == F.col("url"))
        )

        extracted = fetched.select(*_extract_in_cols).mapInPandas(
            _extractor(wave_no), schema=CRAWL_EXTRACT_SCHEMA
        )

        # ---- checkpoint this wave's outputs (append-log snapshot) --------
        # the hit count rides the write action as an Observation — the
        # separate wave_ex.filter(...).count() job it replaces was one of
        # the larger per-wave fixed costs (VERDICT r1 next-steps #9)
        obs_hit = Observation()
        extracted = extracted.observe(
            obs_hit,
            F.sum(
                F.when(F.col("text").isNotNull(), 1).otherwise(0)
            ).alias("n"),
            # raw discovery masses for the pipelined tail's frontier-size
            # upper bound — they ride the same write action for free
            F.sum(_links_size).alias("n_links"),
            F.sum(
                F.when(_extent_pred, 1).otherwise(0)
            ).alias("n_extents"),
        )
        snap = catalog.write(
            extracted, "extracted", meta={"wave": wave_no, "kind": "delta"}
        )
        wave_ex = spark.read.parquet(snap.path)
        _mark("fetch_extract_write")

        # ---- wave metrics -------------------------------------------------
        # counts observed during the write action above (obs.get blocks
        # until that action finished, which it already has)
        n_wave = _obs_n(obs_wave, wave)
        n_allowed = _obs_n(obs_allowed, allowed)
        n_blocked = n_wave - n_allowed
        n_fresh = _obs_n(obs_sched, scheduled)
        seen_count += n_fresh
        # obs_hit rides the SAME write plan AQE can rewrite around the
        # CollectMetrics nodes on a degenerate empty wave — fall back like
        # the other three (the recount reads the tiny written snapshot)
        n_hit = _obs_n(obs_hit, wave_ex.filter(F.col("text").isNotNull()))
        # lineage keeps the top-K busiest hosts, not every host: at crawl
        # scale a wave can touch millions of hosts and an unbounded collect
        # would be a driver OOM; the full per-host distribution stays
        # queryable from the scheduled/extracted tables.  The collect runs
        # on a worker THREAD so its job overlaps the seen-checkpoint write
        # below — the two read independent inputs (persisted scheduled vs
        # the same), and overlapping independent jobs hides per-job
        # scheduling latency on a cluster the same way it does here.
        import threading

        host_metrics: list = []
        _host_err: list = []

        def _collect_hosts():
            try:
                host_metrics.extend(
                    r.asDict()
                    for r in politeness_metrics(scheduled)
                    .orderBy(F.desc("n_urls"), "host")
                    .limit(16)
                    .collect()
                )
            except BaseException as ex:  # re-raised on join
                _host_err.append(ex)

        host_thread = threading.Thread(target=_collect_hosts, daemon=True)
        host_thread.start()
        _mark("wave_counts")
        links_df = wave_ex.select(*_links_cols).filter(
            F.col("l").isNotNull()
        )

        # ---- audit rank / seen update ------------------------------------
        if audit:
            ranked = with_audit_rank(scheduled)
            seen_delta = ranked.select(
                "url_hash", "url", F.lit(wave_no).alias("wave"),
                F.col("rank").cast("int").alias("rank"),
            )
        else:
            seen_delta = scheduled.select(
                "url_hash", "url", F.lit(wave_no).alias("wave"),
                F.lit(-1).alias("rank"),
            )
        # append-log: only this wave's delta is written (O(delta), never a
        # rewrite of the growing set — the 10^10-URL requirement); read_log
        # reassembles base + deltas as a flat multi-path parquet scan.
        # The write runs on a thread: its jobs overlap the ENTIRE
        # next-frontier stage below (prune + pagination + frontier write),
        # which depends on wave_ex, scheduled and the PREVIOUS log read but
        # NOT on this write; everything that consumes the updated log (the
        # next wave's dedup gate) sits after the join() at wave end.
        # right-size the delta's file count from the observed wave size
        # (4M rows ≈ a few hundred MB of url+hash per file): the delta
        # inherits `scheduled`'s 32-partition shuffle layout, which at
        # small waves writes 32 near-empty files per wave and makes the
        # log's read fan-out O(32·waves)
        _seen_parts = max(1, min(n_shards, n_fresh // 4_000_000 + 1))
        seen_out = seen_delta.coalesce(_seen_parts)
        _seen_err: list = []

        def _write_seen():
            try:
                catalog.write(
                    seen_out, "seen",
                    meta={"wave": wave_no, "kind": "delta"},
                )
                if blobs is not None:
                    # OR the wave's delta into the standing blobs (pinned
                    # size) and checkpoint; read-back keeps the blob
                    # lineage flat across waves
                    delta_blobs = build_filter_blobs(
                        seen_delta.select("url_hash"),
                        n_shards,
                        n_expected_per_shard=n_per_shard,
                    )
                    catalog.write(
                        merge_filter_blobs(blobs, delta_blobs), "blobs",
                        meta={"wave": wave_no},
                    )
            except BaseException as ex:
                _seen_err.append(ex)

        seen_thread = threading.Thread(target=_write_seen, daemon=True)
        seen_thread.start()
        _mark("seen_checkpoint")

        # ---- next frontier -------------------------------------------------
        child = (
            with_frontier_keys(links_df.select(*_child_cols), n_salts)
            .withColumn("site", _site_expr)
            .select(*_frontier_shape)
        )

        # pagination expansion stays on executors (no probe collect): a wave
        # discovering a million listing extents expands distributed.
        # max_pagination is the anti-absurd-extent clamp — size it from the
        # expected catalog extent (a 3M-item site declares 187,500 listing
        # pages; the 100k default silently truncated it to 1.7M of 3.19M
        # pages, round-4 measurement)
        pagination = expand_pagination_df(
            wave_ex.select(*_probe_cols), n_salts, max_pages=max_pagination
        )

        # ---- frontier pre-prune (wave-bounded; never shuffles seen) -----
        # Round 1 anti-joined the whole nxt against the whole seen set —
        # at 10^10 URLs that sort-merge shuffles the entire seen set every
        # wave (ADVICE r1).  Split by provenance instead:
        #  (a) leftover already satisfies the pruned-frontier invariant
        #      w.r.t. seen-as-of-last-wave, so only THIS wave's delta can
        #      newly match it — anti-join against the wave-bounded delta;
        #  (b) new discoveries (links + pagination) are wave-bounded, so
        #      the seen set is semi-REDUCED to their key hits first (one
        #      streaming pass over seen, broadcast of wave-sized keys —
        #      the same pattern as dedup_against_seen) and the anti-join
        #      runs against the small hit set.
        # Results are identical to the full anti-join; the wave-side
        # bloom+anti-join remains the correctness gate either way.
        discoveries = child.unionByName(pagination)
        _mark("next_frontier_plan")
        # The prune does NOT wait for the seen/blob checkpoint thread: its
        # seen side is exactly prev-log ∪ this-wave-delta, and both are
        # already in hand as DataFrames (`seen` still binds the previous
        # read_log; delta keys recompute from the persisted `scheduled`).
        # Re-reading the log here forced a join() that charged the whole
        # checkpoint wall (~1.2-1.5 s/wave at BOTH scaling levels, r5b
        # stage decomposition) to this stage; the thread now runs
        # underneath the entire frontier build + write below, and the log
        # re-read (flat base+deltas scan, bounded lineage) plus the blob
        # read-back happen after that write.
        if overlap_frontier:
            # Pipelined tail: wave k's frontier writer is about to be
            # STARTED on a thread and joined only here, one wave later —
            # it runs under the whole of wave k+1's fetch stage.  For that
            # to stay safe and bounded, the frontier plan must be anchored
            # on THIS wave's durable artifacts, never on a previous wave's
            # in-memory plan:
            #  - the last writer is joined now (it had the entire fetch
            #    stage to finish, so this is a no-op in steady state);
            #  - delta keys recompute from the written wave parquet
            #    (extraction passes the canonical url through 1:1, so
            #    xxhash64(url) == the frontier's url_hash; in the
            #    astronomically-rare hash-collision case a key can be
            #    missing here, and the next wave's exact dedup gate — not
            #    this prune, which is an optimization — drops the row);
            #  - the unbudgeted leftover is an empty LITERAL (take_wave's
            #    frontier.limit(0) would chain the previous wave's plan
            #    into this one, growing the logical tree every wave);
            #  - the budgeted leftover rebinds onto the read-back of the
            #    files the last writer just published (value-identical:
            #    same rows, same dedup, same anti-join keys).
            _join_prev_frontier()
            delta_keys = wave_ex.select(
                F.xxhash64("url").alias("url_hash")
            )
            if not leftover_vs_full:
                if wave_budget is None:
                    leftover = spark.createDataFrame([], frontier.schema)
                elif catalog.exists("frontier"):
                    # the taken-wave keys are RECOMPUTED from the read-back
                    # (deterministic: after dedup the (priority, depth,
                    # url_hash) order is strict, so the top-K set is the
                    # one take_wave took) — referencing `wave` here would
                    # chain the previous wave's plan into this one and the
                    # logical tree would grow ~100 KB per wave (measured)
                    _d = dedup_within(catalog.read(spark, "frontier"))
                    _taken = (
                        _d.orderBy(*[F.col(c).asc() for c in ORDER_COLS])
                        .limit(wave_budget)
                        .select("url_hash")
                    )
                    leftover = _d.join(_taken, "url_hash", "left_anti")
        else:
            delta_keys = seen_delta.select("url_hash")
        if leftover_vs_full:
            # one-off: imported-history frontier may overlap prior seen.
            # `seen` (prev log) includes the imported base; this wave's
            # delta ⊆ the wave, which dedup_within/take_wave made
            # url_hash-disjoint from leftover, so prev-log pruning is
            # value-identical to new-log pruning.
            leftover_p = leftover.join(
                seen.select("url_hash"), "url_hash", "left_anti"
            )
            leftover_vs_full = False
        else:
            leftover_p = leftover.join(
                F.broadcast(delta_keys) if bounded_wave else delta_keys,
                "url_hash", "left_anti",
            )
        seen_keys = seen.select("url_hash").unionByName(delta_keys)
        disc_keys = discoveries.select("url_hash")
        hits = seen_keys.join(
            F.broadcast(disc_keys) if bounded_wave else disc_keys,
            "url_hash", "left_semi",
        )
        disc_p = discoveries.join(
            F.broadcast(hits) if bounded_wave else hits,
            "url_hash", "left_anti",
        )
        nxt = leftover_p.unionByName(disc_p)

        _mark("next_frontier_prune_plan")
        host_thread.join()
        if _host_err:
            raise _host_err[0]
        lineage.append(
            {
                "wave": wave_no,
                "frontier_size": n_wave,
                "robots_blocked": n_blocked,
                "dedup_dropped": n_wave - n_blocked - n_fresh,
                "attempted": n_fresh,
                "fetched": n_hit,
                "missed": n_fresh - n_hit,
                "n_hosts": _obs_n(
                    obs_sched, scheduled.select("host").dropDuplicates(),
                    "n_hosts",
                ),
                "hosts": host_metrics,
                "t_ms": t_ms,
            }
        )
        # lineage is an append-log too: ONE row per wave (O(delta), not a
        # growing rewrite), published on a thread that overlaps the
        # frontier write — the two jobs share no inputs
        l = lineage[-1]
        lineage_df = spark.createDataFrame(
            [
                (
                    l["wave"], l["frontier_size"], l["robots_blocked"],
                    l["dedup_dropped"], l["attempted"], l["fetched"],
                    l["missed"],
                )
            ],
            "wave int, frontier_size long, robots_blocked long, "
            "dedup_dropped long, attempted long, fetched long, missed long",
        )
        _lin_err: list = []

        def _write_lineage():
            try:
                catalog.write(
                    lineage_df, "lineage",
                    meta={"wave": wave_no, "kind": "delta"},
                )
            except BaseException as ex:
                _lin_err.append(ex)

        lin_thread = threading.Thread(target=_write_lineage, daemon=True)
        lin_thread.start()
        if overlap_frontier:
            # ---- pipelined frontier write --------------------------------
            # The write (and with it the whole frontier COMPUTE: link
            # explode, pagination expansion, prune joins, parquet encode)
            # runs on a thread that the loop only joins one wave later —
            # i.e. underneath the next wave's fetch/extract/write, the
            # dominant stage.  The next wave plans against the persisted
            # `nxt` directly; its first action races the writer for the
            # cached partitions, and whichever computes a block first
            # feeds the other.  Torn interleavings of the concurrent
            # catalog publishes are exactly what resume's orphan pruning
            # (_resume_point) makes safe.
            nxt = nxt.persist()
            _f_err: list = []
            _f_ms: list = []
            _f_snap_holder: list = []
            _w_no = wave_no

            def _write_frontier():
                try:
                    _t = time.monotonic()
                    _f_snap_holder.append(
                        catalog.write(nxt, "frontier", meta={"wave": _w_no + 1})
                    )
                    _f_ms.append(round((time.monotonic() - _t) * 1000))
                except BaseException as ex:
                    _f_err.append(ex)

            f_thread = threading.Thread(target=_write_frontier, daemon=True)
            f_thread.start()

            # frontier-size UPPER bound for the next wave's broadcast-
            # safety decision (the manifest count is still in flight):
            # leftover bound + raw link mentions + deduped pagination mass.
            n_links = _obs_n(
                obs_hit, wave_ex.select(F.explode("links")), "n_links"
            )
            n_extents = _obs_n(
                obs_hit, wave_ex.filter(_extent_pred), "n_extents"
            )
            pag_ub = 0
            if n_extents > 0:
                # deduped extent mass, mirroring expand_pagination_df's
                # per-(site, category, template, depth, priority) collapse
                # (+1 covers the HDW over-scan quirk).  A tiny agg over the
                # written wave parquet — listing-discovery waves only.
                pag_ub = int(
                    wave_ex.filter(_extent_pred)
                    .groupBy(
                        "site", "category", "url_template", "depth",
                        "priority",
                    )
                    .agg(F.max("last_page").alias("lp"))
                    .agg(
                        F.sum(
                            F.least(
                                F.col("lp") + F.lit(1),
                                F.lit(max_pagination),
                            )
                        ).alias("s")
                    )
                    .first()["s"]
                    or 0
                )
            if wave_budget is None:
                leftover_term = 0
            else:
                base = frontier_ub if frontier_ub is not None else frontier_rows
                leftover_term = (
                    None if base is None else max(0, base - n_wave)
                )
            frontier_ub = (
                None
                if leftover_term is None
                else leftover_term + n_links + pag_ub
            )
            frontier = nxt
            frontier_rows = None
            lin_thread.join()
            if _lin_err:
                raise _lin_err[0]
            seen_thread.join()
            if _seen_err:
                raise _seen_err[0]
            seen = catalog.read_log(spark, "seen")
            if blobs is not None:
                blobs = catalog.read(spark, "blobs")
            if n_wave == 0:
                # degenerate trailing wave (nonzero upper bound over an
                # exhausted frontier): its published deltas are empty; the
                # writer's manifest proves the next frontier empty too, so
                # the top of the loop stops without another wave
                _f_prev = {
                    "thread": f_thread, "err": _f_err, "ms": _f_ms,
                    "pins": [],
                }
                _join_prev_frontier()
                frontier_rows = (
                    _f_snap_holder[0].rows if _f_snap_holder else 0
                )
            else:
                _f_prev = {
                    "thread": f_thread, "err": _f_err, "ms": _f_ms,
                    "pins": [],
                }
            _mark("next_frontier")
            if _prev_nxt is not None:
                _prev_nxt.unpersist()
            _prev_nxt = nxt
            scheduled.unpersist()
            wave.unpersist()
        else:
            f_snap = catalog.write(nxt, "frontier", meta={"wave": wave_no + 1})
            frontier_rows = f_snap.rows
            frontier = catalog.read(spark, "frontier")
            lin_thread.join()
            if _lin_err:
                raise _lin_err[0]
            # the seen log (and standing blobs) must be current before the
            # NEXT wave's dedup gate / first-crossing blob build read them —
            # awaited here, after the frontier write the thread overlapped
            seen_thread.join()
            if _seen_err:
                raise _seen_err[0]
            seen = catalog.read_log(spark, "seen")
            if blobs is not None:
                blobs = catalog.read(spark, "blobs")
            _mark("next_frontier")

            scheduled.unpersist()
            wave.unpersist()
        wave_no += 1

    # land the last wave's in-flight frontier writer (pipelined tail) —
    # the catalog must be complete, and its errors must surface, before
    # the result is handed back
    t_ms = {}
    _join_prev_frontier()
    if _prev_nxt is not None:
        _prev_nxt.unpersist()

    extracted_all = (
        catalog.read_union(spark, "extracted")
        if catalog.exists("extracted")
        else spark.createDataFrame([], CRAWL_EXTRACT_SCHEMA)
    )
    return CrawlResult(
        extracted=extracted_all, seen=seen, lineage=lineage, waves=wave_no
    )


def resume_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    catalog: Catalog,
    **kw,
) -> CrawlResult:
    """Resume a killed crawl from its last published wave checkpoint.

    The catalog's atomic manifest publish means a crash mid-wave leaves the
    previous wave's snapshots authoritative; we restart from the latest
    COMPLETE wave, replaying nothing that was fully published.

    A wave k is complete iff its extracted, seen and lineage deltas AND the
    wave-(k+1) frontier snapshot all landed — each is a separate manifest
    commit (some on overlapped threads), so a kill can land between them.
    Any snapshot from a torn wave is an orphan: replaying that wave after
    resume would re-publish the same rows and the append-log readers would
    double-count them.  ``_resume_point`` walks the manifests (driver-side,
    no Spark job) for the latest complete wave; everything at or after it
    is pruned before the replay starts."""
    start_wave = _resume_point(catalog)
    for t in ("extracted", "seen", "lineage", "blobs"):
        catalog.prune_waves(t, start_wave)
    # frontier snapshots with meta wave > start_wave are torn-wave orphans
    # too (the resume input is the one WITH meta wave == start_wave)
    catalog.prune_waves("frontier", start_wave + 1)
    if not catalog.exists("frontier"):
        # nothing published yet, or a crash during wave 0 before its first
        # frontier landed (whose delta orphans the prune above removed):
        # restart as a fresh run
        return run_crawl(spark, pages, seeds, robots, catalog, **kw)
    f_snap = catalog.latest("frontier")
    if int(f_snap.meta.get("wave", 0)) != start_wave:
        # degenerate catalog (e.g. stale pre-compaction frontier snapshots
        # only): restart from whatever frontier actually survives and
        # re-prune the delta logs to that point so the replay cannot
        # double-publish
        start_wave = int(f_snap.meta.get("wave", 0))
        for t in ("extracted", "seen", "lineage", "blobs"):
            catalog.prune_waves(t, start_wave)
    frontier = catalog.read(spark, "frontier")
    seen = (
        catalog.read_log(spark, "seen")
        if catalog.exists("seen")
        else None
    )
    lineage = []
    if catalog.exists("lineage"):
        # append-log: one row per wave since round 3; dropDuplicates keeps
        # resume working over catalogs written by the old full-rewrite form
        lineage = [
            r.asDict()
            for r in catalog.read_union(spark, "lineage")
            .dropDuplicates(["wave"])
            .orderBy("wave")
            .collect()
        ]
    return run_crawl(
        spark, pages, seeds, robots, catalog,
        start_wave=start_wave, frontier=frontier, seen=seen, lineage=lineage,
        **kw,
    )


def _resume_point(catalog: Catalog) -> int:
    """Latest wave the crawl can deterministically restart FROM.

    Walks down from the newest published frontier snapshot until every
    earlier wave's delta set (extracted + seen + lineage) is complete.
    Publishes happen in wave order, so the walk terminates within the
    1-2 torn waves a single crash can leave; blobs are excluded from the
    completeness test because they are only written once the seen set
    crosses the bloom gate (stale blob bits are harmless either way — the
    exact-seen backstop corrects bloom false positives)."""

    def _delta_waves(name: str) -> set[int]:
        return {
            int(s.meta["wave"])
            for s in catalog.snapshots(name)
            if "wave" in s.meta and s.meta.get("kind") != "base"
        }

    frontier_waves = {
        int(s.meta.get("wave", 0)) for s in catalog.snapshots("frontier")
    }
    complete = (
        _delta_waves("extracted")
        & _delta_waves("seen")
        & _delta_waves("lineage")
    )
    # the crawl's first wave: 0, unless a seen base/compact marker (written
    # with wave = first - 1 by imported-history and recrawl-invalidation
    # runs) raises the floor — waves below it belong to a compacted past
    first_wave = max(
        (
            int(s.meta["wave"]) + 1
            for s in catalog.snapshots("seen")
            if s.meta.get("kind") in ("base", "compact") and "wave" in s.meta
        ),
        default=0,
    )
    start = max(frontier_waves, default=0)
    while start > first_wave and (start - 1) not in complete:
        start -= 1
    # the frontier snapshot feeding `start` must itself exist; if the walk
    # landed on a wave whose input frontier never published (possible only
    # when start == the run's first wave), the caller falls back to a
    # fresh run after pruning
    while start > first_wave and start not in frontier_waves:
        start -= 1
    return start


def _site_col(host):
    c = F.lower(host)
    expr = F.lit("unknown")
    for s in ("cimanow", "wecima", "hdw", "akwam", "fasel"):
        expr = F.when(c.contains(s), F.lit(s)).otherwise(expr)
    return expr
