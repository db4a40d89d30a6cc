"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship text-pipeline query on sf0.001.
``queries()`` — one entry per implemented operator family from SURVEY.md §2
(reference operators O4-O24 re-expressed over the driver's testdata tables)
plus the training-data operators (dedup family, ANN, text stats, multimodal
plumbing).  ``oracle_sql()`` — DuckDB-equivalent ANSI SQL for every query
whose semantics are SQL-expressible; xxhash64-based operators (minhash,
simhash, LSH cells, fingerprints) and the crawl e2e run are rows-only.

Column names and types are aligned pairwise between the Spark plan and the
oracle SQL (aggregates go through exact decimal casts so the doubles match
bit-for-bit; float-derived values are rounded on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec_sum(col, scale: int = 2):
    """Order-insensitive exact sum of a double column → double.

    Summing doubles is order-dependent (Spark and DuckDB would disagree in
    the last ulps); routing through decimal makes the aggregate exact and
    engine-independent, then one exact cast back to double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: text-quality pipeline over sf0.001 documents.

    Exercises the columnar text-analysis family (SURVEY.md §2 training-data
    ops): tokenization, language id, quality scoring — then a per-language
    rollup.  Everything stays in whole-stage codegen."""
    from no_fasel_scrapers_spark.operators.textstats import with_text_stats

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    stats = with_text_stats(docs)
    return (
        stats.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_tokens_ws").cast("long")).alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            F.count(F.when(F.col("lang_detected") == "en", 1)).alias(
                "n_detected_en"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# relational / reference-operator queries (each cites its SURVEY.md §2 row)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape — partial-agg groupBy (map-side combine, one shuffle)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity")).alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_revenue_by_nation(spark, sf_dir):
    """3-table join: fact⋈fact shuffle join + broadcast dim (nation)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            _dec_sum(F.col("o_totalprice")).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def q_top_orders_per_customer(spark, sf_dir):
    """Window precedence dedup — O20/O14 'first match wins' analog."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


def q_customers_without_orders(spark, sf_dir):
    """left_anti incremental-dedup shape — O10 (SURVEY.md §2)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


def q_union_precedence_old_wins(spark, sf_dir):
    """O14: `new | old` (old wins) via explicit source-rank window."""
    from no_fasel_scrapers_spark.operators.merge import union_with_precedence

    o = _t(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.lit("old").alias("src"), "o_totalprice"
    )
    new = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", F.lit("new").alias("src"), "o_totalprice"
    )
    return union_with_precedence(old, new, "o_orderkey", old_wins=True)


def q_episode_delta(spark, sf_dir):
    """O11 incremental tail-only recompute: stored count vs current count."""
    from no_fasel_scrapers_spark.operators.merge import episode_delta

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    old_counts = o.select(
        F.col("o_orderkey").alias("series_id"),
        (F.col("o_orderkey") % 4).alias("episode_count"),
    )
    current = li.groupBy(F.col("l_orderkey").alias("series_id")).agg(
        F.count("*").alias("episodes_total")
    )
    return episode_delta(old_counts, current, key="series_id").select(
        "series_id", "episodes_total", "old_count", "needs_update"
    )


def q_nested_assembly(spark, sf_dir):
    """O12 nested assembly: child rows → deterministic per-parent string."""
    li = _t(spark, sf_dir, "lineitem")
    items = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("ln"),
                F.col("l_quantity").cast("int").alias("q"),
            )
        )
    )
    return li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_episodes"),
        F.array_join(
            F.transform(
                items,
                lambda x: F.concat_ws(
                    ":", x["ln"].cast("string"), x["q"].cast("string")
                ),
            ),
            ",",
        ).alias("episodes"),
    )


def q_integrity_manifest(spark, sf_dir):
    """O24 md5 manifest over canonically-ordered group contents."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        ).alias("manifest_md5"),
        F.count("*").alias("n"),
    )


def q_event_type_decode(spark, sf_dir):
    """O9 dict-decode via literal map (broadcast-join-free constant fold)."""
    ev = _t(spark, sf_dir, "events")
    label_map = F.create_map(
        F.lit("view"), F.lit("View"), F.lit("click"), F.lit("Click"),
        F.lit("purchase"), F.lit("Purchase"), F.lit("signup"), F.lit("Signup"),
        F.lit("error"), F.lit("Error"),
    )
    weight_map = F.create_map(
        F.lit("view"), F.lit(1), F.lit("click"), F.lit(2),
        F.lit("purchase"), F.lit(5), F.lit("signup"), F.lit(3),
        F.lit("error"), F.lit(0),
    )
    return (
        ev.withColumn("label", F.element_at(label_map, F.col("event_type")))
        .withColumn("weight", F.element_at(weight_map, F.col("event_type")))
        .groupBy("event_type", "label")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("weight").cast("long")).alias("weight_total"),
        )
    )


def q_url_category(spark, sf_dir):
    """O21 URL-substring category classifier (TrendingScraper.py:74-81)."""
    from no_fasel_scrapers_spark.functions.cleanups import url_category

    d = _t(spark, sf_dir, "documents")
    link = F.concat(
        F.lit("https://w.test/"),
        F.element_at(
            F.array(
                F.lit("%d9%81%d9%8a%d9%84%d9%85/x"),
                F.lit("asian-episodes/x"),
                F.lit("anime-episodes/x"),
                F.lit("show/x"),
            ),
            (F.col("doc_id") % 4).cast("int") + 1,
        ),
    )
    return d.select(
        "doc_id", link.alias("link"), url_category(link).alias("category")
    )


def q_title_cleanups(spark, sf_dir):
    """O8 scalar cleanups: clean_title (Common.py:257-272) +
    clean_iframe_source (Common.py:360-364) as pure columns."""
    from no_fasel_scrapers_spark.functions.cleanups import (
        clean_iframe_source,
        clean_title,
    )

    p = _t(spark, sf_dir, "part")
    raw_title = F.when(
        F.col("p_partkey") % 3 > 0,
        F.concat(
            F.col("p_name"), F.lit(" "),
            (F.lit(2000) + F.col("p_partkey") % 30).cast("string"),
        ),
    ).otherwise(F.concat(F.col("p_name"), F.lit(" part")))
    src = F.when(
        F.col("p_partkey") % 5 == 0, F.lit("https://cdn.test/plain")
    ).otherwise(
        F.concat(
            F.lit("https://cdn.test/embed?id="),
            F.col("p_partkey").cast("string"),
            F.lit("&img="),
            F.col("p_partkey").cast("string"),
        )
    )
    return p.select(
        "p_partkey",
        clean_title(raw_title).alias("title"),
        clean_iframe_source(src).alias("stream"),
    )


def q_normalized_title_join(spark, sf_dir):
    """O20 normalized-key equi-join (the reference's 'fuzzy' match)."""
    from no_fasel_scrapers_spark.functions.cleanups import normalized_title_key

    p = _t(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("pk_a"),
        normalized_title_key(F.col("p_name")).alias("k"),
    )
    b = p.select(
        F.col("p_partkey").alias("pk_b"),
        normalized_title_key(
            F.upper(F.replace(F.col("p_name"), F.lit(" "), F.lit("   ")))
        ).alias("k"),
    )
    return a.join(b, "k").select("pk_a", "pk_b")


def q_rollup_status_priority(spark, sf_dir):
    """Grouping-sets rollup (SURVEY.md §2.2 aggregation checklist): subtotal
    and grand-total rows in one pass — absent in the reference, free in
    Spark; at scale this is one shuffle with partial aggregation."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            _dec_sum(F.col("o_totalprice")).alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias(
                "priority"
            ),
            "n",
            "total",
        )
    )


def q_intersect_keys(spark, sf_dir):
    """Set intersection (§2.2 set-ops checklist; the reference only has
    union-with-precedence and anti-difference)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("k")
    )
    b = li.select(F.col("l_orderkey").alias("k"))
    return a.intersect(b)


def q_sessionize_events(spark, sf_dir):
    """Batch sessionization: 30-min-gap sessions via lag + running sum —
    the batch twin of the streaming session_window path (§2.2 windows)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; session tz is UTC, so ntz→timestamp→long matches
    # DuckDB's epoch() on the same naive values
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return marked.groupBy("user_id").agg(
        F.max("sess_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def q_trending_id_join(spark, sf_dir):
    """O19 trending equi-join by id (TrendingScraper.py:15-50): homepage
    recents ∩ stored catalog, inner join on item id, category tagged."""
    d = _t(spark, sf_dir, "documents")
    stored = d.select(
        F.col("doc_id").alias("item_id"),
        "source",
        F.substring("text", 1, 24).alias("title"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("movies"))
        .otherwise(F.lit("series"))
        .alias("category"),
    )
    recents = d.filter(F.col("doc_id") % 11 == 0).select(
        F.col("doc_id").alias("item_id")
    )
    return recents.join(stored, "item_id").select(
        "item_id", "source", "title", "category"
    )


def q_genre_scrub_prune(spark, sf_dir):
    """O22 genre scrub + prune (Postprocessing.py:36-49,75-87): array
    higher-order filter drops junk entries, all-junk records are pruned."""
    from no_fasel_scrapers_spark.functions.cleanups import scrub_genres

    p = _t(spark, sf_dir, "part")
    raw = F.when(
        F.col("p_partkey") % 13 == 0, F.array(F.lit("100%"), F.lit("/"))
    ).otherwise(
        F.concat(
            F.split(F.col("p_type"), " "), F.array(F.lit("50%"), F.lit("/"))
        )
    )
    out = p.select("p_partkey", scrub_genres(raw).alias("genres"))
    return out.filter(F.size("genres") > 0).select(
        "p_partkey",
        F.array_join("genres", ",").alias("genres_csv"),
        F.size("genres").alias("n_genres"),
    )


def q_all_content_index(spark, sf_dir):
    """O23 union-all indexer (AllContentIndexer.py:8-33): per-category
    tables with missing columns unified, Rating/Genres defaulted."""
    from no_fasel_scrapers_spark.plans.postprocess import all_content_index

    p = _t(spark, sf_dir, "part")
    img = F.concat(F.lit("img/"), F.col("p_partkey").cast("string"))
    flat = p.filter(F.col("p_partkey") % 3 != 0).select(
        F.col("p_partkey").cast("string").alias("item_id"),
        F.col("p_name").alias("title"),
        img.alias("image_source"),
        F.lit("movies").alias("category"),
        F.when(
            F.col("p_partkey") % 5 != 0,
            (F.col("p_partkey") % 10).cast("string"),
        ).alias("rating"),
        F.when(F.col("p_partkey") % 7 != 0, F.split("p_type", " ")).alias(
            "genres"
        ),
    )
    series = p.filter(F.col("p_partkey") % 3 == 0).select(
        F.col("p_partkey").cast("string").alias("series_id"),
        F.col("p_name").alias("title"),
        img.alias("image_source"),
        F.lit("series").alias("category"),
        F.when(F.col("p_partkey") % 2 == 0, F.split("p_type", " ")).alias(
            "genres"
        ),
    )
    out = all_content_index(flat, series)
    return out.select(
        "key", "title", "image_source", "category", "rating",
        F.array_join("genres", "|").alias("genres_s"),
    )


def q_pagination_expand(spark, sf_dir):
    """O4/O5 pagination extent → distributed page-range frontier rows."""
    from no_fasel_scrapers_spark.operators.frontier import expand_pagination

    n = _t(spark, sf_dir, "nation")
    probes = [
        {
            "site": f"n{r.n_nationkey}",
            "category": "cat",
            "url_template": f"https://n{r.n_nationkey}.test/cat/page/{{p}}",
            "last_page": r.n_nationkey % 5 + 1,
            "depth": 0,
            "priority": 0,
        }
        for r in n.select("n_nationkey").collect()
    ]
    out = expand_pagination(spark, probes)
    return out.select("url", "site", "depth", "priority")


def q_frontier_take_wave(spark, sf_dir):
    """Frontier wave materialization: ORDER BY (priority, depth, key) LIMIT
    budget → TakeOrderedAndProject, leftover = left_anti (north_rule)."""
    from no_fasel_scrapers_spark.operators.frontier import take_wave

    ev = _t(spark, sf_dir, "events")
    frontier = ev.select(
        F.col("event_id").alias("url_hash"),
        (F.col("event_id") % 5).cast("int").alias("priority"),
        (F.col("user_id") % 3).cast("int").alias("depth"),
        "event_type",
    )
    wave, _leftover = take_wave(frontier, 500)
    return wave.select("url_hash", "priority", "depth", "event_type")


def q_robots_gate(spark, sf_dir):
    """north_rule robots gating, full RFC 9309 path (round 5): raw robots
    bodies → parse_robots_txt (compiled Allow/Disallow regex rules) →
    apply_robots longest-match-wins gate, all broadcast ⋈ frontier.

    The synthetic bodies exercise every precedence case: a longer Allow
    overriding a Disallow (/d/1 vs /d/1/), a trailing-$ wildcard rule
    (/*4$ blocks every path on host h4 — all its doc_ids end in 4), and
    an equal-length tie (none here; tie→allow is pinned in pytest).  The
    oracle derives allowed doc_ids analytically from the generation rule
    — an independent check, not a parser mirror."""
    from no_fasel_scrapers_spark.operators.robots import apply_robots
    from no_fasel_scrapers_spark.operators.robots_parse import (
        parse_robots_txt,
    )

    d = _t(spark, sf_dir, "documents")
    frontier = d.select(
        "doc_id",
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
            F.lit(".test/d/"), (F.col("doc_id") % 7).cast("string"),
            F.lit("/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("h"), (F.col("doc_id") % 10).cast("string"), F.lit(".test")
        ).alias("host"),
    )
    bodies = spark.createDataFrame(
        [
            (
                f"h{k}.test",
                "User-agent: *\nDisallow: /d/0\nDisallow: /d/1\n"
                "Allow: /d/1/\nDisallow: /*4$\n"
                if k % 2 == 0
                else "User-agent: *\nDisallow: /d/2\n",
            )
            for k in range(10)
        ],
        "host string, robots_txt string",
    )
    robots = parse_robots_txt(bodies)
    allowed, _blocked = apply_robots(frontier, robots)
    return allowed.select("doc_id", "host")


def q_politeness_schedule(spark, sf_dir):
    """north_rule per-host token-bucket schedule as a partitioned window."""
    from no_fasel_scrapers_spark.operators.politeness import schedule_fetches

    ev = _t(spark, sf_dir, "events")
    wave = ev.select(
        F.concat(
            F.lit("h"), (F.col("user_id") % 20).cast("string"), F.lit(".test")
        ).alias("host"),
        F.lit(0).cast("int").alias("host_salt"),
        F.col("event_id").alias("url_hash"),
        (F.col("event_id") % 5).cast("int").alias("priority"),
        (F.col("event_id") % 3).cast("int").alias("depth"),
    )
    robots = spark.range(20).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test")).alias(
            "host"
        ),
        ((F.col("id") + 1) * 10).alias("crawl_delay_ms"),
    )
    out = schedule_fetches(wave, robots, n_salts=1)
    return out.select("url_hash", "host", "fetch_seq", "scheduled_ms")


def q_seen_filter_dedup(spark, sf_dir):
    """O10 at scale: bloom pre-filter + exact left_anti backstop must equal
    the plain anti-join (zero false drops — the correctness contract)."""
    from no_fasel_scrapers_spark.operators.seen_filter import (
        build_filter_blobs,
        dedup_against_seen,
    )

    ev = _t(spark, sf_dir, "events")
    cand = ev.select(
        "event_id",
        F.xxhash64(
            F.concat(F.lit("https://e.test/"), F.col("event_id").cast("string"))
        ).alias("url_hash"),
    )
    seen = cand.filter(F.col("event_id") % 3 == 0).select("url_hash")
    blobs = build_filter_blobs(seen, n_shards=16)
    return dedup_against_seen(cand, seen, blobs, n_shards=16).select("event_id")


def q_url_canonicalize(spark, sf_dir):
    """URL canonicalization — the key everything hashes off (SURVEY §7.1-1)."""
    from no_fasel_scrapers_spark.functions.canonical import (
        canonicalize_url,
        url_host,
    )

    d = _t(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("HTTP://User:pw@WWW.Site"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".TEST:80//a//b/"), F.col("doc_id").cast("string"),
        F.lit("/?utm_source=x&b="), (F.col("doc_id") % 5).cast("string"),
        F.lit("&a=1&ref=z#frag"),
    )
    return d.select(
        "doc_id",
        canonicalize_url(messy).alias("canonical"),
        url_host(messy).alias("host"),
    )


# ---------------------------------------------------------------------------
# training-data operators
# ---------------------------------------------------------------------------

def q_asof_join(spark, sf_dir):
    """As-of join (temporal op absent in both the reference and Spark
    built-ins): every view event + the latest purchase at-or-before it per
    user — one window shuffle, DuckDB ASOF JOIN as the oracle."""
    from no_fasel_scrapers_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(views, purchases, on="user_id", ts="ts")
    return out.select(
        "user_id",
        "event_id",
        F.round("purchase_value", 6).alias("purchase_value"),
        F.date_format("__asof_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "purchase_ts"
        ),
    )


def q_robots_parse(spark, sf_dir):
    """robots.txt parsing as pure columns (windows resolve the stateful
    group grammar), incl. Allow directives and the precompiled RFC 9309
    wildcard regexes (round 5).  The oracle computes the expected parse —
    prefixes, allows AND the compiled regex strings — analytically from
    the synthetic bodies' generation rule: an independent check, not a
    SQL mirror of the parser."""
    from no_fasel_scrapers_spark.operators.robots_parse import (
        parse_robots_txt,
    )

    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    ks = k.cast("string")
    body = (
        F.when(
            k % 3 == 0,
            F.concat(
                F.lit("User-agent: *\nDisallow: /a/\nAllow: /a/open/\n"
                      "Disallow: /b"), ks,
                F.lit("/\nDisallow: /*.zip$\nCrawl-delay: "),
                (k % 5).cast("string"),
                F.lit("\n"),
            ),
        )
        .when(
            k % 3 == 1,
            F.concat(
                F.lit("User-agent: mybot\nDisallow: /mb"), ks,
                F.lit("/\nAllow: /mb"), ks,
                F.lit("/ok$\n\nUser-agent: *\nDisallow: /all/\n"),
            ),
        )
        .otherwise(F.lit("# open\nUser-agent: *\nDisallow:\n"))
    )
    bodies = n.select(
        F.concat(F.lit("n"), ks, F.lit(".test")).alias("host"),
        body.alias("robots_txt"),
    )
    out = parse_robots_txt(bodies, agent="mybot")
    return out.select(
        "host",
        F.array_join("disallow_prefixes", ",").alias("prefixes_csv"),
        F.array_join("allow_patterns", ",").alias("allows_csv"),
        F.array_join(
            F.transform(F.col("rules"), lambda r: r["rx"]), ","
        ).alias("regexes_csv"),
        "crawl_delay_ms",
    )


def q_sitemap_parse(spark, sf_dir):
    """Sitemap parsing as pure columns: urlset entries + nested index locs
    (kind='sitemap' rows recurse as ordinary frontier waves).  Analytic
    oracle regenerates the expected rows from the bodies' formula."""
    from no_fasel_scrapers_spark.operators.sitemap import parse_sitemaps

    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    ks = k.cast("string")
    url_entries = F.array_join(
        F.transform(
            F.sequence(F.lit(1), (k % 4 + 1).cast("int")),
            lambda i: F.concat(
                F.lit("<url><loc>https://n"), ks, F.lit(".test/p"),
                i.cast("string"), F.lit("</loc>"),
                F.when(
                    i % 2 == 1,
                    F.concat(
                        F.lit("<lastmod>2024-01-0"), i.cast("string"),
                        F.lit("</lastmod>"),
                    ),
                ).otherwise(F.lit("")),
                F.lit("</url>"),
            ),
        ),
        "",
    )
    body = F.when(
        k % 5 == 0,
        F.concat(
            F.lit("<sitemapindex><sitemap><loc>https://n"), ks,
            F.lit(".test/sm1.xml</loc></sitemap></sitemapindex>"),
        ),
    ).otherwise(
        F.concat(F.lit("<urlset>"), url_entries, F.lit("</urlset>"))
    )
    bodies = n.select(
        F.concat(F.lit("n"), ks, F.lit(".test")).alias("host"),
        body.alias("sitemap_xml"),
    )
    return parse_sitemaps(bodies).select(
        "host", "kind", "url", "lastmod"
    )


# Capstone probe docs (round 4: the prep pipeline now gates on repetition
# and strips corpus-level boilerplate, so each new stage needs rows that
# exercise it — the driver corpus is healthy single-line text).  All are
# stopword-rich English so they clear the text gate; doc 9300004 is pure
# repeated-word spam (top_word_frac 1.0 → repetition gate drops it);
# 9300001-03 share a boilerplate line in 3 > max_docs docs (stripped
# everywhere) plus a pair line in exactly 2 (kept); 9300006/07 are exact
# duplicates that survive both gates (exact dedup keeps the lower id).
_PREP_BOILER = "follow the blog and subscribe to it for more of the good stuff"
_PREP_PAIR = "this is the part that appears in just the two of these docs"
_PREP_PROBE_ROWS = [
    (9300001, _PREP_BOILER + "\nthe story of the fox and the dog is a fine one\n" + _PREP_PAIR),
    (9300002, _PREP_BOILER + "\nthe tale of the cat and the bird is a good one\n" + _PREP_PAIR),
    (9300003, _PREP_BOILER + "\nthe song of the owl and the hen is an odd one"),
    (9300004, "the " * 40 + "the"),
    (9300006, "the report on the state of the art is due by the end of it"),
    (9300007, "the report on the state of the art is due by the end of it"),
]


def _prep_probe_sql() -> str:
    def lit(t: str) -> str:
        return " || chr(10) || ".join(
            "'" + p.replace("'", "''") + "'" for p in t.split("\n")
        )

    return "SELECT * FROM (VALUES " + ", ".join(
        f"(CAST({i} AS BIGINT), {lit(t)})" for i, t in _PREP_PROBE_ROWS
    ) + ") AS probe(doc_id, text)"


def q_training_prep(spark, sf_dir):
    """Capstone training-data prep pipeline, oracle-checked end to end:
    text quality/lang gate → repetition gate (Gopher-family signals) →
    corpus-level boilerplate line dedup (CCNet-family) → exact dedup →
    fixed-window chunking.  All stages are the engine's own operators
    chained; the oracle SQL mirrors every stage, so the per-chunk md5s
    pin the whole pipeline at value level (VERDICT r3 #5)."""
    from no_fasel_scrapers_spark.operators.chunking import chunk_documents
    from no_fasel_scrapers_spark.operators.dedup import exact_dedup
    from no_fasel_scrapers_spark.operators.quality import (
        line_dedup,
        with_repetition_stats,
    )
    from no_fasel_scrapers_spark.operators.textstats import with_text_stats

    d = _docs_with_probes(spark, sf_dir).unionByName(
        spark.createDataFrame(_PREP_PROBE_ROWS, "doc_id long, text string")
    )
    stats = with_text_stats(d)
    kept = stats.filter(
        (F.col("lang_detected") == "en") & (F.col("quality") >= 0.55)
    ).select("doc_id", "text")
    # Gopher-style repetition gate: drop dominated-by-one-word spam and
    # heavily self-repeating docs (corpus p99 at sf0.01: top_word 0.231,
    # dup_2gram 0.106 — the thresholds keep real docs, kill the probe)
    rep = with_repetition_stats(kept)
    gated = rep.filter(
        (F.col("top_word_frac") <= 0.35) & (F.col("dup_2gram_frac") <= 0.2)
    ).select("doc_id", "text")
    # corpus-level boilerplate strip BEFORE dedup/chunking (CCNet order)
    lded = line_dedup(gated, max_docs=2).select("doc_id", "text")
    ded = exact_dedup(lded, text_col="text", id_col="doc_id")
    chunks = chunk_documents(ded, size=48, stride=48)
    return chunks.select(
        "doc_id", "chunk_id", "n_tokens",
        F.md5("chunk_text").alias("chunk_md5"),
    )


def q_range_join(spark, sf_dir):
    """Range (point-in-interval) join via bucket decomposition — one hash
    shuffle instead of the nested-loop plan Catalyst picks for BETWEEN
    join conditions; DuckDB's IEJoin is the oracle."""
    from no_fasel_scrapers_spark.operators.rangejoin import range_join

    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    pts = c.select(
        F.col("c_nationkey").alias("nk"), "c_custkey", "c_acctbal"
    )
    ivs = s.select(
        F.col("s_nationkey").alias("nk"),
        "s_suppkey",
        F.col("s_acctbal").alias("lo"),
        (F.col("s_acctbal") + 500.0).alias("hi"),
    )
    out = range_join(
        pts, ivs, on="nk", point_col="c_acctbal", lo_col="lo",
        hi_col="hi", bucket_size=500.0,
    )
    return out.select("nk", "c_custkey", "s_suppkey", "c_acctbal", "lo")


def q_chunk_documents(spark, sf_dir):
    """Document chunking (training-data op): 32-token windows, stride 16 —
    pure columns (split → sequence → posexplode → slice), zero shuffle."""
    from no_fasel_scrapers_spark.operators.chunking import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, size=32, stride=16)


def q_exact_dedup(spark, sf_dir):
    """Exact dedup: hash-groupBy, lowest-id survivor (training-data op)."""
    from no_fasel_scrapers_spark.operators.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.substring("text", 1, 16).alias("prefix")
    )
    return exact_dedup(d, text_col="prefix", id_col="doc_id")


# Script-detection probe rows (ADVICE r1): the driver documents corpus is
# pure ASCII, so without these neither the engine's 'ar' branch nor its
# 'zh' branch is ever exercised by the oracle compare — the oracles could
# silently diverge on exactly the corpora this engine targets.  One shared
# constant feeds BOTH the Spark input (createDataFrame) and the DuckDB
# oracle (VALUES), so the two sides cannot drift.
_SCRIPT_PROBE_ROWS = [
    (9000001, "مرحبا بالعالم الجميل اليوم مرحبا"),    # Arabic-only → ar
    (9000002, "你好 世界 今天 天气 很好 世界"),           # Han-only → zh
    (9000003, "مرحبا hello مرحبا العالم"),             # ar ≥ latin → ar
    (9000004, "the cat 你好 and the dog is on it"),    # han < latin → en
    (9000005, "xyzzy plugh قط abcd"),                  # ar < latin → latin-other
    (9000006, "٣٤٥ ٦٧٨"),                              # Arabic-Indic digits → ar
    (9000007, "你好 مرحبا"),                            # ar AND han: ar wins (branch order)
    (9000008, "the cat sat\n"),       # trailing newline: 3 tokens, not
                                      # 3 + a phantom '' (ws_tokens fix)
    (9000009, "a\x0bb the fox on"),   # \x0b IS whitespace in Java \s but
                                      # NOT in RE2 \s — oracle uses the
                                      # explicit class so both split it
]

_SCRIPT_PROBE_SQL = "SELECT * FROM (VALUES " + ", ".join(
    f"(CAST({i} AS BIGINT), '{t}')" for i, t in _SCRIPT_PROBE_ROWS
) + ") AS probe(doc_id, text)"

_DOCS_WITH_PROBES_SQL = (
    "SELECT doc_id, text FROM documents UNION ALL " + _SCRIPT_PROBE_SQL
)


def _docs_with_probes(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    probes = spark.createDataFrame(
        _SCRIPT_PROBE_ROWS, "doc_id long, text string"
    )
    return d.unionByName(probes)


def q_text_stats(spark, sf_dir):
    """Token counting, punct/stopword ratios, lang-id, quality — columnar.
    Input = documents ∪ script probes so the ar/zh branches are pinned by
    the oracle compare, not only by unit tests."""
    from no_fasel_scrapers_spark.operators.textstats import with_text_stats

    d = _docs_with_probes(spark, sf_dir)
    return with_text_stats(d).select(
        "doc_id",
        "n_tokens_ws",
        "n_tokens_bpe",
        F.round("punct_ratio", 9).alias("punct_r"),
        F.round("stopword_ratio", 9).alias("stop_r"),
        F.col("lang_detected").alias("lang_detected"),
        F.round("quality", 9).alias("quality_r"),
    )


# Repetition-signal probe rows: the driver corpus is healthy templated
# text, so without these neither the empty/single-word guards nor the
# tie-break rule (max count, then lexicographically smallest) is ever
# exercised by the oracle compare.  One constant feeds both sides.
_REP_PROBE_ROWS = [
    (9100001, ""),                      # empty → n_words 0, NULL tops
    (9100002, "solo"),                  # 1 word → no 2-grams
    (9100003, "b a b a"),               # a/b tie at 2 → 'a' wins
    (9100004, "x x x x"),               # maximal repetition → fracs 1.0
    (9100005, "  padded   spaces  "),   # \s+ split + edge-empty parity
    (9100006, "مرحبا مرحبا hello"),     # unicode binary-sort parity
    (9100007, "\ta b\n"),               # leading tab / trailing newline:
                                        # maximal-run tokens, no '' token
    (9100008, "\t \n"),                 # whitespace-only → n_words 0
    (9100009, None),                    # NULL text counts as empty
    (9100010, "a\x0bb c a"),            # \x0b is Java-\s whitespace but
                                        # not RE2-\s — both sides split it
]

_REP_PROBE_SQL = "SELECT * FROM (VALUES " + ", ".join(
    f"(CAST({i} AS BIGINT), "
    + ("CAST(NULL AS VARCHAR)" if t is None else f"'{t}'") + ")"
    for i, t in _REP_PROBE_ROWS
) + ") AS probe(doc_id, text)"


def q_repetition_stats(spark, sf_dir):
    """Gopher-family repetition quality signals (training-data op): dup
    word/2-gram fractions and most-frequent word/2-gram coverage — all
    narrow array built-ins + a sorted-run-length fold, zero shuffle."""
    from no_fasel_scrapers_spark.operators.quality import (
        with_repetition_stats,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text").unionByName(
        spark.createDataFrame(_REP_PROBE_ROWS, "doc_id long, text string")
    )
    s = with_repetition_stats(d)
    return s.select(
        "doc_id",
        "n_words",
        F.round("dup_word_frac", 9).alias("dup_word_r"),
        "top_word",
        F.round("top_word_frac", 9).alias("top_word_r"),
        F.round("dup_2gram_frac", 9).alias("dup_2gram_r"),
        "top_2gram",
        F.round("top_2gram_frac", 9).alias("top_2gram_r"),
    )


# Multi-line probe docs for corpus-level line dedup: the driver corpus is
# single-line, so these pin the interesting branches — a boilerplate line
# shared by >max_docs docs (removed everywhere), a line shared by exactly
# max_docs (kept), empty/trailing lines (structure, never removed), and a
# doc whose every line is boilerplate (reassembles to '').
_LINE_PROBE_ROWS = [
    (9200001, "subscribe now\nunique alpha\n\nrare line"),
    (9200002, "subscribe now\nunique beta\nrare line"),
    (9200003, "subscribe now\nunique gamma\n"),
    (9200004, "subscribe now"),
    (9200005, None),  # NULL text → survives as '' (never dropped)
    # tab-only separator shared by >max_docs docs: whitespace-only under
    # the FULL class, so it must survive (ADVICE r3 — space-only trim
    # would have removed it)
    (9200006, "\t\nunique delta"),
    (9200007, "\t\nunique epsilon"),
    (9200008, "\t\nunique zeta"),
]


def _line_probe_sql() -> str:
    def lit(t) -> str:
        if t is None:
            return "CAST(NULL AS VARCHAR)"
        return " || chr(10) || ".join(
            "'" + p.replace("'", "''") + "'" for p in t.split("\n")
        )

    return "SELECT * FROM (VALUES " + ", ".join(
        f"(CAST({i} AS BIGINT), {lit(t)})" for i, t in _LINE_PROBE_ROWS
    ) + ") AS probe(doc_id, text)"


def q_line_dedup(spark, sf_dir):
    """CCNet-style corpus-level boilerplate removal (training-data op):
    lines occurring in >2 distinct docs are dropped from every doc; text
    rebuilt in original order.  Big side shuffles once (reassembly); the
    removal set is AQE-broadcast onto the exploded lines."""
    from no_fasel_scrapers_spark.operators.quality import line_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text").unionByName(
        spark.createDataFrame(_LINE_PROBE_ROWS, "doc_id long, text string")
    )
    return line_dedup(d, max_docs=2)


def q_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard on adjacent-id candidate pairs."""
    from no_fasel_scrapers_spark.operators.dedup import jaccard_verify

    d = _t(spark, sf_dir, "documents")
    pairs = d.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    out = jaccard_verify(pairs, d, threshold=0.0)
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r")
    )


def q_events_hourly(spark, sf_dir):
    """Windowed rollup (streaming-analog tumbling window, batch form)."""
    ev = _t(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00")
    return ev.groupBy(F.col("event_type"), hour.alias("hour")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
            "sum_value"
        ),
    )


def q_events_hourly_stream(spark, sf_dir):
    """The SAME hourly rollup as ``events_hourly``, but computed by
    Structured Streaming (streaming/ingest.py): file-source stream over
    the events parquet, watermarked tumbling ``window()`` aggregation,
    availableNow trigger, memory sink.  availableNow processes everything
    present then stops, so the finite result must equal the batch SQL —
    which makes the streaming path itself oracle-checkable (round 1 left
    streaming as the only surface with no oracle).  Complete output mode:
    every window is emitted, matching batch semantics exactly (append
    would hold back windows younger than the final watermark)."""
    import os
    import shutil as _sh
    import tempfile
    import uuid

    from no_fasel_scrapers_spark.streaming.ingest import run_stream_to_sink

    src = tempfile.mkdtemp(prefix="nfs_stream_events_")
    _sh.copy(os.path.join(sf_dir, "events.parquet"), src)
    # watermarks require TIMESTAMP (not NTZ); the session tz is pinned UTC
    # (session.py), so reading the tz-less parquet micros as TIMESTAMP
    # keeps wall-clock values identical to the batch/NTZ path
    ddl = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    ev = spark.readStream.schema(ddl).parquet(src)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            "event_type",
            F.date_format("w.start", "yyyy-MM-dd HH:00").alias("hour"),
            "n",
            "sum_value",
        )
    )
    name = "evstream_" + uuid.uuid4().hex[:8]
    q = run_stream_to_sink(
        agg,
        checkpoint=tempfile.mkdtemp(prefix="nfs_stream_ckpt_"),
        query_name=name,
        output_mode="complete",
    )
    q.awaitTermination()
    return spark.table(name)


# Streaming-dedup probe rows: NULL text (own null-safe group), empty
# text (distinct from NULL), and an exact duplicate pair — written as a
# second parquet file into the stream source dir so the file stream sees
# more than one input file.
_STREAM_DEDUP_PROBE_ROWS = [
    (9400001, None),
    (9400002, ""),
    (9400003, "stream dedup probe text"),
    (9400004, "stream dedup probe text"),
]


def _stream_dedup_probe_sql() -> str:
    parts = []
    for _i, t in _STREAM_DEDUP_PROBE_ROWS:
        if t is None:
            parts.append("(CAST(NULL AS VARCHAR))")
        else:
            parts.append("('" + t.replace("'", "''") + "')")
    return (
        "SELECT * FROM (VALUES " + ", ".join(parts) + ") AS probe(text)"
    )


def q_exact_dedup_stream(spark, sf_dir):
    """Streaming twin of ``exact_dedup`` (streaming/ingest.py): file-source
    stream over the documents parquet + probe file, synthetic event time,
    watermarked ``dropDuplicatesWithinWatermark`` on the text fingerprint,
    availableNow drain to a memory sink.  The drained fingerprint set must
    equal the batch DISTINCT — survivor doc choice is arrival-dependent in
    a stream, so the driver-visible columns are the deterministic ones
    (fingerprint + text length)."""
    import os
    import shutil as _sh
    import tempfile
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from no_fasel_scrapers_spark.streaming.ingest import (
        exact_dedup_stream,
        run_stream_to_sink,
    )

    src = tempfile.mkdtemp(prefix="nfs_stream_docs_")
    _sh.copy(os.path.join(sf_dir, "documents.parquet"), src)
    # probe file written with pyarrow directly: a Spark
    # createDataFrame(local rows)→parquet job measured a flat ~4s on
    # local[32] (LocalTableScan write path), which dominated this query's
    # bench time (BENCH_r04 7.3s) while the stream itself was ~1s
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [r[0] for r in _STREAM_DEDUP_PROBE_ROWS], pa.int64()
                ),
                "text": pa.array(
                    [r[1] for r in _STREAM_DEDUP_PROBE_ROWS], pa.string()
                ),
            }
        ),
        os.path.join(src, "probe.parquet"),
    )
    ddl = "doc_id bigint, text string"
    docs = (
        spark.readStream.schema(ddl).parquet(src)
        # watermark needs an event-time column; documents carry none, so
        # derive one deterministically.  Offset well past epoch 0: the
        # state store's initial watermark is 0, and a row whose event
        # time EQUALS the watermark is judged late and dropped (doc_id 0
        # vanished without the offset)
        .withColumn(
            "ts",
            F.timestamp_seconds(F.pmod("doc_id", F.lit(3600)) + F.lit(86400)),
        )
    )
    ded = exact_dedup_stream(docs)
    name = "dedupstream_" + uuid.uuid4().hex[:8]
    # the state store creates + commits one shard per shuffle partition
    # PER MICRO-BATCH (pinned at stream birth by the fresh checkpoint);
    # at the driver's sf this is pure fixed cost, so size it explicitly.
    # A real deployment sizes this to the cluster (state shards scale
    # with spark.sql.shuffle.partitions — streaming/ingest.py scale note)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = run_stream_to_sink(
            ded,
            checkpoint=tempfile.mkdtemp(prefix="nfs_stream_ckpt_"),
            query_name=name,
            output_mode="append",
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(name)


def q_media_metadata(spark, sf_dir):
    """Multimodal plumbing: binary payload → typed metadata struct.

    Payloads are generated by the deterministic fake codec (the real decode
    is stubbed — no image libs in this container); the oracle recomputes the
    header fields arithmetically, so the full binary round-trip through
    mapInPandas is verified."""
    import pandas as pd

    from no_fasel_scrapers_spark.operators.multimodal import (
        fake_encode,
        with_media_metadata,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")

    def _gen(batches):
        for pdf in batches:
            out = pd.DataFrame({"doc_id": pdf["doc_id"]})
            out["payload"] = [
                fake_encode(
                    16 + int(i) % 16, 8 + int(i) % 8, 1 + int(i) % 3,
                    int(i) % 251,
                )
                for i in pdf["doc_id"]
            ]
            yield out

    media = d.mapInPandas(_gen, schema="doc_id long, payload binary")
    return with_media_metadata(media).select(
        "doc_id", "width", "height", "channels", "n_bytes", "codec"
    )


def q_audio_features(spark, sf_dir):
    """Audio modality: WAV decode + signal features, for real.

    Five of six lanes carry REAL WAV payloads built by the stdlib
    encoders (``operators/wav.py``): PCM16 mono / PCM16 stereo / PCM8
    mono (odd byte counts exercise RIFF word-alignment pad bytes) /
    IEEE float32 (tag 3, documented rint-clip quantization) / IMA ADPCM
    (tag 17, block headers + 4-bit recurrence + fact-chunk clipping of
    the padded final block); the remaining lane is an image payload,
    pinning the NULL contract for non-audio rows.  The oracle twin
    (oracle/analytic.py ``audio_features_rows``) computes features from
    the synthesized SAMPLES directly — through its OWN scalar IMA
    encode/decode mirror for the ADPCM lane — so the engine only matches
    if its RIFF walk + decode reproduces every sample bit-exactly (PCM/
    float quantization are deterministic; the ADPCM lane requires two
    independent implementations of the full spec recurrence to agree)."""
    import numpy as np
    import pandas as pd

    from no_fasel_scrapers_spark.operators.multimodal import fake_encode
    from no_fasel_scrapers_spark.operators.wav import (
        adpcm_encode,
        audio_features,
        wav_encode,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")

    def _payload(i: int) -> bytes:
        lane = i % 6
        seed = i % 251
        if lane == 3:
            return fake_encode(8, 8, 1, seed)  # image bytes: not audio
        if lane == 2:
            n = 64 + i % 255
            u = (
                (
                    np.arange(n, dtype=np.uint32) * np.uint32(2654435761)
                    + np.uint32(seed)
                ) >> 24
            ).astype(np.uint8)
            return wav_encode(u, 8000, bits=8)
        if lane == 4:
            n = 64 + i % 129
            rng = (
                np.arange(n, dtype=np.uint32) * np.uint32(2654435761)
                + np.uint32(seed)
            )
            f = (
                (rng >> 8).astype(np.float64) / float(1 << 23) - 1.0
            ).astype(np.float32)
            return wav_encode(f, 48000, bits=32)
        if lane == 5:
            n = 505 + i % 300  # pads the final block; fact chunk clips
            t = np.arange(n, dtype=np.float64)
            s = (
                8000 * np.sin(t / (16 + seed % 7))
                + 2000 * np.sin(t / (5 + seed % 3))
            ).astype(np.int16)
            return adpcm_encode(s, 8000)
        ch = 2 if lane == 1 else 1
        n = 64 + i % (127 if lane == 1 else 257)
        rng = (
            np.arange(n * ch, dtype=np.uint32) * np.uint32(2654435761)
            + np.uint32(seed)
        )
        s = (
            ((rng >> 8) & np.uint32(0xFFFF))
            .astype(np.uint16).view(np.int16).reshape(n, ch)
        )
        return wav_encode(s, 44100 if lane == 1 else 16000)

    def _gen(batches):
        for pdf in batches:
            out = pd.DataFrame({"doc_id": pdf["doc_id"]})
            out["payload"] = [_payload(int(i)) for i in pdf["doc_id"]]
            yield out

    media = d.mapInPandas(_gen, schema="doc_id long, payload binary")
    return audio_features(media).select(
        "doc_id", "codec", "sample_rate", "channels", "n_frames",
        "duration_ms", F.round("rms", 6).alias("rms_r"), "peak",
        "zero_crossings",
    )


def q_ann_bruteforce(spark, sf_dir):
    """Exact cosine top-k: broadcast query batch, one corpus pass."""
    from no_fasel_scrapers_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    corpus = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
    )
    out = brute_force_topk(corpus, queries, k=10)
    return out.select(
        "query_id", "vec_id", "rank", F.round("cosine", 4).alias("cosine_r")
    )


def q_cosine_pairs_exact(spark, sf_dir):
    """Embedding near-dup, exact path: all-pairs cosine over a bounded slice
    (the LSH-bucketed variant is the scale path, rows-only below)."""
    from no_fasel_scrapers_spark.operators.dedup import cosine_sim

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_sim(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= 0.2)
    )
    return pairs.select("id_a", "id_b", F.round("cosine", 4).alias("cosine_r"))


# ---- xxhash-seeded queries: analytic oracles (oracle/analytic.py) ---------
# DuckDB cannot evaluate Spark's seeded xxhash64 family, so these oracles
# are independent plain-Python/numpy recomputations at the driver's
# correctness scale, rendered as VALUES relations (same pattern as the
# robots_parse/sitemap_parse analytic oracles).

def q_minhash_dedup(spark, sf_dir):
    """MinHash+LSH near-dup dedup (shingle→minhash→band→bucket-join)."""
    from no_fasel_scrapers_spark.operators.dedup import minhash_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return minhash_dedup(d).select("doc_id", "lang")


def q_substring_dedup(spark, sf_dir):
    """ExactSubstr corpus dedup (Lee et al. 2022, training-data op): any
    32-token run occurring twice anywhere in the corpus survives only at
    its minimum (doc_id, pos) occurrence; removal spans union per doc
    before the rebuild.  Output is md5-pinned byte-exact (same convention
    as pii_scrub, keeps the oracle VALUES small).  Independence: the
    engine keys windows by xxhash64 of the joined run, the analytic
    mirror by the exact window string — a keying/collision bug diverges
    instead of being mirrored."""
    from no_fasel_scrapers_spark.operators.dedup import substring_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return substring_dedup(d, width=32).select(
        "doc_id",
        F.md5(F.col("clean_text")).alias("clean_md5"),
        "n_removed",
    )


def q_near_dup_groups(spark, sf_dir):
    """Transitive near-dup group resolution: verified MinHash pairs →
    alternating large-star/small-star connected components (Kiveris et
    al. 2014) → one deterministic survivor per duplicate cluster.

    This is the step ``minhash_dedup`` approximates with a one-level pair
    collapse; chains (A~B~C, A!~C) need the real transitive closure.
    Analytic oracle: plain-Python union-find over the same verified pairs
    (oracle/analytic.py::near_dup_groups_rows)."""
    from no_fasel_scrapers_spark.operators.components import (
        near_dup_groups,
        resolve_survivors,
    )
    from no_fasel_scrapers_spark.operators.dedup import (
        jaccard_verify_hashed,
        lsh_candidate_pairs,
        with_minhash,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = with_minhash(d, "text", 16, 3, keep_gram_hashes=True).select(
        "doc_id", "gram_hashes", "minhash"
    ).persist()
    pairs = jaccard_verify_hashed(
        lsh_candidate_pairs(sigs), sigs, threshold=0.8
    )
    groups = near_dup_groups(d, pairs)
    out = resolve_survivors(d.select("doc_id"), groups)
    return out.select("doc_id", "group_id", "is_survivor")


def q_decontaminate(spark, sf_dir):
    """Train/test n-gram decontamination (operators/corpus.py): test set =
    doc_id % 17 == 0, flag every training doc sharing a word 4-gram with
    any test doc.  The test gram-hash set broadcasts; the training side is
    one narrow pass — no shuffle of the big side.
    Analytic oracle: oracle/analytic.py::decontaminate_rows."""
    from no_fasel_scrapers_spark.operators.corpus import decontaminate

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    test = d.where(F.col("doc_id") % 17 == 0)
    train = d.where(F.col("doc_id") % 17 != 0)
    return decontaminate(train, test, n=4)


def q_sample_stratified(spark, sf_dir):
    """Deterministic per-language hash sampling (operators/corpus.py):
    keep fractions en=0.5 zh=0.25 fr=0.1 (default 0.05) keyed on
    pmod(xxhash64(7, doc_id), 1e6) — reproducible across retries and
    cluster sizes, pure column predicate (pushes into the scan).
    Analytic oracle: oracle/analytic.py::sample_stratified_rows."""
    from no_fasel_scrapers_spark.operators.corpus import sample_stratified
    from no_fasel_scrapers_spark.oracle.analytic import (
        SAMPLE_DEFAULT,
        SAMPLE_FRACTIONS,
        SAMPLE_SEED,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return sample_stratified(
        d, "doc_id", "lang", SAMPLE_FRACTIONS,
        default_fraction=SAMPLE_DEFAULT, seed=SAMPLE_SEED,
    )


def q_vocab_top_terms(spark, sf_dir):
    """Top-100 terms by document frequency (operators/corpus.py): one
    explode + map-side-combined shuffle on term + TakeOrderedAndProject;
    deterministic (doc_freq DESC, term ASC) boundary. DuckDB SQL oracle."""
    from no_fasel_scrapers_spark.operators.corpus import vocab_top_terms

    return vocab_top_terms(_t(spark, sf_dir, "documents"), k=100)


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup: 16-bit chunk blocking + bit_count verify."""
    from no_fasel_scrapers_spark.operators.dedup import (
        simhash_near_pairs,
        with_simhash,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_near_pairs(with_simhash(d), max_hamming=16)


def q_ivf_ann(spark, sf_dir):
    """IVF/LSH-bucketed ANN: deterministic hyperplane cells, multi-probe.
    Analytic oracle (oracle/analytic.py) mirrors cells + probes + exact
    cosine ranking bit-for-bit; recall vs brute force is additionally
    asserted in tests/test_training_ops.py."""
    from no_fasel_scrapers_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    corpus = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
    )
    out = ivf_topk(corpus, queries, k=5, n_planes=6)
    return out.select(
        "query_id", "vec_id", "rank", F.round("cosine", 4).alias("cosine_r")
    )


def q_ivf_recall(spark, sf_dir):
    """Recall@5 CURVE of the IVF multi-probe ANN path vs exact brute
    force, at probe depths 1/2/3 (Hamming radius of cells probed), with
    the scan fraction each depth pays — the pruning/recall dial measured,
    not asserted (VERDICT r1: 'recall unquantified').  Analytic oracle
    recomputes the identical curve in plain Python."""
    import itertools

    from no_fasel_scrapers_spark.operators.similarity import (
        brute_force_topk,
        cell_id,
        ivf_topk,
    )

    k, n_planes, n_queries = 5, 6, 50
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    bf = brute_force_topk(e, queries, k=k).select("query_id", "vec_id")
    bucketed = e.withColumn("cell", cell_id(F.col("embedding"), n_planes))
    qcell = queries.withColumn("qcell", cell_id(F.col("query_vec"), n_planes))
    denom = e.agg(F.count("*").alias("n_corpus"))
    out = None
    for depth in (1, 2, 3):
        masks = [0]
        for d in range(1, depth + 1):
            for bits in itertools.combinations(range(n_planes), d):
                m = 0
                for b in bits:
                    m |= 1 << b
                masks.append(m)
        probes = qcell.select(
            "query_id",
            F.explode(
                F.array(*[F.col("qcell").bitwiseXOR(F.lit(m)) for m in masks])
            ).alias("cell"),
        )
        scanned = bucketed.join(F.broadcast(probes), "cell").agg(
            F.count("*").alias("n_scanned")
        )
        ivf = ivf_topk(
            e, queries, k=k, n_planes=n_planes, probe_depth=depth
        ).select("query_id", "vec_id")
        n_hit = bf.join(ivf, ["query_id", "vec_id"], "left_semi").agg(
            F.count("*").alias("n_hit")
        )
        n_true = bf.agg(F.count("*").alias("n_true"))
        row = (
            n_hit.crossJoin(n_true).crossJoin(scanned).crossJoin(denom)
            .select(
                F.lit(depth).alias("probe_depth"),
                "n_hit",
                "n_true",
                F.round(F.col("n_hit") / F.col("n_true"), 4).alias(
                    "recall_r"
                ),
                F.round(
                    F.col("n_scanned")
                    / (F.col("n_corpus") * F.lit(n_queries)).cast("double"),
                    4,
                ).alias("scan_frac_r"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _with_planted_near_dups(e):
    """embeddings ∪ one deterministic noisy copy per vector.

    The test embeddings carry NO true near-dup pairs (max pairwise cosine
    ≈ 0.51 — the round-1 query searched an empty truth set and returned 0
    rows).  Each copy perturbs every coordinate with seeded xxhash64 noise
    scaled by the vector's RMS; eps steps with vec_id so planted cosines
    span ~[0.8, 1.0).  Pure columns → the analytic oracle regenerates the
    corpus exactly (oracle/analytic.py::_perturbed)."""
    v = F.col("embedding")
    dim_idx = F.sequence(F.lit(0), F.size(v) - 1)
    rms = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
        / F.size(v)
    )
    eps = F.lit(0.3) + (F.col("vec_id") % 8).cast("double") * F.lit(0.13)
    noise = F.transform(
        dim_idx,
        lambda j: F.pmod(
            F.xxhash64(
                F.concat(
                    F.lit("nd:"), F.col("vec_id").cast("string"),
                    F.lit(":"), j.cast("string"),
                )
            ),
            F.lit(2000),
        ).cast("double") / F.lit(1000.0) - F.lit(1.0),
    )
    # NB: the shifted id must NOT be aliased to "vec_id" in the same select
    # that computes the noise — Spark's lateral column alias resolution
    # would rebind the noise expression's vec_id reference to the SHIFTED
    # value (hit in round 2; diverged from the analytic oracle silently).
    planted = e.select(
        (F.col("vec_id") + F.lit(1000000)).alias("__pid"),
        F.zip_with(v, noise, lambda x, n: x + (eps * rms) * n).alias(
            "embedding"
        ),
    ).select(F.col("__pid").alias("vec_id"), "embedding")
    return e.select("vec_id", "embedding").unionByName(planted)


def q_embedding_near_dup_lsh(spark, sf_dir):
    """Cosine near-dup via band-OR amplified hyperplane LSH + exact verify
    over the planted-near-dup corpus (L=10 tables × 6 bits → recall ≈0.95
    at cosine 0.8).  Analytic oracle mirrors the full pipeline."""
    from no_fasel_scrapers_spark.operators.dedup import embedding_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    aug = _with_planted_near_dups(e)
    out = embedding_near_dup_pairs(
        aug, threshold=0.8, bits_per_table=6, n_tables=10
    )
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine_r"))


def q_embedding_near_dup_recall(spark, sf_dir):
    """Measured recall of the LSH near-dup path against the exact all-pairs
    truth on the planted corpus — the round-1 recall defect made visible:
    single-table LSH scores ~0.25 here; the band-OR version ≥0.9 (also
    asserted as a hard floor in tests/test_training_ops.py)."""
    from no_fasel_scrapers_spark.operators.dedup import (
        cosine_sim,
        embedding_near_dup_pairs,
    )

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    aug = _with_planted_near_dups(e)
    found = embedding_near_dup_pairs(
        aug, threshold=0.8, bits_per_table=6, n_tables=10
    )
    a = aug.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = aug.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    truth = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_sim(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= 0.8)
    )
    n_true = truth.agg(F.count("*").alias("n_true"))
    n_found = found.agg(F.count("*").alias("n_found"))
    return n_true.crossJoin(n_found).withColumn(
        "recall_r",
        F.round(
            F.when(F.col("n_true") == 0, F.lit(1.0)).otherwise(
                F.col("n_found") / F.col("n_true").cast("double")
            ),
            4,
        ),
    )


def q_charset_decode(spark, sf_dir):
    """Legacy-encoding ingestion (round 5): charset sniff + decode at the
    html-bytes boundary (functions/charset.py — WHATWG ladder: BOM →
    ≤1024-byte meta prescan → utf-8 default; the same ``decode_html``
    every extractor inherits through ``parse_html``).

    Five deterministic lanes by doc_id % 5 (functions/charset.SYNTH_LANES)
    re-encode each document page as utf-8/meta, windows-1256/meta (label
    normalization), windows-1252 declared as iso-8859-1 (the WHATWG
    superset rule), utf-16-le with BOM plus a LYING utf-16 meta (BOM must
    win), and undeclared utf-8.  The engine sniffs + decodes; ``n_ok``
    counts byte-exact recovery of the encode-roundtrip expectation.

    Scale shape: scan → two narrow Arrow maps (synth, decode) → one
    5-group partial-agg shuffle.  At 100 TB the decode fuses into the
    fetch/extract stage it already lives in — zero extra shuffles.
    Analytic oracle: oracle/analytic.py::charset_decode_rows predicts
    every lane from the lane table + python codecs, never calling the
    sniffing code under test."""
    import pandas as pd

    from no_fasel_scrapers_spark.functions.charset import (
        synth_page,
        with_decoded_html,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def _synth(it):
        for pdf in it:
            out = {"doc_id": [], "payload": [], "expected": []}
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                payload, expected, _, _ = synth_page(int(d), t or "")
                out["doc_id"].append(int(d))
                out["payload"].append(payload)
                out["expected"].append(expected)
            yield pd.DataFrame(out)

    pages = docs.mapInPandas(
        _synth, "doc_id long, payload binary, expected string"
    )
    dec = with_decoded_html(pages, "payload", "decoded")
    return dec.groupBy("charset", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("decoded") == F.col("expected")).cast("long"))
        .alias("n_ok"),
        F.sum(F.length("decoded")).alias("sum_chars"),
    )


def q_doc_fingerprints(spark, sf_dir):
    """Document fingerprinting: whole-doc xxhash64 + shingle winnow."""
    from no_fasel_scrapers_spark.operators.textstats import (
        doc_fingerprint,
        winnow_fingerprint,
    )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        doc_fingerprint(F.col("text")).alias("fingerprint"),
        winnow_fingerprint(F.col("text")).alias("winnow"),
    )


def q_media_features(spark, sf_dir):
    """Multimodal feature extraction: binary → fixed-length array<float>
    (pixel-histogram stand-in for a real embedding; numpy per Arrow batch).

    Every 5th doc carries a REAL PNG payload (stdlib encoder, gray /
    gray+alpha / RGB by doc_id) — the feature path runs the real inflate +
    unfilter decode for those rows, and the oracle's arithmetic pixel twin
    only matches if the PNG roundtrip is bit-exact.  Docs with
    doc_id % 5 == 1 carry a REAL baseline JPEG (operators/jpeg.py): a
    block-constant grayscale image at unit quant, whose 8×8 blocks are
    DC-only with integer DC — encode→decode is bit-exact by construction
    (jpeg.py module docstring), so the arithmetic twin predicts the
    decoded pixels while the engine walks the real marker / Huffman /
    dequant / IDCT path.  Docs with doc_id % 5 == 2 carry a REAL GIF
    (operators/gif.py, round 5 — completes the web-image trio): LZW is
    lossless, so the twin predicts the palette-expanded RGB pixels while
    the engine walks the real descriptor / sub-block / LZW / palette
    path.  Round 5: odd lane-0 docs are PALETTE PNGs (color type 3, the
    identity gray ramp — decoded RGB is each index tripled, same math as
    the GIF twin) and odd lane-2 GIFs store their frame INTERLACED
    (identical pixels, so the twin is unchanged while the four-pass
    reorder runs inside the gate).  Remaining rows use the fake codec."""
    import numpy as np
    import pandas as pd

    from no_fasel_scrapers_spark.operators.gif import gif_encode
    from no_fasel_scrapers_spark.operators.jpeg import jpeg_encode
    from no_fasel_scrapers_spark.operators.multimodal import (
        extract_features,
        fake_encode,
        png_encode,
        png_encode_palette,
        with_media_metadata,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")

    def _payload(i: int) -> bytes:
        seed = i % 251
        if i % 5 == 1:
            w, h = 16 + 8 * (i % 3), 8 + 8 * (i % 2)
            bw, bh = w // 8, h // 8
            vals = (
                (
                    np.arange(bw * bh, dtype=np.uint32)
                    * np.uint32(2654435761)
                    + np.uint32(seed)
                ) >> 24
            ).astype(np.uint8)
            img = np.kron(
                vals.reshape(bh, bw), np.ones((8, 8), dtype=np.uint8)
            ).astype(np.uint8)
            return jpeg_encode(img, quant=1)
        w, h = 16 + i % 16, 8 + i % 8
        if i % 5 == 0:
            if i % 2 == 1:
                # palette sub-lane (round 5): gray indices through the
                # identity 256-gray ramp — decodes to each value tripled,
                # the same convention the GIF twin already predicts
                rng = (
                    np.arange(w * h, dtype=np.uint32)
                    * np.uint32(2654435761)
                    + np.uint32(seed)
                )
                idx = (rng >> 24).astype(np.uint8).reshape(h, w)
                ramp = np.repeat(
                    np.arange(256, dtype=np.uint8), 3
                ).reshape(256, 3)
                return png_encode_palette(idx, ramp)
            c = 1 + i % 3
            n = w * h * c
            rng = (
                np.arange(n, dtype=np.uint32) * np.uint32(2654435761)
                + np.uint32(seed)
            )
            body = (rng >> 24).astype(np.uint8).reshape(h, w, c)
            return png_encode(body)
        if i % 5 == 2:
            rng = (
                np.arange(w * h, dtype=np.uint32) * np.uint32(2654435761)
                + np.uint32(seed)
            )
            # odd docs store the frame interlaced (round 5) — identical
            # pixels, so the oracle is unchanged but the four-pass
            # reorder now runs inside the driver's gate
            return gif_encode(
                (rng >> 24).astype(np.uint8).reshape(h, w),
                interlace=bool(i % 2),
            )
        return fake_encode(w, h, 1, seed)

    def _gen(batches):
        for pdf in batches:
            out = pd.DataFrame({"doc_id": pdf["doc_id"]})
            out["payload"] = [_payload(int(i)) for i in pdf["doc_id"]]
            yield out

    media = d.mapInPandas(_gen, schema="doc_id long, payload binary")
    out = extract_features(with_media_metadata(media))
    return out.select(
        "doc_id",
        "codec",
        "width",
        "height",
        "channels",
        F.size("features").alias("n_bins"),
        F.round(F.element_at("features", 1).cast("double"), 6).alias("f0"),
    )


def q_video_frames(spark, sf_dir):
    """Video frame-sampling through a REAL container (round 5): per-doc
    MJPEG-in-AVI payloads (operators/avi.py — RIFF walk, ``00dc`` frames
    through the stdlib JPEG codec) explode via ``sample_frames`` into one
    row per sampled frame, each a standalone PNG, then the emitted PNGs
    run the metadata + histogram-feature path.

    Lanes: doc_id % 11 == 0 carries a NULL payload (row disappears);
    doc_id % 4 == 3 carries the NFSV fake container (pins that path
    in-registry too); everything else is a real AVI whose frames are
    block-constant gray at unit quant — the DC-only bit-exact argument
    (operators/jpeg.py), so the analytic twin predicts the decoded
    pixels while the engine walks RIFF → Huffman/IDCT → PNG encode →
    PNG decode → histogram.  The oracle derives every output column
    (frame_idx, ts_ms from the container fps, metadata, f0) from the
    generation rule alone — no container/codec code on the oracle side."""
    import numpy as np
    import pandas as pd

    from no_fasel_scrapers_spark.operators.avi import avi_encode
    from no_fasel_scrapers_spark.operators.multimodal import (
        extract_features,
        fake_video_encode,
        sample_frames,
        with_media_metadata,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")

    def _payload(i: int) -> bytes | None:
        if i % 11 == 0:
            return None
        fps = 5 + i % 5
        n_frames = 2 + i % 3
        if i % 4 == 3:
            return fake_video_encode(
                12, 6, 1, n_frames=n_frames, seed=i % 251, fps=fps
            )
        w, h = 16 + 8 * (i % 3), 8 + 8 * (i % 2)
        frames = []
        for f in range(n_frames):
            nb = (w // 8) * (h // 8)
            vals = (
                (
                    np.arange(nb, dtype=np.uint32) * np.uint32(2654435761)
                    + np.uint32((i + 17 * f) % 251)
                ) >> 24
            ).astype(np.uint8)
            frames.append(
                np.kron(
                    vals.reshape(h // 8, w // 8),
                    np.ones((8, 8), dtype=np.uint8),
                ).astype(np.uint8)
            )
        return avi_encode(frames, fps=fps)

    def _gen(batches):
        for pdf in batches:
            out = pd.DataFrame({"doc_id": pdf["doc_id"]})
            out["payload"] = [_payload(int(i)) for i in pdf["doc_id"]]
            yield out

    media = d.mapInPandas(_gen, schema="doc_id long, payload binary")
    frames = sample_frames(media, stride=2).drop("payload")
    out = extract_features(
        with_media_metadata(frames, payload_col="frame"),
        payload_col="frame",
    )
    return out.select(
        "doc_id",
        "frame_idx",
        "ts_ms",
        "codec",
        "width",
        "height",
        "channels",
        F.size("features").alias("n_bins"),
        F.round(F.element_at("features", 1).cast("double"), 6).alias("f0"),
    )


def q_anime_delta(spark, sf_dir):
    """Anime episode-list incremental merge (FaselAnimeScraper.py:112-124
    semantics, operators/merge.anime_episode_delta): unchanged series pass
    their stored episodes through untouched; changed/new series append only
    the slice past the stored count, and the stored count grows by the
    number of appended episodes.  Modeled on lineitem (current episode
    lists) + a derived prior table; the oracle recomputes the merge in
    SQL."""
    from pyspark.sql.window import Window

    from no_fasel_scrapers_spark.operators.merge import anime_episode_delta

    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("k").orderBy("l_linenumber")
    cur = li.select(F.col("l_orderkey").alias("k"), "l_linenumber").withColumn(
        "num", F.row_number().over(w).cast("int")
    )
    ks = F.col("k").cast("string")
    cur_entries = cur.select(
        ks.alias("series_id"),
        F.concat(F.lit("e"), ks, F.lit("x"), F.col("num").cast("string")).alias("eid"),
        "num",
        F.concat(F.lit("src"), ks, F.lit("-"), F.col("num").cast("string")).alias("src"),
    )
    keys = (
        li.select(F.col("l_orderkey").alias("k"))
        .distinct()
        .filter(F.col("k") % 3 == 0)
    )
    old_n = (F.col("k") % 4).cast("int")
    eps_map = F.map_from_entries(
        F.transform(
            F.when(old_n > 0, F.sequence(F.lit(1), old_n)).otherwise(
                F.array().cast("array<int>")
            ),
            lambda j: F.struct(
                F.concat(
                    F.lit("e"), ks, F.lit("x"), j.cast("string")
                ).alias("key"),
                F.struct(
                    j.cast("int").alias("Episode Number"),
                    F.concat(
                        F.lit("old"), ks, F.lit("-"), j.cast("string")
                    ).alias("Source"),
                ).alias("value"),
            ),
        )
    )
    prior = keys.select(
        ks.alias("series_id"),
        old_n.alias("old_count"),
        F.to_json(eps_map).alias("old_eps_json"),
    )
    out = anime_episode_delta(prior, cur_entries)
    return out.select(
        "series_id", "eid", "num", "src",
        "old_count", "episodes_total", "n_new",
    )


def q_crawl_e2e(spark, sf_dir):
    """The crawl engine end-to-end on the deterministic synthetic site
    fixture: frontier waves, robots, bloom dedup, politeness, extraction.
    Oracle: the independent single-threaded Python crawl scheduler
    (plans/oracle_crawler.py — the same oracle the ordering/seen-set
    tests compare against) rolled up per (wave, site, role) with UTF-8
    text byte sums, so wave membership, gating, dedup, pagination AND
    extracted text are pinned at value level in the driver record."""
    import tempfile

    from no_fasel_scrapers_spark.plans.crawl import run_crawl
    from no_fasel_scrapers_spark.sources.catalog import Catalog
    from no_fasel_scrapers_spark.sources.fixture import Fixture, FixtureConfig

    fx = Fixture(FixtureConfig())
    cat = Catalog(tempfile.mkdtemp(prefix="nfs_crawl_entry_"))
    res = run_crawl(
        spark,
        fx.pages_df(spark),
        fx.seeds_df(spark),
        fx.robots_df(spark),
        cat,
    )
    return (
        res.extracted.groupBy("wave", "site", "role")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(
                F.length(F.encode(F.coalesce("text", F.lit("")), "UTF-8"))
            ).alias("text_bytes"),
        )
        .orderBy("wave", "site", "role")
    )


def q_link_pagerank(spark, sf_dir):
    """Fixed-point PageRank over the crawled link graph as a frontier /
    recrawl priority signal (operators/linkrank.py): crawl the fixture
    site, build (src url, canonicalized dst url) edges from the extracted
    ``links`` arrays restricted to crawled vertices, run 8 integer power
    iterations (ranks in 1e-12 units of total mass — long arithmetic, so
    per-vertex inflow sums are order-independent and the result is
    bit-identical at any parallelism), and return the top 25 pages.
    Oracle: the independent Python scheduler + the same integer
    recurrence (oracle/analytic.link_pagerank_rows) — an EXACT match,
    no float tolerance anywhere."""
    import tempfile

    from no_fasel_scrapers_spark.functions.canonical import canonicalize_url
    from no_fasel_scrapers_spark.operators.linkrank import pagerank
    from no_fasel_scrapers_spark.plans.crawl import run_crawl
    from no_fasel_scrapers_spark.sources.catalog import Catalog
    from no_fasel_scrapers_spark.sources.fixture import Fixture, FixtureConfig

    fx = Fixture(FixtureConfig())
    cat = Catalog(tempfile.mkdtemp(prefix="nfs_pagerank_"))
    res = run_crawl(
        spark, fx.pages_df(spark), fx.seeds_df(spark), fx.robots_df(spark),
        cat,
    )
    ex = res.extracted.select("url", "links").persist()
    verts = ex.select("url")
    edges = ex.select(
        F.col("url").alias("src"), F.explode("links").alias("l")
    ).select("src", canonicalize_url(F.col("l.url")).alias("dst"))
    pr = pagerank(verts, edges, k=8)
    out = (
        pr.orderBy(F.desc("pr"), "url")
        .limit(25)
        .select("url", F.col("pr").alias("pr_units"))
    )
    ex.unpersist()
    return out


def q_recrawl_delta(spark, sf_dir):
    """Recrawl/invalidation cycle (the one crawl semantic VERDICT r4 noted
    had no registry row): crawl the fixture site, invalidate a
    deterministic quarter of the fetched URLs from the seen set
    (cuckoo-delete semantics, ``operators/seen_filter.invalidate_recrawl``
    via ``run_crawl(recrawl=...)``), re-crawl them as a recrawl queue over
    MUTATED page content (``Alpha``→``Gamma`` — changes every page's text,
    no URL), and merge old/new records with new-wins precedence (O14,
    ``operators/merge.union_with_precedence``).  Oracle: the independent
    Python crawl scheduler run through the same cycle
    (oracle/analytic.recrawl_delta_rows).  The rollup pins, at value
    level: refetched records carry the new content (refetch_text_bytes),
    non-invalidated records survive untouched (text_bytes), and links
    re-discovered by recrawled pages stay deduped against the imported
    seen set (n_records, n_refetched)."""
    import tempfile

    from no_fasel_scrapers_spark.operators.merge import union_with_precedence
    from no_fasel_scrapers_spark.plans.crawl import run_crawl
    from no_fasel_scrapers_spark.sources.catalog import Catalog
    from no_fasel_scrapers_spark.sources.fixture import Fixture, FixtureConfig

    fx = Fixture(FixtureConfig())
    cat1 = Catalog(tempfile.mkdtemp(prefix="nfs_recrawl1_"))
    res1 = run_crawl(
        spark, fx.pages_df(spark), fx.seeds_df(spark), fx.robots_df(spark),
        cat1,
    )
    old = res1.extracted.select("url", "site", "category", "role", "text")
    # the invalidation set is the driver's decision (TTL / change signal);
    # deterministic hash quarter here.  Spark xxhash64 == the oracle's
    # xxh64_signed twin; pmod == Python % for a positive modulus.
    recrawl = old.filter(F.pmod(F.xxhash64("url"), F.lit(4)) == 0)
    seeds2 = recrawl.select(
        "url", "site", "category",
        F.lit(0).alias("priority"), F.lit(0).alias("depth"), "role",
        F.lit(None).cast("string").alias("url_template"),
    )
    # byte-level Alpha→Gamma, matching the oracle's bytes.replace: the
    # latin-1 round-trip is byte-transparent, so it works on the fixture's
    # windows-1256 pages too (strict UTF-8 decode would raise on them)
    pages2 = fx.pages_df(spark).withColumn(
        "html",
        F.encode(
            F.replace(
                F.decode(F.col("html"), "ISO-8859-1"),
                F.lit("Alpha"), F.lit("Gamma"),
            ),
            "ISO-8859-1",
        ),
    )
    cat2 = Catalog(tempfile.mkdtemp(prefix="nfs_recrawl2_"))
    res2 = run_crawl(
        spark, pages2, seeds2, fx.robots_df(spark), cat2,
        seen=res1.seen, recrawl=recrawl.select("url"),
    )
    new = res2.extracted.select("url", "site", "category", "role", "text")
    merged = union_with_precedence(old, new, key="url", old_wins=False)
    _bytes = F.sum(
        F.length(F.encode(F.coalesce("text", F.lit("")), "UTF-8"))
    )
    roll = merged.groupBy("site", "role").agg(
        F.count("*").alias("n_records"), _bytes.alias("text_bytes")
    )
    ref = new.groupBy("site", "role").agg(
        F.count("*").alias("n_refetched"), _bytes.alias("refetch_text_bytes")
    )
    return (
        roll.join(ref, ["site", "role"], "left")
        .fillna(0, ["n_refetched", "refetch_text_bytes"])
        .orderBy("site", "role")
    )


def q_warc_roundtrip(spark, sf_dir):
    """WARC source/sink (sources/warc.py, Python DataSource API):
    documents → pages schema → WARC sink → WARC scan → per-host rollup.
    Oracle computes the same rollup directly, so any framing/encoding loss
    in the round-trip breaks the value hash."""
    import tempfile

    from no_fasel_scrapers_spark.sources import warc

    warc.register(spark)
    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(
            F.lit("https://"), "source", F.lit("/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode("text", "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
    out = tempfile.mkdtemp(prefix="nfs_warc_rt_")
    pages.repartition(8).write.format("warc").mode("append").save(out)
    back = spark.read.format("warc").load(out)
    return (
        back.withColumn("host", F.parse_url("url", F.lit("HOST")))
        .groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("html")).alias("total_bytes"),
        )
        .orderBy("host")
    )


def q_pii_scrub(spark, sf_dir):
    """PII redaction (operators/quality.pii_scrub): plant deterministic
    emails / IPv4s / phone numbers into the documents text with pure
    column arithmetic (so the DuckDB oracle can reproduce the plant in
    SQL), then count and redact each category.  Whole operator is
    JVM-side regexp expressions — zero shuffle, zero Python; the oracle
    pins the byte-exact redacted text via md5."""
    from no_fasel_scrapers_spark.operators.quality import pii_scrub

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 1,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".7 seen"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 2,
                F.concat(
                    F.lit(" call +9715550"),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = pii_scrub(planted)
    return out.select(
        "doc_id",
        "n_email",
        "n_ip",
        "n_phone",
        F.md5("clean_text").alias("clean_md5"),
    )


def _pii_scrub_sql() -> str:
    """Oracle twin of q_pii_scrub, built from the SAME pattern constants
    so the two sides cannot drift (DuckDB regexp_replace needs the 'g'
    flag — Spark replaces all occurrences by default)."""
    from no_fasel_scrapers_spark.operators.quality import PII_PATTERNS

    pats = {name: pat for name, pat, _ in PII_PATTERNS}
    clean = "t"
    for name, pat, repl in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return f"""
        WITH planted AS (
            SELECT doc_id,
                   COALESCE(text, '')
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                || '@example.com' ELSE '' END
                   || CASE WHEN doc_id % 4 = 1
                           THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                                || '.7 seen' ELSE '' END
                   || CASE WHEN doc_id % 5 = 2
                           THEN ' call +9715550'
                                || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                           ELSE '' END
                   AS t
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{pats["email"]}')) AS BIGINT)
                   AS n_email,
               CAST(len(regexp_extract_all(t, '{pats["ip"]}')) AS BIGINT)
                   AS n_ip,
               CAST(len(regexp_extract_all(t, '{pats["phone"]}')) AS BIGINT)
                   AS n_phone,
               md5({clean}) AS clean_md5
        FROM planted
    """


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 entries — the driver records the first 50 registry rows
    (round 2's 53-entry registry dropped its tail off the record), so the
    registry is pinned to the cap with every query oracle-checked — as of
    round 4 including ``crawl_e2e`` (per-(wave, site, role) rollup vs the
    independent Python crawl scheduler, 50/50).  Three round-2
    entries were retired as redundant (their operators stay oracle-pinned
    via ``retired_queries()`` + tests/test_retired_queries.py):

    - ``cosine_pairs_exact`` — subsumed by ``embedding_near_dup_recall``'s
      exact-cosine truth side;
    - ``events_hourly`` — byte-identical semantics to the oracle-checked
      ``events_hourly_stream`` (availableNow drains to the batch answer);
    - ``ngram_jaccard`` — the jaccard-verify stage runs inside the
      oracle-checked ``minhash_dedup`` and ``near_dup_groups``.

    Two more retired in round 3 to make room for the new corpus-curation
    operators (``repetition_stats``, ``line_dedup``):

    - ``ann_bruteforce`` — exact cosine top-k is the oracle-checked truth
      side of ``ivf_recall`` (same brute_force_topk call);
    - ``chunk_documents`` — the chunker runs inside the oracle-checked
      ``training_prep`` capstone (per-chunk md5 pins its output).

    One more retired in round 4 to make room for the streaming dedup twin
    (``exact_dedup_stream`` — closes the batch/streaming asymmetry for the
    corpus operators):

    - ``intersect_keys`` — plain built-in ``INTERSECT``, no engine code of
      its own; stays oracle-pinned in tests/test_retired_queries.py.

    One more retired in round 5 to make room for the recrawl/invalidation
    cycle (``recrawl_delta`` — the one crawl semantic without a registry
    row, VERDICT r4 #5):

    - ``embedding_near_dup_recall`` — a 1-row recall metric whose exact
      truth side duplicates the already-retired ``cosine_pairs_exact``;
      the LSH operator it measures stays registry-checked via
      ``embedding_near_dup_lsh``.

    And a second round-5 retirement to make room for PII redaction
    (``pii_scrub`` — the scrubbing stage every corpus-release pipeline
    runs; no registry row covered it):

    - ``ivf_recall`` — the same retire-the-recall-metric argument as
      ``embedding_near_dup_recall``: a 3-row recall/scan curve whose
      exact truth side is the retired ``ann_bruteforce``; the IVF
      operator it measures stays registry-checked via ``ivf_ann``.

    And a third round-5 retirement to make room for the audio modality
    (``audio_features`` — real WAV/RIFF PCM decode, the one multimodal
    lane without a registry row now that PNG/JPEG/GIF cover images):

    - ``media_metadata`` — ``with_media_metadata`` is the FIRST stage of
      the registry-checked ``media_features`` (same operator, same
      mapInPandas path, plus codec/width/height/channels in its output),
      so the metadata struct stays fully registry-checked there.

    And a fourth round-5 retirement to make room for the video modality
    (``video_frames`` — real MJPEG-in-AVI container through
    ``sample_frames``, the one modality without a registry row now that
    images and audio have theirs):

    - ``exact_dedup`` — the same twin-coverage argument as the round-2
      ``events_hourly`` retirement: the registry-checked
      ``exact_dedup_stream`` drains to the byte-identical batch DISTINCT
      answer (its oracle IS the batch semantics), and exact dedup also
      runs as a pinned stage inside the oracle-checked ``training_prep``
      capstone, so the operator stays doubly registry-checked.
    """
    return {
        "pricing_summary": q_pricing_summary,
        "revenue_by_nation": q_revenue_by_nation,
        "top_orders_per_customer": q_top_orders_per_customer,
        "link_pagerank": q_link_pagerank,
        "union_precedence_old_wins": q_union_precedence_old_wins,
        "episode_delta": q_episode_delta,
        "anime_delta": q_anime_delta,
        "nested_assembly": q_nested_assembly,
        "integrity_manifest": q_integrity_manifest,
        "substring_dedup": q_substring_dedup,
        "url_category": q_url_category,
        "title_cleanups": q_title_cleanups,
        "normalized_title_join": q_normalized_title_join,
        "rollup_status_priority": q_rollup_status_priority,
        "charset_decode": q_charset_decode,
        "trending_id_join": q_trending_id_join,
        "genre_scrub_prune": q_genre_scrub_prune,
        "all_content_index": q_all_content_index,
        "pagination_expand": q_pagination_expand,
        "frontier_take_wave": q_frontier_take_wave,
        "robots_gate": q_robots_gate,
        "politeness_schedule": q_politeness_schedule,
        "seen_filter_dedup": q_seen_filter_dedup,
        "url_canonicalize": q_url_canonicalize,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "robots_parse": q_robots_parse,
        "sitemap_parse": q_sitemap_parse,
        "warc_roundtrip": q_warc_roundtrip,
        "audio_features": q_audio_features,
        "media_features": q_media_features,
        "training_prep": q_training_prep,
        "video_frames": q_video_frames,
        "exact_dedup_stream": q_exact_dedup_stream,
        "text_stats": q_text_stats,
        "repetition_stats": q_repetition_stats,
        "line_dedup": q_line_dedup,
        "events_hourly_stream": q_events_hourly_stream,
        "minhash_dedup": q_minhash_dedup,
        "near_dup_groups": q_near_dup_groups,
        "decontaminate": q_decontaminate,
        "sample_stratified": q_sample_stratified,
        "vocab_top_terms": q_vocab_top_terms,
        "simhash_pairs": q_simhash_pairs,
        "ivf_ann": q_ivf_ann,
        "pii_scrub": q_pii_scrub,
        "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
        "recrawl_delta": q_recrawl_delta,
        "doc_fingerprints": q_doc_fingerprints,
        "crawl_e2e": q_crawl_e2e,
    }


def retired_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Round-2 registry entries retired to fit the driver's 50-row record.

    Each is still a working query with a DuckDB oracle
    (``retired_oracle_sql()``); tests/test_retired_queries.py keeps the
    full value-level comparison green so no correctness signal was lost
    by trimming the driver-visible registry."""
    return {
        "ngram_jaccard": q_ngram_jaccard,
        "events_hourly": q_events_hourly,
        "cosine_pairs_exact": q_cosine_pairs_exact,
        "ann_bruteforce": q_ann_bruteforce,
        "chunk_documents": q_chunk_documents,
        "intersect_keys": q_intersect_keys,
        "embedding_near_dup_recall": q_embedding_near_dup_recall,
        "ivf_recall": q_ivf_recall,
        "media_metadata": q_media_metadata,
        "exact_dedup": q_exact_dedup,
        # retired round 5 for charset_decode: window-function coverage
        # stays registry-checked via top_orders_per_customer
        "sessionize_events": q_sessionize_events,
        # retired round 5 for link_pagerank: the left_anti shape stays
        # registry-checked via seen_filter_dedup's exact backstop and
        # decontaminate's anti-join
        "customers_without_orders": q_customers_without_orders,
        # retired round 5 for substring_dedup: the broadcast dict-decode
        # equi-join shape (O9) stays registry-checked via trending_id_join
        # and normalized_title_join
        "event_type_decode": q_event_type_decode,
    }


# Language-ID CASE shared by the text_stats and training_prep oracles —
# mirrors textstats.detect_lang branch-for-branch IN ORDER (ar before zh
# before the latin branches; ADVICE r1 flagged the round-1 omission of ar)
_LANG_CASE_SQL = """CASE
    WHEN len(regexp_extract_all(text, '[\\x{0600}-\\x{06FF}]')) > 0
         AND len(regexp_extract_all(text, '[\\x{0600}-\\x{06FF}]'))
             >= len(regexp_extract_all(text, '[A-Za-z]')) THEN 'ar'
    WHEN len(regexp_extract_all(text, '[\\x{4E00}-\\x{9FFF}]')) > 0
         AND len(regexp_extract_all(text, '[\\x{4E00}-\\x{9FFF}]'))
             >= len(regexp_extract_all(text, '[A-Za-z]')) THEN 'zh'
    WHEN len(regexp_extract_all(text, '[A-Za-z]')) > 0 AND stop >= 0.05
        THEN 'en'
    WHEN len(regexp_extract_all(text, '[A-Za-z]')) > 0 THEN 'latin-other'
    ELSE 'unknown' END"""


_WARC_ROUNDTRIP_SQL = """
SELECT source AS host,
       COUNT(*) AS n_pages,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
FROM documents
GROUP BY source
ORDER BY host
"""


def _analytic_oracles() -> dict[str, str]:
    """VALUES oracles for the xxhash-seeded queries (oracle/analytic.py).

    Computed at call time from the driver's correctness-scale parquet
    (sf0.01 unless SPARK_GRAFT_ORACLE_SF_DIR overrides).  A builder
    failure RAISES — silently degrading to rows-only would let an
    environment regression (missing duckdb/numpy, moved testdata) report
    a green gate with no oracles behind it (ADVICE r2).  Set
    SPARK_GRAFT_ALLOW_ORACLE_DEGRADE=1 to opt into the old degrade-to-
    rows-only behavior (each degraded query is still printed loudly)."""
    from no_fasel_scrapers_spark.oracle import analytic as ao

    out: dict[str, str] = {}
    failed: list[tuple[str, BaseException]] = []
    builders = {
        "minhash_dedup": ao.minhash_dedup_sql,
        "near_dup_groups": ao.near_dup_groups_sql,
        "decontaminate": ao.decontaminate_sql,
        "sample_stratified": ao.sample_stratified_sql,
        "simhash_pairs": ao.simhash_pairs_sql,
        "ivf_ann": ao.ivf_ann_sql,
        "embedding_near_dup_lsh": ao.embedding_near_dup_sql,
        "doc_fingerprints": ao.doc_fingerprints_sql,
        "media_features": ao.media_features_sql,
        "audio_features": ao.audio_features_sql,
        "video_frames": ao.video_frames_sql,
        "crawl_e2e": ao.crawl_e2e_sql,
        "recrawl_delta": ao.recrawl_delta_sql,
        "charset_decode": ao.charset_decode_sql,
        "link_pagerank": ao.link_pagerank_sql,
        "substring_dedup": ao.substring_dedup_sql,
    }
    for name, build in builders.items():
        try:
            out[name] = build()
        except Exception as ex:
            failed.append((name, ex))
    if failed:
        import os
        import sys

        for name, ex in failed:
            print(f"analytic oracle {name} failed: {ex!r}", file=sys.stderr)
        if os.environ.get("SPARK_GRAFT_ALLOW_ORACLE_DEGRADE") != "1":
            raise RuntimeError(
                f"{len(failed)}/{len(builders)} analytic oracle builders "
                f"failed ({[n for n, _ in failed]}); refusing to silently "
                "degrade the correctness gate to rows-only. Set "
                "SPARK_GRAFT_ALLOW_ORACLE_DEGRADE=1 to opt in."
            ) from failed[0][1]
    return out


def oracle_sql() -> dict[str, str]:
    return _analytic_oracles() | {
        "warc_roundtrip": _WARC_ROUNDTRIP_SQL,
        "pii_scrub": _pii_scrub_sql(),
        "vocab_top_terms": """
            WITH terms AS (
                SELECT unnest(list_distinct(
                           string_split_regex(lower(trim(text)), '\\s+')
                       )) AS term
                FROM documents WHERE text IS NOT NULL
            )
            SELECT term, COUNT(*) AS doc_freq
            FROM terms WHERE term <> ''
            GROUP BY term
            ORDER BY doc_freq DESC, term
            LIMIT 100
        """,
        "asof_join": """
            WITH v AS (
                SELECT user_id, ts, event_id FROM events
                WHERE event_type = 'view'
            ), p AS (
                SELECT user_id, ts, MAX(value) AS purchase_value
                FROM events WHERE event_type = 'purchase'
                GROUP BY user_id, ts
            )
            SELECT v.user_id, v.event_id,
                   ROUND(p.purchase_value, 6) AS purchase_value,
                   strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
            FROM v ASOF LEFT JOIN p
              ON v.user_id = p.user_id AND v.ts >= p.ts
        """,
        "robots_parse": """
            SELECT 'n' || CAST(n_nationkey AS VARCHAR) || '.test' AS host,
                   CASE
                     WHEN n_nationkey % 3 = 0 THEN
                       '/*.zip$,/a/,/b' || CAST(n_nationkey AS VARCHAR) || '/'
                     WHEN n_nationkey % 3 = 1 THEN
                       '/mb' || CAST(n_nationkey AS VARCHAR) || '/'
                     ELSE ''
                   END AS prefixes_csv,
                   CASE
                     WHEN n_nationkey % 3 = 0 THEN '/a/open/'
                     WHEN n_nationkey % 3 = 1 THEN
                       '/mb' || CAST(n_nationkey AS VARCHAR) || '/ok$'
                     ELSE ''
                   END AS allows_csv,
                   CASE
                     WHEN n_nationkey % 3 = 0 THEN
                       '^/.*\\.zip$,^/a/,^/b' || CAST(n_nationkey AS VARCHAR)
                           || '/,^/a/open/'
                     WHEN n_nationkey % 3 = 1 THEN
                       '^/mb' || CAST(n_nationkey AS VARCHAR) || '/,^/mb'
                           || CAST(n_nationkey AS VARCHAR) || '/ok$'
                     ELSE ''
                   END AS regexes_csv,
                   CAST(CASE WHEN n_nationkey % 3 = 0
                             THEN (n_nationkey % 5) * 1000
                             ELSE 0 END AS BIGINT) AS crawl_delay_ms
            FROM nation
        """,
        "sitemap_parse": """
            SELECT 'n' || CAST(n_nationkey AS VARCHAR) || '.test' AS host,
                   'url' AS kind,
                   'https://n' || CAST(n_nationkey AS VARCHAR)
                       || '.test/p' || CAST(i AS VARCHAR) AS url,
                   CASE WHEN i % 2 = 1
                        THEN '2024-01-0' || CAST(i AS VARCHAR) END AS lastmod
            FROM nation,
                 UNNEST(generate_series(1, n_nationkey % 4 + 1)) AS t(i)
            WHERE n_nationkey % 5 <> 0
            UNION ALL
            SELECT 'n' || CAST(n_nationkey AS VARCHAR) || '.test',
                   'sitemap',
                   'https://n' || CAST(n_nationkey AS VARCHAR)
                       || '.test/sm1.xml',
                   NULL
            FROM nation WHERE n_nationkey % 5 = 0
        """,
        "training_prep": f"""
            WITH tk AS (
                SELECT doc_id, text,
                       list_filter(
                           string_split_regex(coalesce(text, ''),
                                              '[ \\t\\n\\x0b\\f\\r]+'),
                           x -> x <> '') AS toks
                FROM ({_DOCS_WITH_PROBES_SQL}
                      UNION ALL {_prep_probe_sql()})
            ), t AS (
                SELECT doc_id, text,
                       CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                       CAST(len(list_filter(list_transform(toks, x -> lower(x)),
                            x -> x IN ('the','a','an','and','or','of','to',
                                       'in','is','it','for','on','with','as',
                                       'at','by','be','this','that','from')))
                            AS DOUBLE)
                       / len(toks) END AS stop,
                       CAST(len(regexp_extract_all(text,
                            '[^\\p{{L}}\\p{{N}}_ \\t\\n\\x0b\\f\\r]'))
                            AS DOUBLE) / length(text) AS punct,
                       CAST(length(text) AS DOUBLE) AS n
                FROM tk
            ), scored AS (
                SELECT doc_id, text,
                       least(n / 500.0, 1.0) * 0.4
                       + greatest(0.0, 1.0 - punct * 4.0) * 0.3
                       + least(stop * 5.0, 1.0) * 0.3 AS quality,
                       {_LANG_CASE_SQL} AS lang_d
                FROM t
            ), kept AS (
                SELECT doc_id, text FROM scored
                WHERE lang_d = 'en' AND quality >= 0.55
            ), rw AS (
                -- repetition-gate twin (same tokenization as above)
                SELECT doc_id, generate_subscripts(ws, 1) AS ord,
                       unnest(ws) AS w
                FROM (
                    SELECT doc_id,
                           list_filter(
                               string_split_regex(coalesce(text, ''),
                                                  '[ \\t\\n\\x0b\\f\\r]+'),
                               x -> x <> '') AS ws
                    FROM kept
                )
            ), rwc AS (
                SELECT doc_id, w, count(*) AS c FROM rw GROUP BY 1, 2
            ), rtopw AS (
                SELECT doc_id, max(c) AS top_c FROM rwc GROUP BY doc_id
            ), rwagg AS (
                SELECT doc_id, count(*) AS n_w FROM rw GROUP BY 1
            ), rg AS (
                SELECT a.doc_id, a.w || ' ' || b.w AS g
                FROM rw a JOIN rw b
                  ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
            ), rgagg AS (
                SELECT doc_id, count(*) AS n_g, count(DISTINCT g) AS nd_g
                FROM rg GROUP BY 1
            ), rep_kept AS (
                SELECT k.doc_id, k.text
                FROM kept k
                LEFT JOIN rwagg USING (doc_id)
                LEFT JOIN rtopw USING (doc_id)
                LEFT JOIN rgagg USING (doc_id)
                WHERE (CASE WHEN coalesce(rwagg.n_w, 0) = 0 THEN 0.0
                       ELSE rtopw.top_c * 1.0 / rwagg.n_w END) <= 0.35
                  AND (CASE WHEN coalesce(rgagg.n_g, 0) = 0 THEN 0.0
                       ELSE (rgagg.n_g - rgagg.nd_g) * 1.0 / rgagg.n_g
                       END) <= 0.2
            ), ll AS (
                -- corpus-level boilerplate line-dedup twin
                SELECT doc_id, generate_subscripts(ls, 1) AS pos,
                       unnest(ls) AS line
                FROM (
                    SELECT doc_id,
                           string_split(coalesce(text, ''), chr(10)) AS ls
                    FROM rep_kept
                )
            ), lboiler AS (
                SELECT line FROM ll
                WHERE regexp_replace(line, '[ \\t\\x0b\\f\\r]', '', 'g')
                      <> ''
                GROUP BY line
                HAVING count(DISTINCT doc_id) > 2
            ), lded AS (
                SELECT ll.doc_id,
                       coalesce(string_agg(ll.line, chr(10) ORDER BY pos)
                                FILTER (WHERE b.line IS NULL), '') AS text
                FROM ll LEFT JOIN lboiler b ON ll.line = b.line
                GROUP BY ll.doc_id
            ), ded AS (
                SELECT doc_id, text FROM (
                    SELECT doc_id, text,
                           ROW_NUMBER() OVER (PARTITION BY md5(text)
                                              ORDER BY doc_id) AS rn
                    FROM lded
                ) WHERE rn = 1
            ), toks AS (
                -- chunker twin keeps trim+split (incl. edge empties, as
                -- the engine chunker does) but with the EXPLICIT Java-\\s
                -- class so \\x0b splits on both sides
                SELECT doc_id,
                       string_split_regex(trim(text),
                                          '[ \\t\\n\\x0b\\f\\r]+') AS tk
                FROM ded WHERE text IS NOT NULL AND trim(text) <> ''
            ), c AS (
                SELECT doc_id, tk,
                       CAST(ceil(len(tk) / 48.0) AS INT) AS n_chunks
                FROM toks
            )
            SELECT doc_id, CAST(i AS INT) AS chunk_id,
                   CAST(len(tk[i*48+1 : least(i*48+48, len(tk))]) AS INT)
                       AS n_tokens,
                   md5(array_to_string(
                       tk[i*48+1 : least(i*48+48, len(tk))], ' '))
                       AS chunk_md5
            FROM c, UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
        """,
        "range_join": """
            SELECT c.c_nationkey AS nk, c.c_custkey, s.s_suppkey,
                   c.c_acctbal, s.s_acctbal AS lo
            FROM customer c JOIN supplier s
              ON c.c_nationkey = s.s_nationkey
             AND c.c_acctbal >= s.s_acctbal
             AND c.c_acctbal <= s.s_acctbal + 500.0
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rank
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC
                       ) AS rnk
                FROM orders
            ) WHERE rnk <= 3
        """,
        "union_precedence_old_wins": """
            SELECT o_orderkey, src, o_totalprice FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY o_orderkey
                    ORDER BY CASE src WHEN 'old' THEN 0 ELSE 1 END
                ) AS rn
                FROM (
                    SELECT o_orderkey, 'old' AS src, o_totalprice
                    FROM orders WHERE o_orderkey % 2 = 0
                    UNION ALL
                    SELECT o_orderkey, 'new' AS src, o_totalprice
                    FROM orders WHERE o_orderkey % 3 = 0
                )
            ) WHERE rn = 1
        """,
        "anime_delta": """
            WITH cur AS (
                SELECT CAST(l_orderkey AS VARCHAR) AS series_id,
                       l_orderkey AS k,
                       CAST(row_number() OVER (
                           PARTITION BY l_orderkey ORDER BY l_linenumber
                       ) AS INT) AS num
                FROM lineitem
            ), st AS (
                SELECT series_id, k, COUNT(*) AS cur_count,
                       CASE WHEN k % 3 = 0 THEN CAST(k % 4 AS INT)
                            ELSE 0 END AS old_count
                FROM cur GROUP BY series_id, k
            ), nn AS (
                SELECT c.series_id, COUNT(*) AS n_new
                FROM cur c JOIN st USING (series_id)
                WHERE st.cur_count <> st.old_count AND c.num > st.old_count
                GROUP BY c.series_id
            ), totals AS (
                SELECT st.series_id, st.k, st.cur_count,
                       CAST(st.old_count AS INT) AS old_count,
                       CAST(st.old_count + COALESCE(nn.n_new, 0) AS INT)
                           AS episodes_total,
                       CAST(COALESCE(nn.n_new, 0) AS INT) AS n_new
                FROM st LEFT JOIN nn USING (series_id)
            ), old_eps AS (
                SELECT series_id,
                       'e' || CAST(k AS VARCHAR) || 'x'
                           || CAST(j AS VARCHAR) AS eid,
                       CAST(j AS INT) AS num,
                       'old' || CAST(k AS VARCHAR) || '-'
                           || CAST(j AS VARCHAR) AS src
                FROM (SELECT series_id, k, old_count FROM st
                      WHERE old_count > 0),
                     UNNEST(generate_series(1, old_count)) AS u(j)
            ), merged AS (
                SELECT * FROM old_eps
                UNION ALL
                SELECT c.series_id,
                       'e' || CAST(c.k AS VARCHAR) || 'x'
                           || CAST(c.num AS VARCHAR),
                       c.num,
                       'src' || CAST(c.k AS VARCHAR) || '-'
                           || CAST(c.num AS VARCHAR)
                FROM cur c JOIN totals t USING (series_id)
                WHERE t.cur_count <> t.old_count AND c.num > t.old_count
            )
            SELECT m.series_id, m.eid, m.num, m.src,
                   t.old_count, t.episodes_total, t.n_new
            FROM merged m JOIN totals t USING (series_id)
        """,
        "episode_delta": """
            WITH cur AS (
                SELECT l_orderkey AS series_id,
                       CAST(COUNT(*) AS BIGINT) AS episodes_total
                FROM lineitem GROUP BY l_orderkey
            ), old AS (
                SELECT o_orderkey AS series_id,
                       CAST(o_orderkey % 4 AS BIGINT) AS old_count
                FROM orders
            )
            SELECT c.series_id, c.episodes_total,
                   COALESCE(o.old_count, 0) AS old_count,
                   c.episodes_total <> COALESCE(o.old_count, 0) AS needs_update
            FROM cur c LEFT JOIN old o USING (series_id)
        """,
        "nested_assembly": """
            SELECT l_orderkey,
                   CAST(COUNT(*) AS BIGINT) AS n_episodes,
                   string_agg(
                       CAST(l_linenumber AS VARCHAR) || ':' ||
                       CAST(CAST(l_quantity AS INTEGER) AS VARCHAR),
                       ',' ORDER BY l_linenumber, CAST(l_quantity AS INTEGER)
                   ) AS episodes
            FROM lineitem GROUP BY l_orderkey
        """,
        "integrity_manifest": """
            SELECT o_orderpriority,
                   md5(string_agg(CAST(o_orderkey AS VARCHAR), ','
                                  ORDER BY o_orderkey)) AS manifest_md5,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY o_orderpriority
        """,
        "url_category": """
            SELECT doc_id,
                   'https://w.test/' || CASE CAST(doc_id % 4 AS INTEGER)
                       WHEN 0 THEN '%d9%81%d9%8a%d9%84%d9%85/x'
                       WHEN 1 THEN 'asian-episodes/x'
                       WHEN 2 THEN 'anime-episodes/x'
                       ELSE 'show/x' END AS link,
                   CASE CAST(doc_id % 4 AS INTEGER)
                       WHEN 0 THEN 'movies' WHEN 1 THEN 'asian-series'
                       WHEN 2 THEN 'anime' ELSE 'series' END AS category
            FROM documents
        """,
        "title_cleanups": """
            SELECT p_partkey,
                   CASE WHEN p_partkey % 3 > 0 THEN p_name
                        ELSE p_name || ' part' END AS title,
                   CASE WHEN p_partkey % 5 = 0 THEN ''
                        ELSE CAST(p_partkey AS VARCHAR) END AS stream
            FROM part
        """,
        "normalized_title_join": """
            WITH a AS (
                SELECT p_partkey AS pk_a,
                       regexp_replace(lower(p_name), '\\s+', '', 'g') AS k
                FROM part
            ), b AS (
                SELECT p_partkey AS pk_b,
                       regexp_replace(lower(upper(replace(p_name, ' ', '   '))),
                                      '\\s+', '', 'g') AS k
                FROM part
            )
            SELECT pk_a, pk_b FROM a JOIN b USING (k)
        """,
        "rollup_status_priority": """
            SELECT COALESCE(o_orderstatus, '<all>') AS status,
                   COALESCE(o_orderpriority, '<all>') AS priority,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS total
            FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "exact_dedup_stream": f"""
            SELECT DISTINCT md5(text) AS text_md5,
                   CAST(length(text) AS INTEGER) AS text_len
            FROM (
                SELECT text FROM documents
                UNION ALL {_stream_dedup_probe_sql()}
            )
        """,
        "trending_id_join": """
            SELECT d.doc_id AS item_id, d.source AS source,
                   substring(d.text, 1, 24) AS title,
                   CASE WHEN d.doc_id % 2 = 0 THEN 'movies'
                        ELSE 'series' END AS category
            FROM documents d
            JOIN (SELECT doc_id FROM documents WHERE doc_id % 11 = 0) r
              ON d.doc_id = r.doc_id
        """,
        "genre_scrub_prune": """
            WITH g AS (
                SELECT p_partkey,
                       list_filter(
                           CASE WHEN p_partkey % 13 = 0
                                THEN ['100%', '/']
                                ELSE list_concat(string_split(p_type, ' '),
                                                 ['50%', '/']) END,
                           x -> NOT contains(x, '%') AND x <> '/'
                       ) AS genres
                FROM part
            )
            SELECT p_partkey,
                   array_to_string(genres, ',') AS genres_csv,
                   CAST(len(genres) AS INTEGER) AS n_genres
            FROM g WHERE len(genres) > 0
        """,
        "all_content_index": """
            SELECT CAST(p_partkey AS VARCHAR) AS key, p_name AS title,
                   'img/' || CAST(p_partkey AS VARCHAR) AS image_source,
                   'movies' AS category,
                   COALESCE(CASE WHEN p_partkey % 5 <> 0
                                 THEN CAST(p_partkey % 10 AS VARCHAR) END,
                            'N/A') AS rating,
                   COALESCE(array_to_string(
                       CASE WHEN p_partkey % 7 <> 0
                            THEN string_split(p_type, ' ') END, '|'),
                       '') AS genres_s
            FROM part WHERE p_partkey % 3 <> 0
            UNION ALL
            SELECT CAST(p_partkey AS VARCHAR), p_name,
                   'img/' || CAST(p_partkey AS VARCHAR), 'series', 'N/A',
                   COALESCE(array_to_string(
                       CASE WHEN p_partkey % 2 = 0
                            THEN string_split(p_type, ' ') END, '|'), '')
            FROM part WHERE p_partkey % 3 = 0
        """,
        "pagination_expand": """
            SELECT 'https://n' || CAST(n_nationkey AS VARCHAR) ||
                   '.test/cat/page/' || CAST(page AS VARCHAR) AS url,
                   'n' || CAST(n_nationkey AS VARCHAR) AS site,
                   CAST(1 AS INTEGER) AS depth,
                   CAST(0 AS INTEGER) AS priority
            FROM (
                SELECT n_nationkey,
                       unnest(generate_series(1, CAST(n_nationkey % 5 AS BIGINT) + 1)) AS page
                FROM nation
            )
        """,
        "frontier_take_wave": """
            SELECT event_id AS url_hash,
                   CAST(event_id % 5 AS INTEGER) AS priority,
                   CAST(user_id % 3 AS INTEGER) AS depth,
                   event_type
            FROM events
            ORDER BY priority, depth, url_hash
            LIMIT 500
        """,
        "robots_gate": """
            -- analytic RFC 9309 expectation from the generation rule:
            -- even hosts: Disallow /d/0, Disallow /d/1 + LONGER Allow /d/1/
            -- (allow wins), Disallow /*4$ (path ends in 4 <=> doc_id%10=4,
            -- still out-lengthed by Allow /d/1/ when doc_id%7=1);
            -- odd hosts: Disallow /d/2 only.
            SELECT doc_id,
                   'h' || CAST(doc_id % 10 AS VARCHAR) || '.test' AS host
            FROM documents
            WHERE NOT (
                (doc_id % 2 = 0 AND (doc_id % 7 = 0
                    OR (doc_id % 10 = 4 AND doc_id % 7 <> 1)))
                OR (doc_id % 2 = 1 AND doc_id % 7 = 2)
            )
        """,
        "politeness_schedule": """
            SELECT event_id AS url_hash,
                   'h' || CAST(user_id % 20 AS VARCHAR) || '.test' AS host,
                   CAST(row_number() OVER (
                       PARTITION BY user_id % 20
                       ORDER BY event_id % 5, event_id % 3, event_id
                   ) - 1 AS INTEGER) AS fetch_seq,
                   CAST((row_number() OVER (
                       PARTITION BY user_id % 20
                       ORDER BY event_id % 5, event_id % 3, event_id
                   ) - 1) * (user_id % 20 + 1) * 10 AS BIGINT) AS scheduled_ms
            FROM events
        """,
        "seen_filter_dedup": """
            SELECT event_id FROM events WHERE event_id % 3 <> 0
        """,
        "url_canonicalize": """
            SELECT doc_id,
                   'http://www.site' || CAST(doc_id % 7 AS VARCHAR) ||
                   '.test/a/b/' || CAST(doc_id AS VARCHAR) ||
                   '?a=1&b=' || CAST(doc_id % 5 AS VARCHAR) AS canonical,
                   'www.site' || CAST(doc_id % 7 AS VARCHAR) || '.test' AS host
            FROM documents
        """,
        "text_stats": f"""
            WITH tk AS (
                -- ws_tokens twin: maximal non-whitespace runs; explicit
                -- Java-\\s class because RE2's \\s excludes \\x0b
                SELECT doc_id, text,
                       list_filter(
                           string_split_regex(coalesce(text, ''),
                                              '[ \\t\\n\\x0b\\f\\r]+'),
                           x -> x <> '') AS toks
                FROM ({_DOCS_WITH_PROBES_SQL})
            ), t AS (
                SELECT doc_id, text,
                       CAST(len(toks) AS INTEGER) AS n_tokens_ws,
                       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\x0b\\f\\r]')) AS INTEGER) AS n_tokens_bpe,
                       CAST(len(regexp_extract_all(text, '[^\\p{{L}}\\p{{N}}_ \\t\\n\\x0b\\f\\r]')) AS DOUBLE) / length(text) AS punct,
                       CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                       CAST(len(list_filter(list_transform(toks, x -> lower(x)),
                            x -> x IN ('the','a','an','and','or','of','to','in','is','it','for',
                                       'on','with','as','at','by','be','this','that','from')))
                            AS DOUBLE)
                       / len(toks) END AS stop,
                       CAST(length(text) AS DOUBLE) AS n
                FROM tk
            )
            SELECT doc_id, n_tokens_ws, n_tokens_bpe,
                   round(punct, 9) AS punct_r,
                   round(stop, 9) AS stop_r,
                   {_LANG_CASE_SQL} AS lang_detected,
                   round(least(n / 500.0, 1.0) * 0.4
                         + greatest(0.0, 1.0 - punct * 4.0) * 0.3
                         + least(stop * 5.0, 1.0) * 0.3, 9) AS quality_r
            FROM t
        """,
        # The streaming path must converge to the identical batch answer
        # (availableNow drains everything; complete mode emits all windows)
        "events_hourly_stream": """
            SELECT event_type,
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "repetition_stats": f"""
            WITH d AS (
                SELECT doc_id, text FROM documents
                UNION ALL {_REP_PROBE_SQL}
            ), w AS (
                -- a token is a maximal non-whitespace run: split on the
                -- EXPLICIT Java-\\s class (RE2's \\s excludes \\x0b) and
                -- drop empties (they can only appear at the edges) —
                -- matches BOTH engine impls incl. leading/trailing tabs,
                -- \\x0b, whitespace-only, and NULL text
                SELECT doc_id, generate_subscripts(ws, 1) AS ord,
                       unnest(ws) AS w
                FROM (
                    SELECT doc_id,
                           list_filter(
                               string_split_regex(coalesce(text, ''),
                                                  '[ \\t\\n\\x0b\\f\\r]+'),
                               x -> x <> '') AS ws
                    FROM d
                )
            ), wc AS (
                SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2
            ), topw AS (
                SELECT doc_id, w AS top_word, c AS top_c FROM (
                    SELECT doc_id, w, c, row_number() OVER (
                        PARTITION BY doc_id ORDER BY c DESC, w ASC
                    ) AS rn FROM wc
                ) WHERE rn = 1
            ), wagg AS (
                SELECT doc_id, count(*) AS n_w, count(DISTINCT w) AS nd_w
                FROM w GROUP BY 1
            ), g AS (
                SELECT a.doc_id, a.w || ' ' || b.w AS g
                FROM w a JOIN w b
                  ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
            ), gc AS (
                SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2
            ), topg AS (
                SELECT doc_id, g AS top_2gram, c AS top_c FROM (
                    SELECT doc_id, g, c, row_number() OVER (
                        PARTITION BY doc_id ORDER BY c DESC, g ASC
                    ) AS rn FROM gc
                ) WHERE rn = 1
            ), gagg AS (
                SELECT doc_id, count(*) AS n_g, count(DISTINCT g) AS nd_g
                FROM g GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(coalesce(wagg.n_w, 0) AS INTEGER) AS n_words,
                   round(CASE WHEN coalesce(wagg.n_w, 0) = 0 THEN 0.0
                         ELSE (wagg.n_w - wagg.nd_w) * 1.0 / wagg.n_w
                         END, 9) AS dup_word_r,
                   topw.top_word,
                   round(CASE WHEN coalesce(wagg.n_w, 0) = 0 THEN 0.0
                         ELSE topw.top_c * 1.0 / wagg.n_w
                         END, 9) AS top_word_r,
                   round(CASE WHEN coalesce(gagg.n_g, 0) = 0 THEN 0.0
                         ELSE (gagg.n_g - gagg.nd_g) * 1.0 / gagg.n_g
                         END, 9) AS dup_2gram_r,
                   topg.top_2gram,
                   round(CASE WHEN coalesce(gagg.n_g, 0) = 0 THEN 0.0
                         ELSE topg.top_c * 1.0 / gagg.n_g
                         END, 9) AS top_2gram_r
            FROM d
            LEFT JOIN wagg USING (doc_id)
            LEFT JOIN topw USING (doc_id)
            LEFT JOIN gagg USING (doc_id)
            LEFT JOIN topg USING (doc_id)
        """,
        "line_dedup": f"""
            WITH d AS (
                SELECT doc_id, text FROM documents
                UNION ALL {_line_probe_sql()}
            ), l AS (
                SELECT doc_id, generate_subscripts(ls, 1) AS pos,
                       unnest(ls) AS line
                FROM (
                    SELECT doc_id,
                           string_split(coalesce(text, ''), chr(10)) AS ls
                    FROM d
                )
            ), boiler AS (
                SELECT line FROM l
                WHERE regexp_replace(line, '[ \t\x0b\f\r]', '', 'g') <> ''
                GROUP BY line
                HAVING count(DISTINCT doc_id) > 2
            ), marked AS (
                SELECT l.doc_id, l.pos, l.line,
                       (b.line IS NOT NULL) AS boiler
                FROM l LEFT JOIN boiler b ON l.line = b.line
            )
            SELECT doc_id,
                   coalesce(string_agg(line, chr(10) ORDER BY pos)
                            FILTER (WHERE NOT boiler), '') AS text,
                   CAST(count(*) AS INTEGER) AS n_lines,
                   CAST(count(*) FILTER (WHERE boiler) AS INTEGER)
                       AS n_removed
            FROM marked GROUP BY doc_id
        """,
    }


def retired_oracle_sql() -> dict[str, str]:
    """DuckDB oracles for ``retired_queries()`` — kept green by
    tests/test_retired_queries.py (same compare as the driver's gate)."""
    from no_fasel_scrapers_spark.oracle import analytic as ao

    return {
        # analytic VALUES oracles, same builders the registry used through
        # round 4 (retired round 5 for recrawl_delta and pii_scrub)
        "embedding_near_dup_recall": ao.embedding_near_dup_recall_sql(),
        "ivf_recall": ao.ivf_recall_sql(),
        # retired round 5 for link_pagerank
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        # retired round 5 for audio_features (with_media_metadata stays
        # registry-checked as media_features' first stage)
        "media_metadata": """
            SELECT doc_id,
                   CAST(16 + doc_id % 16 AS INTEGER) AS width,
                   CAST(8 + doc_id % 8 AS INTEGER) AS height,
                   CAST(1 + doc_id % 3 AS INTEGER) AS channels,
                   CAST(9 + (16 + doc_id % 16) * (8 + doc_id % 8) * (1 + doc_id % 3) AS BIGINT) AS n_bytes,
                   'nfsi-fake' AS codec
            FROM documents
        """,
        "intersect_keys": """
            SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 2 = 0
            INTERSECT
            SELECT l_orderkey FROM lineitem
        """,
        # retired round 5 for substring_dedup
        "event_type_decode": """
            SELECT event_type,
                   CASE event_type WHEN 'view' THEN 'View' WHEN 'click' THEN 'Click'
                        WHEN 'purchase' THEN 'Purchase' WHEN 'signup' THEN 'Signup'
                        WHEN 'error' THEN 'Error' END AS label,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                        WHEN 'purchase' THEN 5 WHEN 'signup' THEN 3
                        WHEN 'error' THEN 0 END) AS BIGINT) AS weight_total
            FROM events GROUP BY event_type
        """,
        # retired round 5 for charset_decode
        "sessionize_events": """
            WITH marked AS (
                SELECT user_id, event_id,
                       CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w IS NULL
                              OR epoch(ts) - LAG(epoch(ts)) OVER w > 1800
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id,
                   CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM marked GROUP BY user_id
        """,
        # retired round 5 for video_frames (batch semantics stay
        # registry-checked via exact_dedup_stream + training_prep)
        "exact_dedup": """
            SELECT doc_id, source, prefix FROM (
                SELECT doc_id, source, substring(text, 1, 16) AS prefix,
                       row_number() OVER (
                           PARTITION BY md5(substring(text, 1, 16))
                           ORDER BY doc_id ASC
                       ) AS rn
                FROM documents
            ) WHERE rn = 1
        """,
        "ngram_jaccard": """
            WITH g AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           generate_series(1, greatest(
                               len(string_split_regex(trim(lower(text)), '\\s+')) - 2, 1)),
                           i -> array_to_string(
                               (string_split_regex(trim(lower(text)), '\\s+'))[i:i+2], ' ')
                       )) AS grams
                FROM documents
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(
                       CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) = 0
                            THEN 1.0
                            ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                                 / len(list_distinct(list_concat(a.grams, b.grams)))
                       END, 6) AS jaccard_r
            FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
        """,
        "events_hourly": """
            SELECT event_type,
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "cosine_pairs_exact": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 4) AS cosine_r
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 100 AND b.vec_id < 100
              AND list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.2
        """,
        "ann_bruteforce": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                FROM embeddings WHERE vec_id < 5
            ), s AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS c
                FROM embeddings e, q
            )
            SELECT query_id, vec_id, CAST(rn AS INTEGER) AS rank,
                   round(c, 4) AS cosine_r
            FROM (
                SELECT query_id, vec_id, c,
                       row_number() OVER (
                           PARTITION BY query_id ORDER BY c DESC, vec_id ASC
                       ) AS rn
                FROM s
            ) WHERE rn <= 10
        """,
        "chunk_documents": """
            WITH d AS (
                SELECT doc_id,
                       string_split_regex(trim(text), '\\s+') AS toks
                FROM documents
                WHERE text IS NOT NULL AND trim(text) <> ''
            ), c AS (
                SELECT doc_id, toks,
                       CAST(ceil(len(toks) / 16.0) AS INT) AS n_chunks
                FROM d
            )
            SELECT doc_id, CAST(i AS INT) AS chunk_id,
                   CAST(len(toks[i*16+1 : least(i*16+32, len(toks))])
                        AS INT) AS n_tokens,
                   array_to_string(
                       toks[i*16+1 : least(i*16+32, len(toks))], ' ')
                       AS chunk_text
            FROM c, UNNEST(generate_series(0, n_chunks - 1)) AS t(i)
        """,
    }
