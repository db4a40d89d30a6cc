"""Content-record assembly: extracted pages → reference-shaped records.

Everything here is pure DataFrame ops over the crawl's ``extracted`` table:
equi/broadcast joins to stitch listing cards to detail fields (the
reference's in-loop variable passing), the image-cache resolution chain
(O15), genre decode joins (O9), the 3-hop Akwam chase re-join (O18), and
two-level nested assembly with ``map_from_entries`` + ``to_json`` (O12)
that byte-matches the reference's JSON record shape.

Output schemas mirror tests' golden tables:
flat:   (site, category, item_id, title, fmt, genres, image_source,
         source, rating, tmdb_id, sources_json, season_number)
series: (site, category, series_id, title, fmt, genres, image_source,
         episodes_total, seasons_json)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.canonical import canonicalize_url
from ..functions.cleanups import (
    clean_iframe_source,
    clean_title,
)
from ..functions.decode_tables import PLACEHOLDER_IMAGE

def _sort_by_key(arr):
    """array_sort with an explicit key comparator — works even when the
    struct's value field is a MAP (plain sort_array cannot order those)."""
    return F.array_sort(
        arr,
        lambda l, r: F.when(l["key"] < r["key"], F.lit(-1))
        .when(l["key"] > r["key"], F.lit(1))
        .otherwise(F.lit(0)),
    )


def _NULL_STR():
    return F.lit(None).cast("string")


def _NULL_LONG():
    return F.lit(None).cast("long")


def resolve_image(content_key, raw_url, cache: DataFrame, df: DataFrame) -> DataFrame:
    """O15 as a broadcast join + coalesce chain (side-effect-free stand-in).

    Reference ``Common.py:217-254``: cache hit → cached URL; empty source →
    placeholder; else upload (here: the deterministic ``i.upload.test``
    stand-in for the non-reproducible Imgur POST — divergence documented in
    SURVEY.md §7.3-5)."""
    out = df.withColumn("__ckey", content_key).join(
        F.broadcast(
            cache.select(
                F.col("content_id").alias("__ckey"),
                F.col("image_url").alias("__cached"),
            )
        ),
        "__ckey",
        "left",
    )
    resolved = F.when(F.col("__cached").isNotNull(), F.col("__cached")).otherwise(
        F.when(
            raw_url.isNull() | (raw_url == ""), F.lit(PLACEHOLDER_IMAGE)
        ).otherwise(F.concat(F.lit("https://i.upload.test/"), F.col("__ckey"), F.lit(".jpg")))
    )
    return out.withColumn("image_source", resolved).drop("__cached")


def _cards(extracted: DataFrame, site: str) -> DataFrame:
    # a card can appear on several fetched listing pages (the category root
    # mirrors page 1) with identical content — distinct() collapses them
    return (
        extracted.filter((F.col("site") == site) & F.col("cards").isNotNull())
        .select("category", F.explode("cards").alias("c"))
        .select("category", "c.*")
        .distinct()
    )


def _fields(extracted: DataFrame, site: str, role: str | None = None) -> DataFrame:
    df = extracted.filter(
        (F.col("site") == site) & F.col("fields").isNotNull()
    )
    if role:
        df = df.filter(F.col("role") == role)
    return df.select(
        F.col("url"), "category", "role", "wave", F.col("fields.*")
    )


def assemble_fasel_movies(extracted: DataFrame, image_cache: DataFrame) -> DataFrame:
    """FaselMoviesScraper.py:14-47 as joins: listing card (title, poster) ⋈
    detail fields (id, format, genres, iframe) on the detail url."""
    cards = _cards(extracted, "fasel").filter(F.col("title").isNotNull())
    cards = cards.select(
        "category",
        F.col("url").alias("card_url"),
        F.col("title").alias("raw_title"),
        F.col("image_url").alias("raw_image"),
    ).withColumn(
        # cards link with tracking params / case variants; the frontier
        # canonicalized them before fetch — do the same to join
        "url", canonicalize_url(F.col("card_url")),
    )
    fields = _fields(extracted, "fasel", "detail").filter(
        F.col("item_id").isNotNull()
        & F.col("seasons").isNull()
        & F.col("episode_entries").isNull()  # anime details are not movies
    )
    j = fields.join(cards.drop("category"), "url", "inner")
    j = j.withColumn("title", clean_title(F.col("raw_title")))
    j = resolve_image(
        F.concat(F.col("item_id"), F.lit("-fasel")),
        F.col("raw_image"),
        image_cache,
        j,
    )
    # reference skips records whose detail page has no iframe
    # (FaselMoviesScraper.py:33-36 TypeError → continue)
    j = j.filter(F.col("iframe_src").isNotNull())
    return j.select(
        F.lit("fasel").alias("site"),
        F.lit("movies").alias("category"),
        "item_id",
        "title",
        F.coalesce(F.col("fmt"), F.lit("N/A")).alias("fmt"),
        F.coalesce(F.col("genres"), F.array().cast("array<string>")).alias("genres"),
        "image_source",
        clean_iframe_source(F.col("iframe_src")).alias("source"),
        _NULL_STR().alias("rating"),
        _NULL_LONG().alias("tmdb_id"),
        _NULL_STR().alias("sources_json"),
        _NULL_STR().alias("season_number"),
    )


def assemble_fasel_series(extracted: DataFrame, image_cache: DataFrame) -> DataFrame:
    """FaselSeriesScraper nested assembly (O12): detail → seasons →
    episodes, two-level groupBy + sorted map_from_entries + to_json."""
    cards = (
        _cards(extracted, "fasel")
        .filter(F.col("title").isNotNull())
        .select(
            F.col("title").alias("raw_title"),
            F.col("image_url").alias("raw_image"),
            canonicalize_url(F.col("url")).alias("url"),
        )
    )
    detail = _fields(extracted, "fasel", "detail").filter(
        F.col("seasons").isNotNull()
    )
    # explode seasons; join season pages on season_id embedded in the url
    seasons = detail.select(
        F.col("url").alias("series_url"),
        "item_id",
        F.explode("seasons").alias("s"),
    ).select(
        "series_url",
        F.col("item_id").alias("series_id"),
        F.col("s.season_id").alias("season_id"),
        F.col("s.season_number").alias("season_number"),
    )
    season_pages = _fields(extracted, "fasel", "season").select(
        F.regexp_extract("url", r"[?&]p=([^&]+)", 1).alias("season_id"),
        F.explode_outer("episode_links").alias("ep_url"),
    ).withColumn("ep_order", F.monotonically_increasing_id())
    episodes = _fields(extracted, "fasel", "episode").select(
        F.col("url").alias("ep_url"),
        F.col("episode_id"),
        clean_iframe_source(F.col("iframe_src")).alias("ep_source"),
    )

    from pyspark.sql.window import Window

    sp = season_pages.join(episodes, "ep_url", "left")
    w = Window.partitionBy("season_id").orderBy("ep_order")
    sp = sp.withColumn("ep_number", F.row_number().over(w))

    per_season = sp.groupBy("season_id").agg(
        F.count("ep_url").alias("n_eps"),
        F.map_from_entries(
            _sort_by_key(
                F.collect_list(
                    F.struct(
                        F.col("episode_id").alias("key"),
                        F.struct(
                            F.col("ep_number").alias("Episode Number"),
                            F.col("ep_source").alias("Source"),
                        ).alias("value"),
                    )
                )
            )
        ).alias("episodes_map"),
    )

    full = seasons.join(per_season, "season_id", "left").withColumn(
        "n_eps", F.coalesce(F.col("n_eps"), F.lit(0))
    )
    per_series = full.groupBy("series_url", "series_id").agg(
        F.sum("n_eps").cast("int").alias("episodes_total"),
        F.to_json(
            F.map_from_entries(
                _sort_by_key(
                    F.collect_list(
                        F.struct(
                            F.col("season_id").alias("key"),
                            F.struct(
                                F.col("episodes_map").alias("Episodes"),
                                F.col("n_eps").cast("int").alias("Number Of Episodes"),
                                F.col("season_number").alias("Season Number"),
                            ).alias("value"),
                        )
                    )
                )
            )
        ).alias("seasons_json"),
    )

    j = per_series.join(
        detail.select(
            F.col("url").alias("series_url"), "fmt", "genres",
        ),
        "series_url",
    ).join(cards.withColumnRenamed("url", "series_url"), "series_url")
    j = j.withColumn("title", clean_title(F.col("raw_title")))
    j = resolve_image(
        F.concat(F.col("series_id"), F.lit("-fasel")),
        F.col("raw_image"),
        image_cache,
        j,
    )
    return j.select(
        F.lit("fasel").alias("site"),
        F.lit("series").alias("category"),
        "series_id",
        "title",
        F.coalesce(F.col("fmt"), F.lit("N/A")).alias("fmt"),
        F.coalesce(F.col("genres"), F.array().cast("array<string>")).alias("genres"),
        "image_source",
        "episodes_total",
        "seasons_json",
    )


def assemble_fasel_anime(
    extracted: DataFrame, image_cache: DataFrame, translations: DataFrame
) -> DataFrame:
    """FaselAnimeScraper.py as joins — the anime family's structure is
    DISTINCT from fasel-series: div.epAll sits directly on the detail page
    (no seasons level), each episode is keyed by its own page's content id,
    Episode Number comes from the listing-anchor text, and the Source is
    the RAW iframe src (never clean_iframe_source'd).  The title runs
    through the translation lookup + exact post-translation cleanup (O17,
    ``clean_anime_title``) on the RAW listing title — the reference
    translates before any year/arabic cleanup (FaselAnimeScraper.py:120).

    Output matches the series record shape with category='anime' and a
    single-level episodes map as ``seasons_json``:
    ``{episode_id: {"Episode Number": n, "Source": raw_src}}``.

    ``Number Of Episodes`` counts the ANCHOR list (the reference uses
    ``len(anime_episodes_list)``, line 108), not the successfully-scraped
    episodes — an episode page without an iframe is skipped from the map
    (TypeError → continue, line 48) but still counted."""
    cards = (
        _cards(extracted, "fasel")
        .filter(F.col("title").isNotNull())
        .select(
            F.col("title").alias("raw_title"),
            F.col("image_url").alias("raw_image"),
            canonicalize_url(F.col("url")).alias("url"),
        )
    )
    detail = _fields(extracted, "fasel", "detail").filter(
        F.col("episode_entries").isNotNull() & F.col("item_id").isNotNull()
    )
    eps = detail.select(
        F.col("url").alias("series_url"),
        F.col("item_id").alias("series_id"),
        F.explode("episode_entries").alias("e"),
    ).select(
        "series_url", "series_id",
        F.col("e.url").alias("ep_url"),
        F.col("e.num").alias("ep_number"),
    )
    ep_pages = _fields(extracted, "fasel", "anime_episode").select(
        F.col("url").alias("ep_url"),
        F.col("episode_id"),
        F.col("iframe_src").alias("ep_source"),  # RAW, by design
    )
    chase = eps.join(ep_pages, "ep_url", "left")
    per_anime = chase.groupBy("series_url", "series_id").agg(
        F.count("*").cast("int").alias("episodes_total"),
        F.to_json(
            F.map_from_entries(
                _sort_by_key(
                    F.collect_list(
                        F.when(
                            F.col("ep_source").isNotNull()
                            & F.col("episode_id").isNotNull(),
                            F.struct(
                                F.col("episode_id").alias("key"),
                                F.struct(
                                    F.col("ep_number").alias("Episode Number"),
                                    F.col("ep_source").alias("Source"),
                                ).alias("value"),
                            ),
                        )
                    )
                )
            )
        ).alias("seasons_json"),
    )
    j = per_anime.join(
        detail.select(F.col("url").alias("series_url"), "fmt"), "series_url"
    ).join(cards.withColumnRenamed("url", "series_url"), "series_url")
    j = resolve_image(
        F.concat(F.col("series_id"), F.lit("-fasel")),
        F.col("raw_image"),
        image_cache,
        j,
    )
    j = j.withColumn("title", F.col("raw_title"))
    from .postprocess import translate_titles

    j = translate_titles(j, translations)
    return j.select(
        F.lit("fasel").alias("site"),
        F.lit("anime").alias("category"),
        "series_id",
        "title",
        F.coalesce(F.col("fmt"), F.lit("N/A")).alias("fmt"),
        F.array().cast("array<string>").alias("genres"),
        "image_source",
        "episodes_total",
        "seasons_json",
    )


def assemble_akwam_movies(
    extracted: DataFrame, image_cache: DataFrame, akwam_genres: DataFrame
) -> DataFrame:
    """AkwamMoviesScaper.py:10-36: detail page carries everything; genre-id
    decode is a broadcast join (O9); Source is the watch-URL formula."""
    fields = _fields(extracted, "akwam", "detail").filter(
        (F.col("category") == "arabic-movies") & F.col("short_link_id").isNotNull()
    )
    fields = fields.withColumn(
        "item_id", F.element_at(F.split(F.col("url"), "/", -1), 5)
    ).withColumn("host", F.regexp_extract("url", r"^https?://([^/]+)", 1))

    decoded = (
        fields.select("url", F.posexplode_outer("genres").alias("pos", "gid"))
        .join(
            F.broadcast(akwam_genres.withColumnRenamed("genre_id", "gid")),
            "gid",
            "left",
        )
        .groupBy("url")
        .agg(
            F.filter(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.col("genre_name")))
                    ),
                    lambda s: s.genre_name,
                ),
                lambda g: g.isNotNull(),
            ).alias("genres_named")
        )
    )
    j = fields.drop("genres").join(decoded, "url", "left")
    j = resolve_image(
        F.concat(F.col("item_id"), F.lit("-akwam-movies")),
        F.col("image_url"),
        image_cache,
        j,
    )
    return j.select(
        F.lit("akwam").alias("site"),
        F.lit("arabic-movies").alias("category"),
        "item_id",
        F.col("title"),
        _NULL_STR().alias("fmt"),
        F.coalesce(F.col("genres_named"), F.array().cast("array<string>")).alias("genres"),
        "image_source",
        F.concat(
            F.lit("https://"), F.col("host"), F.lit("/watch/"),
            F.col("short_link_id"), F.lit("/"), F.col("item_id"),
        ).alias("source"),
        _NULL_STR().alias("rating"),
        _NULL_LONG().alias("tmdb_id"),
        _NULL_STR().alias("sources_json"),
        _NULL_STR().alias("season_number"),
    )


def assemble_akwam_series(
    extracted: DataFrame, image_cache: DataFrame, akwam_genres: DataFrame
) -> DataFrame:
    """AkwamSeriesScraper: detail (fields + episode links) + the 3-hop chase
    re-joined (O18): select → shortlink → watch; Episode Source = the watch
    link discovered on the shortlink page (AkwamSeriesScraper.py:33-51)."""
    detail = _fields(extracted, "akwam", "detail").filter(
        (F.col("category") == "arabic-series") & F.col("episode_links").isNotNull()
    )
    detail = detail.withColumn(
        "series_id",
        F.element_at(F.split(F.col("url"), "/", -1), -2),
    )

    eps = detail.select(
        F.col("url").alias("series_url"),
        "series_id",
        F.explode("episode_links").alias("ep_select_url"),
    ).withColumn(
        "episode_id", F.element_at(F.split(F.col("ep_select_url"), "/", -1), 5)
    )
    select_pages = _fields(extracted, "akwam", "select").select(
        F.col("url").alias("ep_select_url"),
        F.col("next_url").alias("shortlink_url"),
    )
    short_pages = _fields(extracted, "akwam", "shortlink").select(
        F.col("url").alias("shortlink_url"),
        F.col("next_url").alias("watch_url"),
    )
    watch_pages = _fields(extracted, "akwam", "watch").select(
        F.col("url").alias("watch_url"),
        F.col("episode_number"),
    )
    chase = (
        eps.join(select_pages, "ep_select_url", "left")
        .join(short_pages, "shortlink_url", "left")
        .join(watch_pages, "watch_url", "left")
        .filter(F.col("episode_number").isNotNull())
    )
    per_series = chase.groupBy("series_url", "series_id").agg(
        F.count("*").cast("int").alias("episodes_total"),
        F.to_json(
            F.map_from_entries(
                _sort_by_key(
                    F.collect_list(
                        F.struct(
                            F.col("episode_id").alias("key"),
                            F.struct(
                                F.col("episode_number").alias("Episode Number"),
                                F.col("watch_url").alias("Source"),
                            ).alias("value"),
                        )
                    )
                )
            )
        ).alias("seasons_json"),
    )

    decoded = (
        detail.select("url", F.posexplode_outer("genres").alias("pos", "gid"))
        .join(
            F.broadcast(akwam_genres.withColumnRenamed("genre_id", "gid")),
            "gid",
            "left",
        )
        .groupBy("url")
        .agg(
            F.filter(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", F.col("genre_name")))),
                    lambda s: s.genre_name,
                ),
                lambda g: g.isNotNull(),
            ).alias("genres_named")
        )
    )
    j = (
        per_series.join(
            detail.drop("genres").withColumnRenamed("url", "series_url"),
            ["series_url", "series_id"],
        )
        .join(decoded.withColumnRenamed("url", "series_url"), "series_url", "left")
    )
    j = resolve_image(
        F.concat(F.col("series_id"), F.lit("-akwam-series")),
        F.col("image_url"),
        image_cache,
        j,
    )
    return j.select(
        F.lit("akwam").alias("site"),
        F.lit("arabic-series").alias("category"),
        "series_id",
        "title",
        F.lit("WEB-DL").alias("fmt"),
        F.coalesce(F.col("genres_named"), F.array().cast("array<string>")).alias("genres"),
        "image_source",
        "episodes_total",
        "seasons_json",
    )


def assemble_hdw(extracted: DataFrame) -> DataFrame:
    """HDWMoviesScraper.py:23-44 — cards are complete records.

    There is deliberately NO hdw-series assembly: the reference's
    ``HDWSeriesScraper.py`` is dead code — it crashes on import (references
    an undefined ``HDW_BASE_URL``; no module defines or exports it) and is
    absent from ``ScrapeAll.py``'s orchestration, so no hdw-series output
    file exists to be parity-checked against.  The exclusion is asserted in
    ``tests/test_golden.py::test_hdw_series_intentionally_absent`` so it
    stays a decision, not an accident (VERDICT r1 missing #5)."""
    cards = _cards(extracted, "hdw")
    return cards.select(
        F.lit("hdw").alias("site"),
        F.lit("hdwmovies").alias("category"),
        "item_id",
        "title",
        _NULL_STR().alias("fmt"),
        "genres",
        F.col("image_url").alias("image_source"),
        "source",
        "rating",
        _NULL_LONG().alias("tmdb_id"),
        _NULL_STR().alias("sources_json"),
        _NULL_STR().alias("season_number"),
    )


def assemble_wecima(extracted: DataFrame) -> DataFrame:
    """WeCimaScraper.py:26-50 — cards are complete records; Source strips
    the reference-hardcoded prefix (kept verbatim for parity)."""
    cards = _cards(extracted, "wecima")
    return cards.select(
        F.lit("wecima").alias("site"),
        F.lit("wecima").alias("category"),
        "item_id",
        "title",
        _NULL_STR().alias("fmt"),
        F.col("genres"),
        F.col("image_url").alias("image_source"),
        F.replace(
            F.col("source"), F.lit("https://wecima.tube/series/"), F.lit("")
        ).alias("source"),
        _NULL_STR().alias("rating"),
        _NULL_LONG().alias("tmdb_id"),
        _NULL_STR().alias("sources_json"),
        "season_number",
    )


def assemble_cimanow(
    extracted: DataFrame, cimanow_genres: DataFrame, tmdb: DataFrame
) -> DataFrame:
    """CimaNowMovieScraper.py:38-71: card + watch-page sources; genre decode
    via transform+map (nulls preserved, matching dict.get); deterministic id
    ``md5(title)[:6]`` replaces the irreproducible Python hash (O25)."""
    cards = _cards(extracted, "cimanow").select(
        F.col("url").alias("watch_url"),
        F.col("title"),
        F.col("image_url"),
        F.col("genres").alias("raw_genres"),
    )
    watch = _fields(extracted, "cimanow", "watch").select(
        F.col("url").alias("watch_url"), "sources_json"
    )
    gmap = F.map_from_entries(
        F.collect_list(F.struct("genre_ar", "genre_name"))
    )
    gm_df = cimanow_genres.agg(gmap.alias("gm"))
    j = (
        cards.join(watch, "watch_url", "left")
        .crossJoin(F.broadcast(gm_df))
        .withColumn(
            "genres",
            F.transform(
                F.coalesce(F.col("raw_genres"), F.array(F.lit(""))),
                lambda g: F.element_at(F.col("gm"), g),
            ),
        )
        .drop("gm")
    )
    j = j.join(
        F.broadcast(
            tmdb.filter(F.col("kind") == "movies").select(
                F.col("title"), F.col("tmdb_id")
            )
        ),
        "title",
        "left",
    )
    return j.select(
        F.lit("cimanow").alias("site"),
        F.lit("cimanow-movie").alias("category"),
        F.substring(F.md5(F.encode(F.col("title"), "UTF-8")), 1, 6).alias("item_id"),
        "title",
        _NULL_STR().alias("fmt"),
        "genres",
        F.col("image_url").alias("image_source"),
        _NULL_STR().alias("source"),
        _NULL_STR().alias("rating"),
        "tmdb_id",
        "sources_json",
        _NULL_STR().alias("season_number"),
    )


def assemble_all_flat(
    extracted: DataFrame,
    image_cache: DataFrame,
    akwam_genres: DataFrame,
    cimanow_genres: DataFrame,
    tmdb: DataFrame,
) -> DataFrame:
    """Union of every flat-record family (O23-style unionByName)."""
    parts = [
        assemble_fasel_movies(extracted, image_cache),
        assemble_akwam_movies(extracted, image_cache, akwam_genres),
        assemble_hdw(extracted),
        assemble_wecima(extracted),
        assemble_cimanow(extracted, cimanow_genres, tmdb),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def assemble_all_series(
    extracted: DataFrame,
    image_cache: DataFrame,
    akwam_genres: DataFrame,
    translations: DataFrame | None = None,
) -> DataFrame:
    out = assemble_fasel_series(extracted, image_cache).unionByName(
        assemble_akwam_series(extracted, image_cache, akwam_genres)
    )
    if translations is not None:
        out = out.unionByName(
            assemble_fasel_anime(extracted, image_cache, translations)
        )
    return out
