"""Trending + featured derivation — TrendingScraper.py as joins (O19-O21).

- Akwam homepage recents ∩ stored content by id (equi join, O19)
- Fasel homepage trending matched to stored records on the normalized
  title key (the reference's "fuzzy" match is exact equality of
  lower+de-whitespaced titles — TrendingScraper.py:86-89; difflib is
  imported but never used) with first-match-wins precedence (O20)
- URL-substring category classifier (O21)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.cleanups import normalized_title_key, url_category


def akwam_trending(
    homepage_links: DataFrame,
    arabic_series: DataFrame,
    arabic_movies: DataFrame,
) -> DataFrame:
    """TrendingScraper.py:15-50: id from link path [-2], join stored tables.

    homepage_links: (link string).  Output: (item_id, title, image_source,
    category)."""
    ids = homepage_links.select(
        F.element_at(F.split(F.col("link"), "/", -1), -2).alias("item_id"),
        F.when(F.col("link").contains("series"), F.lit("arabic-series"))
        .when(F.col("link").contains("movie"), F.lit("arabic-movies"))
        .otherwise(F.lit(None))
        .alias("category"),
    ).filter(F.col("category").isNotNull())

    s = arabic_series.select(
        F.col("series_id").alias("item_id"), "title", "image_source",
        F.lit("arabic-series").alias("category"),
    )
    m = arabic_movies.select(
        "item_id", "title", "image_source",
        F.lit("arabic-movies").alias("category"),
    )
    stored = s.unionByName(m)
    return ids.join(stored, ["item_id", "category"], "inner").select(
        "item_id", "title", "image_source", "category"
    )


def fasel_trending(
    trending_titles: DataFrame,
    stored: DataFrame,
) -> DataFrame:
    """TrendingScraper.py:66-114 as a normalized-key equi join.

    trending_titles: (link, title) from homepage content pages; stored:
    flat records.  Match = equality of normalized title within the
    classified category; first match wins = lowest item_id (the reference's
    dict-iteration order is insertion order; the engine defines the
    deterministic equivalent)."""
    t = trending_titles.withColumn(
        "category", url_category(F.col("link"))
    ).withColumn("tkey", normalized_title_key(F.col("title"))).select(
        "link", "category", "tkey"
    )
    s = stored.withColumn(
        "tkey", normalized_title_key(F.col("title"))
    )
    j = t.join(s, ["category", "tkey"], "inner")
    w = Window.partitionBy("category", "tkey").orderBy(F.col("item_id").asc())
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "item_id", "title",
            F.col("image_source"), "category",
            F.coalesce(F.col("rating"), F.lit("N/A")).alias("rating"),
            F.col("tmdb_id"),
            F.coalesce(F.col("genres"), F.array().cast("array<string>")).alias(
                "genres"
            ),
        )
    )
