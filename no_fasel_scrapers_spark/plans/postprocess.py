"""Post-processing batch jobs — Postprocessing.py / AllContentIndexer.py
re-expressed as DataFrame transforms (O16, O22, O23, O24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleanups import scrub_genres


def enrich_tmdb(records: DataFrame, tmdb: DataFrame) -> DataFrame:
    """TMDb backfill (O16) — reference ``Postprocessing.py:51-73`` does a
    live title-search per record; offline it is a broadcast join against the
    deterministic lookup table, movie/tv endpoint chosen by category
    (``Postprocessing.py:59-62``: "movies" in file name → movie search)."""
    kind = F.when(F.col("category").contains("movies"), F.lit("movies")).otherwise(
        F.lit("tv")
    )
    lk = tmdb.select(
        F.col("title"),
        F.col("kind").alias("__kind"),
        F.col("tmdb_id").alias("__tmdb"),
    )
    out = (
        records.withColumn("__kind", kind)
        .join(F.broadcast(lk), ["title", "__kind"], "left")
        .withColumn("tmdb_id", F.coalesce(F.col("tmdb_id"), F.col("__tmdb")))
        .drop("__kind", "__tmdb")
    )
    return out


def scrub_record_genres(records: DataFrame) -> DataFrame:
    """Genre scrub (O22a) — ``Postprocessing.py:36-49``: drop entries with
    '%' or equal to '/'; missing genres → []."""
    return records.withColumn(
        "genres",
        scrub_genres(F.coalesce(F.col("genres"), F.array().cast("array<string>"))),
    )


def prune_records(flat: DataFrame, series: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Prune pass (O22b) — ``Postprocessing.py:75-87``: movies with empty
    Source dropped; series with zero seasons/episodes dropped."""
    flat_p = flat.filter(
        ~((F.col("category") == "movies") & (F.col("source") == ""))
    )
    series_p = series.filter(F.col("episodes_total") > 0)
    return flat_p, series_p


def all_content_index(flat: DataFrame, series: DataFrame) -> DataFrame:
    """O23 — ``AllContentIndexer.py:8-33``: one unified list with
    Rating/Genres defaults (unionByName + coalesce)."""
    a = flat.select(
        F.col("item_id").alias("key"),
        "title",
        F.col("image_source"),
        "category",
        F.coalesce(F.col("rating"), F.lit("N/A")).alias("rating"),
        F.coalesce(F.col("genres"), F.array().cast("array<string>")).alias("genres"),
    )
    b = series.select(
        F.col("series_id").alias("key"),
        "title",
        F.col("image_source"),
        "category",
        F.lit("N/A").alias("rating"),
        F.coalesce(F.col("genres"), F.array().cast("array<string>")).alias("genres"),
    )
    return a.unionByName(b)


def integrity_manifest(records: DataFrame, group_col: str = "category") -> DataFrame:
    """O24 — ``Postprocessing.py:98-110``: md5 integrity hash per output
    group.  File-level md5 of a Python dict dump is not reproducible from a
    distributed table, so the engine defines the manifest as the md5 of the
    sorted concatenation of per-record canonical-JSON md5s — deterministic,
    order-insensitive, and computable as a pure aggregate."""
    per_record = records.withColumn(
        "__rec_md5", F.md5(F.to_json(F.struct(*records.columns)))
    )
    return per_record.groupBy(group_col).agg(
        F.md5(
            F.concat_ws("", F.sort_array(F.collect_list("__rec_md5")))
        ).alias("manifest_md5"),
        F.count("*").alias("n_records"),
    )


def image_index(flat: DataFrame, series: DataFrame) -> DataFrame:
    """Image-index rebuild — ``Postprocessing.py:23-34``: id+site-suffix →
    Image Source map, reproduced as a table."""
    suffix = (
        F.when(F.col("category").contains("arabic"),
               F.concat(F.lit("-akwam-"),
                        F.element_at(F.split(F.col("category"), "-", -1), -1)))
        .when(F.col("category").contains("hdw"), F.lit("-hdw"))
        .otherwise(F.lit("-fasel"))
    )
    a = flat.select(
        F.concat(F.col("item_id"), suffix).alias("content_id"),
        F.col("image_source").alias("image_url"),
    )
    b = series.select(
        F.concat(F.col("series_id"), suffix).alias("content_id"),
        F.col("image_source").alias("image_url"),
    )
    return a.unionByName(b)


def translate_titles(
    records: DataFrame,
    lookup: DataFrame,
    title_col: str = "title",
) -> DataFrame:
    """O17 — deterministic stand-in for googletrans ar→en
    (``FaselAnimeScraper.py:16-29``).

    ``lookup``: (ar_title, en_title).  Unmatched titles keep the original
    (the offline engine cannot invent translations; divergence documented in
    SURVEY.md §7.3-5), then the reference's exact post-translation cleanup
    runs as pure columns."""
    from ..functions.cleanups import clean_anime_title

    lk = lookup.select(
        F.col("ar_title").alias(title_col), F.col("en_title").alias("__en")
    )
    return (
        records.join(F.broadcast(lk), title_col, "left")
        .withColumn(
            title_col,
            clean_anime_title(F.coalesce(F.col("__en"), F.col(title_col))),
        )
        .drop("__en")
    )
