"""Full-pipeline orchestrator — the reference's ``ScrapeAll.py`` DAG (O26)
as one Spark application with sequential job stages over immutable
catalog snapshots.

    spark-submit --py-files nfs_spark.zip jobs/run_all.py \
        --catalog /data/catalog [--pages ... --seeds ... --robots ...] \
        [--run-date YYYY-MM-DD]

Reference DAG (``ScrapeAll.py:7-35``): 6 scraper processes in parallel →
barrier → TrendingScraper + Postprocessing in parallel → barrier →
AllContentIndexer → date stamp.  Here:

- Stage 1 (*crawl*): one ``run_crawl`` over the union frontier — all six
  sites crawl concurrently as Spark tasks, the per-site process boundary
  is gone (SURVEY §3.1).
- Stage 2 (*assemble + merge*): site extractions → flat/series content
  tables, upserted into the catalog with per-job precedence
  (``Catalog.merge``, new-wins like ``old.update(new)``).
- Stage 3 (*trending + postprocess*): derived jobs read the stage-2
  snapshots.  The reference's file race (Trending reads ``movies.json``
  while Postprocessing rewrites it, ``ScrapeAll.py:22-26``) cannot occur:
  both read the same immutable snapshot version.
- Stage 4 (*index + manifest + stamp*): all-content union, md5 integrity
  manifest, and the ``last-scraped.txt`` analog as snapshot metadata
  (``--run-date`` is explicit — no wall-clock in the dataflow, runs are
  reproducible).

Every stage writes through the snapshot catalog, so a consumer of the
reference's ``output/*.json`` has a 1:1 table: content_flat,
content_series, trending_content, all_content, image_indices,
file_hashes (manifest), run_stamp.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run_all(
    spark,
    pages,
    seeds,
    robots,
    cat,
    *,
    image_cache=None,
    tmdb=None,
    trending_links=None,
    trending_titles=None,
    run_date: str = "1970-01-01",
    crawl_kwargs: dict | None = None,
) -> dict:
    """Run the full DAG; returns a JSON-able stage summary.

    Pure function of its inputs (``run_date`` included) — calling it twice
    with the same inputs yields byte-identical snapshots at bumped
    versions (test_run_all.py asserts this).
    """
    from no_fasel_scrapers_spark.functions.decode_tables import (
        akwam_genres_df,
        cimanow_genres_df,
    )
    from no_fasel_scrapers_spark.plans.assemble import (
        assemble_all_flat,
        assemble_all_series,
    )
    from no_fasel_scrapers_spark.plans.crawl import run_crawl
    from no_fasel_scrapers_spark.plans.postprocess import (
        all_content_index,
        enrich_tmdb,
        image_index,
        integrity_manifest,
        prune_records,
        scrub_record_genres,
    )
    from no_fasel_scrapers_spark.plans.trending import (
        akwam_trending,
        fasel_trending,
    )

    empty_cache = spark.createDataFrame(
        [], "content_key string, image_url string"
    )
    image_cache = image_cache if image_cache is not None else empty_cache
    tmdb = (
        tmdb
        if tmdb is not None
        else spark.createDataFrame([], "title string, kind string, tmdb_id long")
    )

    # ---- stage 1: crawl (all sites, one frontier) ----------------------
    # One Catalog = one logical crawl (resume/read_union invariant): each
    # run gets its own wave workspace under the published catalog; the
    # published content tables below are what carries across runs.
    from no_fasel_scrapers_spark.sources.catalog import Catalog

    crawl_cat = Catalog(
        os.path.join(cat.root, "crawl_runs", run_date.replace("-", ""))
    )
    res = run_crawl(
        spark, pages, seeds, robots, crawl_cat, **(crawl_kwargs or {})
    )

    # ---- stage 2: assemble + incremental merge -------------------------
    flat = assemble_all_flat(
        res.extracted, image_cache, akwam_genres_df(spark),
        cimanow_genres_df(spark), tmdb,
    )
    flat = enrich_tmdb(flat, tmdb)
    series = assemble_all_series(res.extracted, image_cache, akwam_genres_df(spark))

    # postprocess before publishing, as the reference rewrites its files
    # in place (Postprocessing.py:92-93); snapshots make this safe.
    flat = scrub_record_genres(flat)
    series_scrubbed = scrub_record_genres(series)
    flat, series = prune_records(flat, series_scrubbed)

    key = ["site", "category"]
    cat.merge(flat, "content_flat", key=key + ["item_id"], new_wins=True,
              meta={"run_date": run_date})
    cat.merge(series, "content_series", key=key + ["series_id"], new_wins=True,
              meta={"run_date": run_date})
    flat = cat.read(spark, "content_flat")
    series = cat.read(spark, "content_series")

    # ---- stage 3: trending (reads immutable stage-2 snapshots) ---------
    trending_parts = []
    if trending_links is not None:
        trending_parts.append(
            akwam_trending(
                trending_links,
                series.filter(F.col("category") == "arabic-series"),
                flat.filter(F.col("category") == "arabic-movies"),
            ).withColumn("source_site", F.lit("akwam"))
        )
    if trending_titles is not None:
        # the reference matches homepage titles against ALL stored files
        # (TrendingScraper.py:116-130): flat records + series adapted
        stored = flat.select(
            "item_id", "title", "image_source", "category", "rating",
            "tmdb_id", "genres",
        ).unionByName(
            series.select(
                F.col("series_id").alias("item_id"), "title", "image_source",
                "category", F.lit(None).cast("string").alias("rating"),
                F.lit(None).cast("long").alias("tmdb_id"), "genres",
            )
        )
        trending_parts.append(
            fasel_trending(trending_titles, stored)
            .withColumn("source_site", F.lit("fasel"))
        )
    if trending_parts:
        trending = trending_parts[0]
        for p in trending_parts[1:]:
            trending = trending.unionByName(p, allowMissingColumns=True)
        cat.write(trending, "trending_content", meta={"run_date": run_date})

    images = image_index(flat, series)
    cat.write(images, "image_indices", meta={"run_date": run_date})

    # ---- stage 4: index + manifest + stamp -----------------------------
    allc = all_content_index(flat, series)
    cat.write(allc, "all_content", meta={"run_date": run_date})
    manifest = integrity_manifest(allc)
    cat.write(manifest, "file_hashes", meta={"run_date": run_date})
    stamp = spark.createDataFrame([(run_date,)], "last_scraped string")
    cat.write(stamp, "run_stamp", meta={"run_date": run_date})

    return {
        "waves": res.waves,
        "extracted_rows": res.extracted.count(),
        "content_flat": flat.count(),
        "content_series": series.count(),
        "trending": trending.count() if trending_parts else 0,
        "all_content": allc.count(),
        "manifest_rows": manifest.count(),
        "run_date": run_date,
        "versions": {
            n: cat.latest(n).version
            for n in ("content_flat", "content_series", "all_content")
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--pages")
    ap.add_argument("--seeds")
    ap.add_argument("--robots")
    ap.add_argument("--run-date", default="1970-01-01")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from no_fasel_scrapers_spark.session import get_spark
    from no_fasel_scrapers_spark.sources.catalog import Catalog
    from no_fasel_scrapers_spark.sources.fixture import Fixture

    spark = get_spark(app_name="nfs-run-all", master=args.master)
    fx = None
    if not (args.pages and args.seeds and args.robots):
        fx = Fixture()
    pages = spark.read.parquet(args.pages) if args.pages else fx.pages_df(spark)
    seeds = spark.read.parquet(args.seeds) if args.seeds else fx.seeds_df(spark)
    robots = (
        spark.read.parquet(args.robots) if args.robots else fx.robots_df(spark)
    )
    summary = run_all(
        spark, pages, seeds, robots, Catalog(args.catalog),
        image_cache=fx.image_cache_df(spark) if fx else None,
        tmdb=fx.tmdb_df(spark) if fx else None,
        trending_links=fx.trending_links_df(spark) if fx else None,
        trending_titles=fx.trending_titles_df(spark) if fx else None,
        run_date=args.run_date,
    )
    print(json.dumps(summary, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
