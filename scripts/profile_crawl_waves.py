"""Per-wave stage-time decomposition of the full site crawl.

Runs the SAME crawl the --crawl-scaling lane times (generated site,
run_crawl, catalog checkpointing) once at a given parallelism and prints
each wave's ``t_ms`` stage marks from the lineage — the driver-side view
of where wall time goes.  Compare two levels: stages whose time does not
shrink with cores are the wave loop's fixed cost.

Usage: python scripts/profile_crawl_waves.py <cpus> [n_pages]
"""
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
os.environ["SPARK_GRAFT_BENCH_PAGES"] = str(n_pages)

import bench  # noqa: E402  (reuses _crawl_spark/prepare_site/site config)
from no_fasel_scrapers_spark.plans.crawl import run_crawl  # noqa: E402
from no_fasel_scrapers_spark.sources.catalog import Catalog  # noqa: E402
from no_fasel_scrapers_spark.sources.pagegen import site_seed_rows  # noqa: E402

import time  # noqa: E402

spark = bench._crawl_spark(cpus)
site_path = bench.prepare_site(spark)
pages = spark.read.parquet(site_path)

seeds = spark.createDataFrame(
    [tuple(s.values()) for s in site_seed_rows()],
    "url string, site string, category string, priority int, "
    "depth int, role string, url_template string",
)
robots = spark.createDataFrame(
    [("fasel.test", [], 0)],
    "host string, disallow_prefixes array<string>, crawl_delay_ms int",
)
tmp = tempfile.mkdtemp(prefix="nfs_profile_crawl_")
try:
    t0 = time.time()
    res = run_crawl(
        spark, pages, seeds, robots, Catalog(tmp),
        n_salts=max(cpus * 2, 8),
        expected_urls=max(2 * n_pages, 2_000_000),
        cache_pages=False,
        max_pagination=max(n_pages // 8, 100_000),
    )
    n = res.extracted.count()
    wall = time.time() - t0
    print(json.dumps({"cpus": cpus, "wall_sec": round(wall, 2), "pages": n}))
    total_by_stage: dict = {}
    for l in res.lineage:
        tm = l.get("t_ms", {})
        print(json.dumps({"wave": l["wave"], "attempted": l["attempted"],
                          "t_ms": tm}))
        for k, v in tm.items():
            total_by_stage[k] = total_by_stage.get(k, 0) + v
    print(json.dumps({"stage_totals_ms": total_by_stage,
                      "sum_ms": sum(total_by_stage.values())}))
finally:
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
