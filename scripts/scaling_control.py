"""Hardware-ceiling control for the scaling bench (no Spark involved).

The north rule's two-cluster-size criterion is evidenced in this sandbox
by the same job at local[N/4] vs local[N] (bench.py --scaling).  On a
single shared box the BIG level pays all-core turbo-frequency drop and
shared L3/memory-bandwidth contention that an N- vs 4N-executor cluster
(per-node conditions constant) does not.  This script measures that
hardware term directly: the SAME extraction hot path (functions/extract
over pagegen detail pages) run as N independent pure-Python processes,
one pinned per core — no JVM, no Arrow, no parquet, no shuffle.  Whatever
efficiency THIS loses 8→32 is the box, not the engine; raw_bench / control
is the engine-attributable efficiency that transfers to a real cluster.

Usage:
    python scripts/scaling_control.py            # levels 8 and 32, 2 trials
    python scripts/scaling_control.py 4 16       # custom pair
Prints one JSON line: per-level pages/sec/core + pair efficiency.
Levels are interleaved across trials (same protocol as bench.py
--scaling) so box-state drift hits both levels equally.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DISTINCT = 2000   # distinct pages per worker (built before the clock)
LOOPS = 15          # passes over them per measured run


def _worker(core: int, barrier, out_q) -> None:
    os.sched_setaffinity(0, {core})
    from no_fasel_scrapers_spark.functions.extract import extract_page
    from no_fasel_scrapers_spark.sources.pagegen import detail_page

    pages = [detail_page(core * N_DISTINCT + i) for i in range(N_DISTINCT)]
    barrier.wait()
    t0 = time.time()
    for _ in range(LOOPS):
        for url, html, _txt in pages:
            extract_page(url, "detail", html)
    out_q.put(time.time() - t0)


def run_level(n_procs: int) -> float:
    """Pages/sec/core with n_procs pinned single-core extractor processes."""
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(n_procs)
    out_q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(core, barrier, out_q))
        for core in range(n_procs)
    ]
    for p in procs:
        p.start()
    walls = [out_q.get() for _ in procs]
    for p in procs:
        p.join()
    # workers start together (barrier); the level's wall is the slowest
    per_core = N_DISTINCT * LOOPS / max(walls)
    return per_core


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [8, 32]
    trials = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "2"))
    best: dict[int, float] = {}
    for _ in range(trials):
        for n in sorted(levels, reverse=True):
            best[n] = max(best.get(n, 0.0), run_level(n))
    lo, hi = min(levels), max(levels)
    eff = (best[hi] * hi) / (best[lo] * lo * (hi / lo))
    print(json.dumps({
        "metric": "hardware_ceiling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "trials": trials,
        "levels": {
            str(n): {
                "pages_per_sec_per_core": round(best[n], 1),
                "total_pages_per_sec": round(best[n] * n, 1),
            }
            for n in sorted(levels)
        },
    }))


if __name__ == "__main__":
    main()
