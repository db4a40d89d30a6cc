"""The package must work from a ``--py-files`` zip (jobs/ entry points).

``spark-submit --py-files nfs_spark.zip`` ships the package as a zip that
executors import DIRECTLY from the archive (zipimport) — any
``__file__``-relative data loading or filesystem assumption inside the
package would pass every normal test and then break only on a real
cluster.  This test builds the zip the README documents and imports the
key modules from it in a clean subprocess whose package path is ONLY the
zip.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODULES = [
    "no_fasel_scrapers_spark.functions.extract",
    "no_fasel_scrapers_spark.functions.canonical",
    "no_fasel_scrapers_spark.operators.dedup",
    "no_fasel_scrapers_spark.operators.components",
    "no_fasel_scrapers_spark.operators.corpus",
    "no_fasel_scrapers_spark.operators.seen_filter",
    "no_fasel_scrapers_spark.plans.crawl",
    "no_fasel_scrapers_spark.sources.catalog",
    "no_fasel_scrapers_spark.streaming.ingest",
]


def test_package_imports_from_zip(tmp_path):
    zpath = tmp_path / "nfs_spark.zip"
    pkg = os.path.join(REPO, "no_fasel_scrapers_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    prog = (
        "import sys; sys.path.insert(0, sys.argv[1]);\n"
        + "\n".join(f"import {m}" for m in MODULES)
        + "\nimport no_fasel_scrapers_spark as p"
        "\nassert p.__file__.startswith(sys.argv[1]), p.__file__"
        "\nprint('zip-import ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", prog, str(zpath)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo root — the zip must be the source
        check=True,
    )
    assert "zip-import ok" in out.stdout
