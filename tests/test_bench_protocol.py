"""The paired-median scaling estimator is the north_rule headline —
pin its math (bench._scaling_payload / bench._scale_levels) without
spawning Spark.

The estimator contract (ADVICE r2 #1): each trial's efficiency is
computed WITHIN its own (hi, lo, control) triple, and the headline is
the MEDIAN over trials with every pair reported — never a best-of
recombined across trials, which could pair a lucky hi with a lucky lo
from different box states.
"""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench


def _pairs():
    # three synthetic trials; eff = lo / (hi * 4) for hi_lo = (32, 8)
    return [
        {"hi_sec": 20.0, "lo_sec": 64.0, "eff": 0.800,
         "ctl_eff": 0.750, "engine_attributable": 1.067},
        {"hi_sec": 25.0, "lo_sec": 60.0, "eff": 0.600,
         "ctl_eff": 0.600, "engine_attributable": 1.000},
        {"hi_sec": 18.0, "lo_sec": 64.8, "eff": 0.900,
         "ctl_eff": 1.000, "engine_attributable": 0.900},
    ]


def test_payload_headline_is_median_not_best() -> None:
    p = bench._scaling_payload(
        "scaling_efficiency", _pairs(), [32, 8],
        n_items=3_000_000, control=True, extra={"n_pages": 3_000_000},
    )
    assert p["value"] == 0.8  # median of (0.6, 0.8, 0.9), not max
    assert p["spread"] == [0.6, 0.9]
    assert p["estimator"] == "median of per-trial paired efficiencies"
    assert p["trials"] == 3 and len(p["pairs"]) == 3
    # attributable is the median of per-trial ratios, not the ratio of
    # medians (0.8 / median-ctl would be 0.8/0.75 = 1.067 — wrong)
    assert p["engine_attributable"] == 1.0
    assert p["engine_attributable_spread"] == [0.9, 1.067]
    assert p["hardware_ceiling_eff_median"] == 0.75


def test_payload_levels_use_median_seconds() -> None:
    p = bench._scaling_payload(
        "crawl_scaling_efficiency", _pairs(), [32, 8],
        n_items=1_062_501, control=False, extra={},
    )
    # median hi_sec = 20.0, median lo_sec = 64.0
    assert p["levels"]["local[32]"]["sec"] == 20.0
    assert p["levels"]["local[8]"]["sec"] == 64.0
    assert p["levels"]["local[32]"]["pages_per_sec"] == round(
        1_062_501 / 20.0, 1
    )
    assert "engine_attributable" not in p  # control disabled


def test_scale_levels_env_override(monkeypatch) -> None:
    monkeypatch.setenv("SPARK_GRAFT_SCALE_LEVELS", "16,4")
    importlib.reload(bench)
    try:
        assert bench._scale_levels() == [16, 4]
        # ascending input normalizes to [hi, lo] — a swapped pair must
        # not silently invert the efficiency ratio
        monkeypatch.setenv("SPARK_GRAFT_SCALE_LEVELS", "4,16")
        assert bench._scale_levels() == [16, 4]
        monkeypatch.setenv("SPARK_GRAFT_SCALE_LEVELS", "8,8")
        import pytest

        with pytest.raises(SystemExit):
            bench._scale_levels()
        monkeypatch.delenv("SPARK_GRAFT_SCALE_LEVELS")
        assert bench._scale_levels() == [
            bench.CPUS, max(bench.CPUS // 4, 1)
        ]
    finally:
        importlib.reload(bench)
