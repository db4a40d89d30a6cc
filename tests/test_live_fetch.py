"""Live-fetch adapter: bounded retries, dead-letter rows, schedule honor —
exercised with a deterministic fake transport (no network in the sandbox;
the real requests transport is import-gated and asserted stubbed)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from no_fasel_scrapers_spark.plans.live_fetch import (
    FetchConfig,
    fetch_batch,
    live_fetch_stage,
    requests_transport,
)


def flaky_transport(fail_first: dict):
    """Succeeds after ``fail_first[url]`` failures; 404 for '/gone' urls."""
    calls = {}

    def _get(url, headers):
        calls[url] = calls.get(url, 0) + 1
        if url.endswith("/gone"):
            return 404, None
        if calls[url] <= fail_first.get(url, 0):
            raise ConnectionError("boom")
        return 200, f"<html>{url}|ua={headers.get('User-Agent')}</html>".encode()

    return _get


CFG = FetchConfig(max_retries=2, backoff_ms=1, honor_schedule=False)


def test_fetch_batch_retries_and_dead_letters():
    pdf = pd.DataFrame({
        "url": ["https://h.test/a", "https://h.test/flaky",
                "https://h.test/dead", "https://h.test/gone"],
        "scheduled_ms": [0, 10, 20, 30],
    })
    out = fetch_batch(
        pdf,
        flaky_transport({"https://h.test/flaky": 2, "https://h.test/dead": 99}),
        CFG,
        {"User-Agent": "ua-test"},
    ).set_index("url")

    assert out.loc["https://h.test/a"].status == 200
    assert out.loc["https://h.test/a"].attempts == 1
    # flaky: fails twice, succeeds on 3rd (within budget of 1+2 retries)
    assert out.loc["https://h.test/flaky"].status == 200
    assert out.loc["https://h.test/flaky"].attempts == 3
    # dead: budget exhausted → dead-letter row, NOT an infinite spin
    assert out.loc["https://h.test/dead"].status == -1
    assert out.loc["https://h.test/dead"].attempts == 3
    assert out.loc["https://h.test/dead"].html is None
    # 404 is terminal-but-recorded the same bounded way
    assert out.loc["https://h.test/gone"].status == 404


def test_fetch_batch_honors_schedule_with_fake_clock():
    sleeps = []
    clock_t = [0.0]

    def clock():
        return clock_t[0]

    def sleep(s):
        sleeps.append(round(s, 3))
        clock_t[0] += s

    pdf = pd.DataFrame({
        "url": ["https://h.test/1", "https://h.test/2", "https://h.test/3"],
        "scheduled_ms": [0, 500, 1000],
    })
    cfg = FetchConfig(honor_schedule=True, max_retries=0)
    fetch_batch(pdf, flaky_transport({}), cfg, {}, clock=clock, sleep=sleep)
    # rows processed in schedule order with the inter-row gaps slept
    assert sleeps == [0.5, 0.5]


def test_live_fetch_stage_distributed(spark):
    wave = spark.createDataFrame(
        [(f"https://h{i % 2}.test/p/{i}", i, i * 10) for i in range(20)],
        "url string, url_hash long, scheduled_ms long",
    ).repartition(4)
    bc = spark.sparkContext.broadcast({"Cookie": "tok=abc"})

    out = live_fetch_stage(
        wave,
        cfg=CFG,
        transport=flaky_transport({}),
        auth_broadcast=bc,
    )
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.status == 200 for r in rows)
    # auth broadcast reached the task-side headers (UA comes from cfg)
    body = rows[0].html.decode()
    assert "ua=nfs-spark-crawler/1.0" in body


def test_requests_transport_is_gated():
    try:
        import requests  # noqa: F401
        pytest.skip("requests present; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        requests_transport(CFG)
