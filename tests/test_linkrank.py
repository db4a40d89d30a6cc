"""Fixed-point PageRank (operators/linkrank.py).

Pins: (1) the exact integer recurrence on a hand-computed 4-vertex
graph, (2) convergence toward the true float PageRank, (3) bounded
floor-loss of total mass, (4) bit-identical results across shuffle
parallelism — the determinism property the fixed-point design exists
for, and (5) edge hygiene (out-of-vertex-set edges dropped, parallel
edges collapsed, dangling mass redistributed).
"""

import pytest
from pyspark.sql import functions as F

from no_fasel_scrapers_spark.operators.linkrank import pagerank

UNIT = 10**12


def _py_pagerank(vs, es, k=8, unit=UNIT, dn=85, dd=100):
    """Independent driver-side mirror of the documented recurrence."""
    vs = sorted(set(vs))
    es = sorted({(s, d) for s, d in es if s in vs and d in vs})
    n = len(vs)
    outdeg = {}
    for s, _ in es:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = unit // n
    resid = (unit * (dd - dn) // dd) // n
    pr = {v: base for v in vs}
    for _ in range(k):
        dang = sum(pr[v] for v in vs if v not in outdeg)
        dang_share = dang // n
        inflow = {v: 0 for v in vs}
        for s, d in es:
            inflow[d] += pr[s] // outdeg[s]
        pr = {
            v: resid + (dn * (inflow[v] + dang_share)) // dd for v in vs
        }
    return pr


@pytest.fixture(scope="module")
def graph(spark):
    vs = ["a", "b", "c", "d"]
    # a->b, a->c, b->c, c->a; d dangling (no out-edges), never linked
    es = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")]
    vdf = spark.createDataFrame([(v,) for v in vs], "url string")
    edf = spark.createDataFrame(es, "src string, dst string")
    return vs, es, vdf, edf


def _as_dict(df):
    return {r["url"]: r["pr"] for r in df.collect()}


def test_matches_python_mirror(spark, graph):
    vs, es, vdf, edf = graph
    got = _as_dict(pagerank(vdf, edf, k=8))
    assert got == _py_pagerank(vs, es, k=8)


def test_approximates_float_pagerank(spark, graph):
    vs, es, vdf, edf = graph
    # true PageRank by float power iteration, long enough to converge
    n, d = len(vs), 0.85
    outdeg = {}
    for s, _ in es:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: 1.0 / n for v in vs}
    for _ in range(60):
        dang = sum(pr[v] for v in vs if v not in outdeg)
        inflow = {v: 0.0 for v in vs}
        for s, e in es:
            inflow[e] += pr[s] / outdeg[s]
        pr = {
            v: (1 - d) / n + d * (inflow[v] + dang / n) for v in vs
        }
    got = _as_dict(pagerank(vdf, edf, k=40))
    for v in vs:
        assert got[v] / UNIT == pytest.approx(pr[v], abs=1e-6)


def test_mass_conserved_up_to_floor_loss(spark, graph):
    vs, es, vdf, edf = graph
    k = 8
    total = sum(_as_dict(pagerank(vdf, edf, k=k)).values())
    n = len(vs)
    # each iteration loses < 1 unit per floor site: N resid floors,
    # N damp floors, |E| contrib floors, 1 dangling floor
    max_loss = (k + 1) * (2 * n + len(es) + 1)
    assert UNIT - max_loss <= total <= UNIT


def test_parallelism_invariance(spark, graph):
    """Bit-identical ranks regardless of shuffle partitioning — the
    property float PageRank cannot give (group-sum order varies with
    partitioning) and the reason ranks are integer units."""
    _, _, vdf, edf = graph
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _as_dict(pagerank(vdf, edf, k=8))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _as_dict(pagerank(vdf, edf, k=8))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_edge_hygiene(spark):
    vdf = spark.createDataFrame([("a",), ("b",)], "url string")
    edf = spark.createDataFrame(
        [
            ("a", "b"), ("a", "b"),          # parallel edge collapses
            ("a", "zz"), ("zz", "b"),        # endpoints outside V drop
            (None, "b"), ("a", None),        # nulls drop
        ],
        "src string, dst string",
    )
    got = _as_dict(pagerank(vdf, edf, k=4))
    assert got == _py_pagerank(["a", "b"], [("a", "b")], k=4)


def test_k_zero_is_uniform(spark, graph):
    _, _, vdf, edf = graph
    got = _as_dict(pagerank(vdf, edf, k=0))
    assert set(got.values()) == {UNIT // 4}
