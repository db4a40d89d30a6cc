"""Pagination probe collapse must be survivor-identical to the naive
expansion INCLUDING provenance (ADVICE r2): when probes disagree on the
extent (the corrupt-page case), page p's from_url is the min over probes
whose declared extent covers p — pages beyond a smaller probe's range are
never attributed to it.
"""

from no_fasel_scrapers_spark.operators.frontier import (
    dedup_within,
    expand_pagination_df,
    with_frontier_keys,
)


def _probes(spark, rows):
    return spark.createDataFrame(
        rows,
        "site string, category string, url_template string, last_page int, "
        "depth int, priority int, from_url string",
    )


def _page_of(url: str) -> int:
    return int(url.rsplit("/", 1)[1])


def test_disagreeing_extents_attribute_per_covering_probe(spark):
    # probe "a" (lexicographically first) declares 3 pages; probe "z"
    # declares 7.  Pages 1-3 are covered by both -> min is "a"; pages 4-7
    # only by "z".
    probes = _probes(spark, [
        ("s", "c", "https://s.test/cat/{p}", 3, 0, 0, "https://s.test/a"),
        ("s", "c", "https://s.test/cat/{p}", 7, 0, 0, "https://s.test/z"),
    ])
    out = {
        _page_of(r.url): r.discovered_from
        for r in expand_pagination_df(probes).collect()
    }
    assert len(out) == 7
    for p in range(1, 4):
        assert out[p] == "https://s.test/a", p
    for p in range(4, 8):
        assert out[p] == "https://s.test/z", p


def test_collapse_matches_naive_expand_then_dedup(spark):
    # Ground truth: expand each probe individually (no collapse) and dedup
    # with the frontier's deterministic survivor rule.
    rows = [
        ("s", "c", "https://s.test/cat/{p}", 5, 0, 0, "https://s.test/m"),
        ("s", "c", "https://s.test/cat/{p}", 2, 0, 0, "https://s.test/a"),
        ("s", "c", "https://s.test/cat/{p}", 9, 0, 0, "https://s.test/q"),
        ("s", "d", "https://s.test/dog/{p}", 4, 1, 2, "https://s.test/d1"),
    ]
    probes = _probes(spark, rows)
    collapsed = expand_pagination_df(probes)

    naive = None
    for row in rows:
        one = expand_pagination_df(_probes(spark, [row]))
        naive = one if naive is None else naive.unionByName(one)
    naive = dedup_within(naive)

    key = ["url", "discovered_from", "site", "category", "depth", "priority"]
    got = sorted(tuple(r) for r in collapsed.select(*key).collect())
    want = sorted(tuple(r) for r in naive.select(*key).collect())
    assert got == want
    assert len(got) == 9 + 4  # max extent per group, no duplicates


def test_clamp_with_disagreeing_extents(spark):
    probes = _probes(spark, [
        ("s", "c", "https://s.test/cat/{p}", 3, 0, 0, "https://s.test/a"),
        # corrupt probe declares an absurd extent
        ("s", "c", "https://s.test/cat/{p}", 2_000_000_000, 0, 0,
         "https://s.test/zz"),
    ])
    out = expand_pagination_df(probes, max_pages=10)
    rows = {_page_of(r.url): r.discovered_from for r in out.collect()}
    assert sorted(rows) == list(range(1, 11))
    assert rows[1] == "https://s.test/a"
    assert rows[10] == "https://s.test/zz"
