"""Canonicalization: Spark column == Python twin == stable contract; xxh64
twin == Spark xxhash64."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from no_fasel_scrapers_spark.functions.canonical import (
    canonicalize_url,
    url_host,
    with_url_keys,
)
from no_fasel_scrapers_spark.functions.canonical_py import (
    canonicalize_url as canon_py,
    host_of,
)
from no_fasel_scrapers_spark.functions.xxh64 import xxh64_signed

URL_CHARS = st.characters(
    min_codepoint=0x21, max_codepoint=0x7E, blacklist_characters="%\\"
)
URL_ISH = st.builds(
    lambda scheme, host, path, q, frag: f"{scheme}://{host}/{path}"
    + (f"?{q}" if q else "") + (f"#{frag}" if frag else ""),
    st.sampled_from(["http", "https", "HTTP", "HTTPS"]),
    st.from_regex(r"[A-Za-z0-9.\-]{1,12}", fullmatch=True),
    st.text(URL_CHARS, max_size=14).map(lambda s: s.replace("?", "").replace("#", "")),
    st.text(URL_CHARS, max_size=12).map(lambda s: s.replace("#", "")),
    st.text(st.characters(min_codepoint=0x30, max_codepoint=0x7A), max_size=5),
)

FIXED = [
    "https://fasel.test/movies",
    "HTTPS://FASEL.TEST/movies/page/2?utm_source=x",
    "http://a.b:80/p//q/?b=2&a=1&utm_x=3#frag",
    "https://u:p@Host.Test:443//x/",
    "https://h",
    "https://wecima.test/download-series/?page_number=3/",
    "https://a.b:8080/x?fbclid=1&keep=2",
    "http://a.b:443/x",
]


class TestCanonicalTwins:
    def test_fixed(self, spark):
        df = spark.createDataFrame([(u,) for u in FIXED], "url string")
        got = [
            r["c"]
            for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
        ]
        assert got == [canon_py(u) for u in FIXED]

    @settings(max_examples=25, deadline=None)
    @given(st.lists(URL_ISH, min_size=1, max_size=15))
    def test_property(self, spark, urls):
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = [
            r["c"]
            for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
        ]
        assert got == [canon_py(u) for u in urls]

    def test_idempotent(self, spark):
        once = [canon_py(u) for u in FIXED]
        assert [canon_py(u) for u in once] == once

    def test_host(self, spark):
        df = spark.createDataFrame([(u,) for u in FIXED], "url string")
        got = [r["h"] for r in df.select(url_host(F.col("url")).alias("h")).collect()]
        assert got == [host_of(u) for u in FIXED]


class TestXxh64Twin:
    def test_matches_spark(self, spark, fixture):
        urls = [p["url"] for p in fixture.pages[:100]] + ["", "a", "x" * 100]
        df = spark.createDataFrame([(u,) for u in urls], "s string")
        got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
        for u in urls:
            assert got[u] == xxh64_signed(u)

    def test_url_keys(self, spark):
        df = spark.createDataFrame([(u,) for u in FIXED], "url string")
        rows = with_url_keys(df).collect()
        for r in rows:
            assert r["url_hash"] == xxh64_signed(r["canonical_url"])
            assert 0 <= r["host_salt"] < 8

    def test_int_long_and_chain_twins(self, spark):
        """The analytic oracles (oracle/analytic.py) depend on the int/long
        width distinction and multi-column seed chaining of Spark's
        xxhash64 — pin all of them against a live session."""
        from no_fasel_scrapers_spark.functions.xxh64 import (
            xxh64_chain,
            xxh64_int_signed,
            xxh64_long_signed,
            xxh64_long_vec,
        )

        row = spark.range(1).select(
            F.xxhash64(F.lit(7)).alias("i"),
            F.xxhash64(F.lit(-3)).alias("ineg"),
            F.xxhash64(F.lit(2**40)).alias("l"),
            F.xxhash64(F.lit(5), F.lit(2**33 + 17)).alias("chain_il"),
            F.xxhash64(F.lit("plane2:"), F.lit(9)).alias("chain_si"),
        ).collect()[0]
        assert row["i"] == xxh64_int_signed(7)
        assert row["ineg"] == xxh64_int_signed(-3)
        assert row["l"] == xxh64_long_signed(2**40)
        assert row["chain_il"] == xxh64_chain(
            [("int", 5), ("long", 2**33 + 17)]
        )
        assert row["chain_si"] == xxh64_chain([("str", "plane2:"), ("int", 9)])

        import numpy as np

        vals = np.array([2**40, -5, 0, 123456789123], dtype=np.int64)
        assert list(xxh64_long_vec(vals, 42)) == [
            xxh64_long_signed(int(v)) for v in vals
        ]
