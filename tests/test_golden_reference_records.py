"""Golden parity against the reference's ACTUAL output records.

Samples real records from /root/reference/output/*.json (Arabic titles,
year-suffixed titles, md5-ish iframe sources, real genre casings),
synthesizes the pages the reference's selectors would have seen
(sources/ref_fixture.py — every raw form verified against the plain-Python
reference-semantics oracle at build time), runs the full crawl → extract →
assemble path, and asserts the stored records come back field-for-field.

This is the check VERDICT r1 flagged as missing: the synthetic fixture's
goldens and the engine share an author; these records do not.
"""

import json

import pytest
from pyspark.sql import functions as F

from no_fasel_scrapers_spark.functions.decode_tables import (
    akwam_genres_df,
    cimanow_genres_df,
)
from no_fasel_scrapers_spark.plans.assemble import (
    assemble_all_flat,
    assemble_fasel_anime,
    assemble_fasel_series,
)
from no_fasel_scrapers_spark.plans.crawl import run_crawl
from no_fasel_scrapers_spark.plans.postprocess import enrich_tmdb
from no_fasel_scrapers_spark.sources.catalog import Catalog
from no_fasel_scrapers_spark.sources.ref_fixture import RefRecordFixture

OUT = "/root/reference/output"

SAMPLES = {
    "movies.json": 110,
    "arabic-movies.json": 40,
    "anime.json": 20,
    "asian-series.json": 12,
    "tvshows.json": 12,
    # VERDICT r2 #2: the two record shapes with quirks the others lack —
    # WeCima's STRING season numbers + url-encoded Source slugs, CimaNow's
    # multi-quality list[map] Sources
    "WeCima.json": 40,
    "CimaNowMovies.json": 40,
}


def _load(name: str, n: int) -> dict:
    with open(f"{OUT}/{name}", encoding="utf-8") as fp:
        d = json.load(fp)
    return dict(list(d.items())[:n])


@pytest.fixture(scope="module")
def ref_run(spark, tmp_path_factory):
    fx = RefRecordFixture()
    fx.add_fasel_movies(_load("movies.json", SAMPLES["movies.json"]))
    fx.add_akwam_movies(_load("arabic-movies.json", SAMPLES["arabic-movies.json"]))
    fx.add_fasel_anime(_load("anime.json", SAMPLES["anime.json"]))
    fx.add_fasel_series(
        _load("asian-series.json", SAMPLES["asian-series.json"]), "asian-series"
    )
    fx.add_fasel_series(_load("tvshows.json", SAMPLES["tvshows.json"]), "tvshows")
    fx.add_wecima(_load("WeCima.json", SAMPLES["WeCima.json"]))
    fx.add_cimanow_movies(
        _load("CimaNowMovies.json", SAMPLES["CimaNowMovies.json"])
    )

    # the reconstruction must cover the overwhelming majority of real
    # records — a high skip rate would mean the cleanups diverge from
    # real-world shapes exactly the way this test exists to catch
    total_expected = sum(len(v) for v in fx.expected.values())
    total_skipped = sum(fx.skipped.values())
    assert total_expected >= 150, (total_expected, fx.skipped)
    assert total_skipped <= 0.25 * (total_expected + total_skipped), fx.skipped

    cat = Catalog(str(tmp_path_factory.mktemp("refgolden") / "cat"))
    res = run_crawl(
        spark,
        fx.pages_df(spark),
        fx.seeds_df(spark),
        fx.robots_df(spark),
        cat,
    )
    return fx, res


def test_extracted_text_byte_identical(ref_run):
    """north-rule invariant on real-record pages: byte-identical extracted
    text per url."""
    fx, res = ref_run
    exp = fx.expected_texts()
    got = {
        r["url"]: r["text"]
        for r in res.extracted.select("url", "text").collect()
        if r["text"] is not None
    }
    assert len(got) == len(exp)
    for url, text in got.items():
        assert text == exp[url], url


def test_fasel_movies_match_reference_records(ref_run, spark):
    fx, res = ref_run
    flat = assemble_all_flat(
        res.extracted,
        fx.image_cache_df(spark),
        akwam_genres_df(spark),
        cimanow_genres_df(spark),
        fx.tmdb_df(spark),
    )
    flat = enrich_tmdb(flat, fx.tmdb_df(spark))
    got = {
        r["item_id"]: r
        for r in flat.filter(F.col("site") == "fasel").collect()
    }
    exp = fx.expected["fasel_movies"]
    assert len(got) == len(exp) > 0
    for e in exp:
        g = got[e["item_id"]]
        for f in ("title", "fmt", "image_source", "source"):
            assert g[f] == e[f], (e["item_id"], f, g[f], e[f])
        assert list(g["genres"]) == e["genres"], e["item_id"]
        assert g["tmdb_id"] == e["tmdb_id"], e["item_id"]


def test_akwam_movies_match_reference_records(ref_run, spark):
    fx, res = ref_run
    flat = assemble_all_flat(
        res.extracted,
        fx.image_cache_df(spark),
        akwam_genres_df(spark),
        cimanow_genres_df(spark),
        fx.tmdb_df(spark),
    )
    flat = enrich_tmdb(flat, fx.tmdb_df(spark))
    got = {
        r["item_id"]: r
        for r in flat.filter(F.col("site") == "akwam").collect()
    }
    exp = fx.expected["akwam_movies"]
    assert len(got) == len(exp) > 0
    for e in exp:
        g = got[e["item_id"]]
        for f in ("title", "image_source", "source"):
            assert g[f] == e[f], (e["item_id"], f, g[f], e[f])
        assert list(g["genres"]) == e["genres"], e["item_id"]
        assert g["tmdb_id"] == e["tmdb_id"], e["item_id"]


def test_anime_match_reference_records(ref_run, spark):
    fx, res = ref_run
    anime = assemble_fasel_anime(
        res.extracted, fx.image_cache_df(spark), fx.translations_df(spark)
    )
    got = {r["series_id"]: r for r in anime.collect()}
    exp = fx.expected["fasel_anime"]
    assert len(got) == len(exp) > 0
    for e in exp:
        g = got[e["series_id"]]
        for f in ("title", "fmt", "image_source", "episodes_total"):
            assert g[f] == e[f], (e["series_id"], f, g[f], e[f])
        # episode map: keys, numbers, and RAW sources — byte-for-byte
        assert json.loads(g["seasons_json"]) == e["episodes"], e["series_id"]


def test_wecima_match_reference_records(ref_run, spark):
    """WeCima record parity: STRING season numbers (remove_arabic_chars of
    the anchor title, WeCimaScraper.py:37) and url-encoded Source slugs
    (hardcoded-prefix strip, lines 34-35) must round-trip exactly."""
    fx, res = ref_run
    flat = assemble_all_flat(
        res.extracted,
        fx.image_cache_df(spark),
        akwam_genres_df(spark),
        cimanow_genres_df(spark),
        fx.tmdb_df(spark),
    )
    got = {
        r["item_id"]: r
        for r in flat.filter(F.col("site") == "wecima").collect()
    }
    exp = fx.expected["wecima"]
    assert len(got) == len(exp) >= 30, (len(got), len(exp), fx.skipped)
    for e in exp:
        g = got[e["item_id"]]
        for f in ("title", "image_source", "source", "season_number"):
            assert g[f] == e[f], (e["item_id"], f, g[f], e[f])
        assert isinstance(g["season_number"], str), e["item_id"]


def test_cimanow_match_reference_records(ref_run, spark):
    """CimaNow record parity: multi-quality list[map] Sources
    (Common.py:392-394) + genre decode + TMDb id.  Expectations key on
    title — the reference's str(hash(title))[1:7] id is irreproducible by
    design (O25 divergence, md5(title)[:6] here)."""
    fx, res = ref_run
    flat = assemble_all_flat(
        res.extracted,
        fx.image_cache_df(spark),
        akwam_genres_df(spark),
        cimanow_genres_df(spark),
        fx.tmdb_df(spark),
    )
    rows = flat.filter(F.col("site") == "cimanow").collect()
    got = {r["title"]: r for r in rows}
    exp = fx.expected["cimanow_movies"]
    assert len(got) == len(exp) >= 25, (len(got), len(exp), fx.skipped)
    import hashlib

    for e in exp:
        g = got[e["title"]]
        assert g["image_source"] == e["image_source"], e["title"]
        assert list(g["genres"]) == e["genres"], e["title"]
        assert json.loads(g["sources_json"]) == e["sources"], e["title"]
        assert g["tmdb_id"] == e["tmdb_id"], e["title"]
        assert g["category"] == "cimanow-movie", e["title"]
        assert g["item_id"] == hashlib.md5(
            e["title"].encode()
        ).hexdigest()[:6], e["title"]


def test_series_match_reference_records(ref_run, spark):
    fx, res = ref_run
    series = assemble_fasel_series(res.extracted, fx.image_cache_df(spark))
    got = {r["series_id"]: r for r in series.collect()}
    for family in ("asian-series", "tvshows"):
        exp = fx.expected[family]
        assert len(exp) > 0, family
        for e in exp:
            g = got[e["series_id"]]
            for f in ("title", "fmt", "image_source", "episodes_total"):
                assert g[f] == e[f], (e["series_id"], f, g[f], e[f])
            assert json.loads(g["seasons_json"]) == {
                sid: {
                    "Episodes": s["Episodes"],
                    "Number Of Episodes": s["Number Of Episodes"],
                    "Season Number": s["Season Number"],
                }
                for sid, s in e["seasons"].items()
            }, e["series_id"]
