"""Corpus curation operators (operators/corpus.py): decontamination,
deterministic hash sampling, vocabulary stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from no_fasel_scrapers_spark.functions.xxh64 import xxh64_chain
from no_fasel_scrapers_spark.operators.corpus import (
    decontaminate,
    sample_by_hash,
    sample_stratified,
    vocab_top_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_shared_ngrams(spark):
    test = _docs(spark, [(100, "the quick brown fox jumps")])
    train = _docs(
        spark,
        [
            (1, "big quick brown fox sleeps"),  # shares 3-gram, not 4
            (2, "a quick brown fox jumps high"),  # shares the 4-gram
            (3, "completely unrelated words here"),
            (4, None),  # NULL text: 0 grams, never contaminated
        ],
    )
    rows = {
        r["doc_id"]: r
        for r in decontaminate(train, test, n=4).collect()
    }
    assert not rows[1]["contaminated"]
    assert rows[2]["contaminated"] and rows[2]["hit_grams"] == 1
    assert not rows[3]["contaminated"]
    assert rows[4]["n_grams"] == 0 and not rows[4]["contaminated"]
    # every train doc gets a row
    assert set(rows) == {1, 2, 3, 4}


def test_decontaminate_min_hits_threshold(spark):
    test = _docs(spark, [(100, "one two three four five six")])
    train = _docs(spark, [(1, "one two three four five munged")])
    # shares 4-grams "one two three four" + "two three four five" = 2 hits
    one = decontaminate(train, test, n=4, min_hits=2).collect()[0]
    assert one["hit_grams"] == 2 and one["contaminated"]
    strict = decontaminate(train, test, n=4, min_hits=3).collect()[0]
    assert not strict["contaminated"]


def test_sample_by_hash_deterministic_and_mirrors_twin(spark):
    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    got = {r["doc_id"] for r in sample_by_hash(df, "doc_id", 0.3, seed=7).collect()}
    again = {r["doc_id"] for r in sample_by_hash(df, "doc_id", 0.3, seed=7).collect()}
    assert got == again  # deterministic
    expected = {
        i
        for i in range(400)
        if xxh64_chain([("long", 7), ("long", i)]) % 1_000_000 < 300_000
    }
    assert got == expected  # bit-exact vs the pure-Python twin
    assert 0.2 < len(got) / 400 < 0.4  # roughly the asked fraction


def test_sample_stratified_respects_per_stratum_fractions(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sample_stratified(
        df, "doc_id", "lang", {"en": 1.0}, default_fraction=0.0, seed=1
    ).collect()
    langs = {r["lang"] for r in got}
    assert langs == {"en"} and len(got) == 300  # full en, zero de


def test_sample_subset_property(spark):
    # a smaller fraction's sample is a SUBSET of a larger one (same seed):
    # the hash-threshold scheme gives nested samples, unlike RNG sampling
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    small = {r["doc_id"] for r in sample_by_hash(df, "doc_id", 0.1, seed=3).collect()}
    large = {r["doc_id"] for r in sample_by_hash(df, "doc_id", 0.5, seed=3).collect()}
    assert small <= large


def test_vocab_top_terms_doc_frequency_not_occurrences(spark):
    df = _docs(
        spark,
        [
            (1, "apple apple apple banana"),
            (2, "apple cherry"),
            (3, "  Banana  apple "),
            (4, None),
        ],
    )
    rows = vocab_top_terms(df, k=10).collect()
    freq = {r["term"]: r["doc_freq"] for r in rows}
    assert freq == {"apple": 3, "banana": 2, "cherry": 1}
    # deterministic order: doc_freq desc, then term asc
    assert [r["term"] for r in rows] == ["apple", "banana", "cherry"]


def test_vocab_top_k_boundary_deterministic(spark):
    df = _docs(spark, [(i, f"t{i % 7} common") for i in range(50)])
    rows = vocab_top_terms(df, k=3).collect()
    assert [r["term"] for r in rows][:1] == ["common"]
    # ties among t0..t6 broken by term asc
    assert [r["term"] for r in rows][1:] == ["t0", "t1"]


def test_decontaminate_plan_broadcasts_test_side(spark):
    test = _docs(spark, [(100, "a b c d e")])
    train = _docs(spark, [(1, "a b c d x")])
    plan = decontaminate(train, test, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
