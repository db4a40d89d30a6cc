"""The analytic oracles (oracle/analytic.py) vs the live Spark queries at
sf0.001 — a second scale point beyond the driver's sf0.01, so the mirrors
can't be accidentally pinned to one dataset."""

import pytest

import __spark_entry__ as E
from no_fasel_scrapers_spark.oracle import analytic as ao

SF = "/root/testdata/sf0.001"


def _spark_rows(spark, qname):
    # embedding_near_dup_recall moved to retired_queries() in round 5
    # (driver record capped at 50 rows); its value check lives on here.
    fn = E.queries().get(qname) or E.retired_queries()[qname]
    df = fn(spark, SF)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "qname, builder",
    [
        ("minhash_dedup", ao.minhash_dedup_rows),
        ("simhash_pairs", ao.simhash_pairs_rows),
        ("ivf_ann", ao.ivf_ann_rows),
        ("doc_fingerprints", ao.doc_fingerprints_rows),
        ("media_features", ao.media_features_rows),
        ("embedding_near_dup_lsh", ao.embedding_near_dup_rows),
        ("embedding_near_dup_recall", ao.embedding_near_dup_recall_rows),
    ],
)
def test_analytic_oracle_matches_spark(spark, qname, builder):
    got = _spark_rows(spark, qname)
    want = sorted(tuple(r) for r in builder(SF))
    assert got == want


def test_recall_meets_floor_on_driver_corpus():
    (n_true, n_found, recall) = ao.embedding_near_dup_recall_rows(SF)[0]
    assert n_true > 100  # the planted corpus yields a non-trivial truth set
    assert recall >= 0.9
