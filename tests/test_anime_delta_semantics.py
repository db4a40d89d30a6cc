"""anime_episode_delta edge semantics vs FaselAnimeScraper.py (ADVICE r2):

- the slice is POSITIONAL (episodes_sources[old_count:], line 60-67), so a
  ``pos`` column overrides non-sequential anchor numbering;
- failed episode pages (NULL eid/src — get_iframe_source's continue, lines
  42/49) count toward the anchor total but never land in the map nor in
  n_new (``+= len(new_episodes)`` counts landed entries only, line 121);
- the episodes dict collapses duplicate ids (last position wins) and
  ``Episodes.update`` lets a re-scraped id replace the stored entry while
  the count still grows by len(new_episodes).
"""

import json

from pyspark.sql import functions as F

from no_fasel_scrapers_spark.operators.merge import anime_episode_delta


def _prior(spark, rows):
    return spark.createDataFrame(
        [
            (sid, n, json.dumps({
                eid: {"Episode Number": num, "Source": src}
                for eid, num, src in eps
            }))
            for sid, n, eps in rows
        ],
        "series_id string, old_count int, old_eps_json string",
    )


def _entries(spark, rows, with_pos=False):
    schema = "series_id string, eid string, num int, src string"
    if with_pos:
        schema += ", pos int"
    return spark.createDataFrame(rows, schema)


def test_failed_scrapes_anchor_counted_but_not_landed(spark):
    # 2 stored episodes; anchor list now has 4 (count mismatch -> rescrape
    # slice [2:]), but one of the two new pages failed (NULL eid/src).
    prior = _prior(spark, [
        ("a1", 2, [("e1", 1, "s1"), ("e2", 2, "s2")]),
    ])
    entries = _entries(spark, [
        ("a1", "e1", 1, "cur1"),
        ("a1", "e2", 2, "cur2"),
        ("a1", "e3", 3, "cur3"),
        ("a1", None, 4, None),  # page fetched None / no iframe
    ])
    out = anime_episode_delta(prior, entries).collect()
    by_eid = {r["eid"]: r for r in out}
    # reference: count grows by len(new_episodes)=1, not by the 2 anchors
    assert by_eid["e3"]["n_new"] == 1
    assert by_eid["e3"]["episodes_total"] == 3
    # stored episodes pass through untouched; failed row never lands
    assert sorted(by_eid) == ["e1", "e2", "e3"]
    assert by_eid["e1"]["src"] == "s1" and by_eid["e2"]["src"] == "s2"


def test_positional_slice_overrides_anchor_numbers(spark):
    # anchors numbered non-sequentially (10, 20, 30): positionally the
    # slice past old_count=2 is ONLY the third entry, even though every
    # anchor number exceeds old_count.
    prior = _prior(spark, [
        ("a1", 2, [("e1", 10, "s1"), ("e2", 20, "s2")]),
    ])
    entries = _entries(spark, [
        ("a1", "e1", 10, "cur1", 1),
        ("a1", "e2", 20, "cur2", 2),
        ("a1", "e3", 30, "cur3", 3),
    ], with_pos=True)
    out = anime_episode_delta(prior, entries).collect()
    by_eid = {r["eid"]: r for r in out}
    assert by_eid["e3"]["src"] == "cur3"
    assert by_eid["e1"]["src"] == "s1"  # NOT rescraped despite num>old_count
    assert by_eid["e3"]["n_new"] == 1 and by_eid["e3"]["episodes_total"] == 3


def test_duplicate_and_replacing_episode_ids(spark):
    # slice contains a duplicate id (dict collapses, last position wins)
    # and an id that replaces a stored entry (Episodes.update) — n_new
    # counts distinct landed ids, so the stored count grows by 2 even
    # though the map only gains one genuinely-new key (reference line 121).
    prior = _prior(spark, [
        ("a1", 1, [("e1", 1, "s1")]),
    ])
    entries = _entries(spark, [
        ("a1", "e1", 1, "cur1", 1),
        ("a1", "e1", 2, "replay", 2),   # re-scrape of stored id
        ("a1", "e9", 3, "first", 3),
        ("a1", "e9", 4, "last", 4),     # duplicate id, later position
    ], with_pos=True)
    out = anime_episode_delta(prior, entries).collect()
    by_eid = {r["eid"]: r for r in out}
    assert sorted(by_eid) == ["e1", "e9"]
    assert by_eid["e1"]["src"] == "replay"   # new replaces stored
    assert by_eid["e9"]["src"] == "last"     # last position wins
    assert by_eid["e1"]["n_new"] == 2
    assert by_eid["e1"]["episodes_total"] == 3


def test_unchanged_series_untouched_and_unknown_full(spark):
    prior = _prior(spark, [
        ("same", 2, [("e1", 1, "s1"), ("e2", 2, "s2")]),
    ])
    entries = _entries(spark, [
        ("same", "x1", 1, "new1"),
        ("same", "x2", 2, "new2"),
        ("fresh", "f1", 1, "fs1"),
        ("fresh", "f2", 2, "fs2"),
    ])
    out = anime_episode_delta(prior, entries)
    same = {r["eid"]: r for r in out.filter(F.col("series_id") == "same").collect()}
    assert sorted(same) == ["e1", "e2"]  # old record passes through
    assert same["e1"]["n_new"] == 0 and same["e1"]["episodes_total"] == 2
    fresh = {r["eid"]: r for r in out.filter(F.col("series_id") == "fresh").collect()}
    assert sorted(fresh) == ["f1", "f2"]
    assert fresh["f1"]["old_count"] == 0 and fresh["f1"]["episodes_total"] == 2
