"""FilterCache (LRUQueryCache analogue) laws.

- fill/read identity: cached doc set == matching_docs output
- warm reads NEVER recompute (matching_docs stubbed to raise)
- the key pins the manifest version: a new commit point (delete)
  yields a different entry, and the new entry honors tombstones
- composition through allowed_docs restricts search_boolean hits
- LRU eviction bounds entries; reads touch their entry
- a loser of the rename race adopts the winner's entry
"""

import os
import time

import numpy as np
import pytest

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.deletes import delete_docs
from fdblucene_spark.operators.filtercache import FilterCache
from fdblucene_spark.operators.query import Searcher

WORDS = ["alpha", "beta", "gamma", "delta"]


@pytest.fixture(scope="module")
def fc_index(spark, tmp_path_factory):
    rng = np.random.default_rng(47)
    rows = []
    for i in range(160):
        ln = int(rng.integers(3, 20))
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(rng.choice(WORDS, size=ln)),
                "grp": ["g0", "g1", "g2"][i % 3],
                "n": i * 7 % 100,
            }
        )
    root = str(tmp_path_factory.mktemp("fc") / "idx")
    build_index(
        spark,
        spark.createDataFrame(rows),
        root,
        doc_col="doc_id",
        n_shards=4,
        keyword_fields={"grp": "grp"},
        stored_fields={"n": "n", "grp": "grp"},
    )
    return rows, root


FCLAUSES = [{"field": "grp", "term": "g1", "occur": "filter"}]
NUM = [{"field": "n", "lo": 10, "hi": 80}]


def test_fill_read_identity_and_composition(spark, fc_index):
    rows, root = fc_index
    s = Searcher(spark, root)
    fc = FilterCache(s)
    got = sorted(r["doc"] for r in fc.docs(FCLAUSES, numeric=NUM).collect())
    want = sorted(
        r["doc"] for r in s.matching_docs(FCLAUSES, numeric=NUM).collect()
    )
    assert got == want and len(got) > 0
    # brute membership
    brute = sorted(
        r["doc_id"] for r in rows if r["grp"] == "g1" and 10 <= r["n"] <= 80
    )
    assert got == brute
    # composition: every hit of the restricted query is in the set
    hits = s.search_boolean(
        [{"term": "alpha", "occur": "should"}],
        k=200,
        allowed_docs=fc.docs(FCLAUSES, numeric=NUM),
    ).collect()
    assert hits and set(int(r["doc"]) for r in hits) <= set(brute)


def test_warm_read_never_recomputes(spark, fc_index):
    _, root = fc_index
    s = Searcher(spark, root)
    fc = FilterCache(s)
    fc.docs(FCLAUSES, numeric=NUM)  # ensure filled
    original = s.matching_docs

    def boom(*a, **kw):
        raise AssertionError("warm read recomputed the filter")

    s.matching_docs = boom
    try:
        n = fc.docs(FCLAUSES, numeric=NUM).count()
    finally:
        s.matching_docs = original
    assert n > 0


def test_key_pins_manifest_version_and_tombstones(spark, fc_index, tmp_path):
    rows, root = fc_index
    s1 = Searcher(spark, root)
    fc1 = FilterCache(s1)
    k1 = fc1.key(FCLAUSES, numeric=NUM)
    set1 = set(r["doc"] for r in fc1.docs(FCLAUSES, numeric=NUM).collect())
    victim = sorted(set1)[0]
    delete_docs(spark, root, [int(victim)])
    s2 = Searcher(spark, root)  # pins the NEW commit point
    fc2 = FilterCache(s2)
    k2 = fc2.key(FCLAUSES, numeric=NUM)
    assert k1 != k2
    set2 = set(r["doc"] for r in fc2.docs(FCLAUSES, numeric=NUM).collect())
    assert set2 == set1 - {victim}
    # the old searcher's entry still serves its own snapshot
    assert set(r["doc"] for r in fc1.docs(FCLAUSES, numeric=NUM).collect()) == set1


def test_lru_eviction_bounds_entries(spark, fc_index):
    _, root = fc_index
    s = Searcher(spark, root)
    fc = FilterCache(s, max_entries=3)
    fc.clear()
    keys = []
    for lo in (0, 5, 10, 15, 20):
        fc.docs(FCLAUSES, numeric=[{"field": "n", "lo": lo, "hi": 90}])
        keys.append(fc.key(FCLAUSES, numeric=[{"field": "n", "lo": lo, "hi": 90}]))
        time.sleep(0.02)  # distinct mtimes
    entries = fc.entries()
    assert len(entries) == 3
    assert set(entries) == set(keys[-3:])  # oldest two evicted


def test_rename_race_adopts_winner(spark, fc_index):
    _, root = fc_index
    s = Searcher(spark, root)
    fc = FilterCache(s)
    fc.docs(FCLAUSES, numeric=NUM)  # ensure a complete entry exists
    entry = os.path.join(fc.dir, fc.key(FCLAUSES, numeric=NUM))
    assert os.path.exists(os.path.join(entry, "_SUCCESS"))
    # simulate losing the race: _fill against an already-complete entry
    fc._fill(entry, FCLAUSES, None, NUM)
    n = fc.docs(FCLAUSES, numeric=NUM).count()
    assert n > 0


def test_guards(spark, fc_index):
    _, root = fc_index
    s = Searcher(spark, root)
    with pytest.raises(ValueError):
        FilterCache(s, max_entries=0)
