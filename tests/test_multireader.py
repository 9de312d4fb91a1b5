"""Federated multi-index search (Lucene MultiReader parity).

The oracle is the engine itself: searching N disjoint sub-indexes
with MultiReader-combined stats must be (doc, score)-IDENTICAL to
searching one index built over the union corpus — Lucene's MultiReader
contract (docFreq/docCount/sumTotalTermFreq sum across leaves).
"""

import numpy as np
import pytest

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.deletes import delete_docs
from fdblucene_spark.operators.multireader import MultiSearcher
from fdblucene_spark.operators.query import Searcher

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi",
]


@pytest.fixture(scope="module")
def mr_setup(spark, tmp_path_factory):
    rng = np.random.default_rng(67)
    w = 1.0 / np.arange(1, len(WORDS) + 1)
    p = w / w.sum()
    rows = []
    for i in range(400):
        txt = " ".join(rng.choice(WORDS, size=int(rng.integers(4, 40)), p=p))
        rows.append({"doc_id": i, "text": txt, "n_chars": len(txt)})
    base = tmp_path_factory.mktemp("mr")
    full = str(base / "full")
    ha, hb = str(base / "ha"), str(base / "hb")
    df = spark.createDataFrame(rows)
    build_index(spark, df, full, doc_col="doc_id", n_shards=8,
                text_fields={"text": "text"},
                stored_fields={"n_chars": "n_chars"})
    build_index(spark, df.filter("doc_id < 200"), ha, doc_col="doc_id",
                n_shards=4, text_fields={"text": "text"},
                stored_fields={"n_chars": "n_chars"})
    build_index(spark, df.filter("doc_id >= 200"), hb, doc_col="doc_id",
                n_shards=4, text_fields={"text": "text"},
                stored_fields={"n_chars": "n_chars"})
    return rows, full, ha, hb


def _hits(df):
    return [(int(r["doc"]), np.float32(r["score"])) for r in df.collect()]


@pytest.mark.parametrize("mode,terms", [
    ("or", ["gamma", "zeta"]),
    ("and", ["alpha", "beta", "delta"]),
    ("phrase", ["alpha", "beta"]),
])
def test_multireader_identical_to_union_index(spark, mr_setup, mode, terms):
    _, full, ha, hb = mr_setup
    want = _hits(Searcher(spark, full).search(terms, k=60, mode=mode))
    got = _hits(MultiSearcher(spark, [ha, hb]).search(terms, k=60, mode=mode))
    assert got == want
    assert len(want) > 0


def test_multireader_combined_stats_not_per_leaf(spark, mr_setup):
    # a term's idf must come from the UNION df: searching one half
    # alone scores differently than the federated pair
    _, full, ha, hb = mr_setup
    solo = {d: s for d, s in _hits(Searcher(spark, ha).search(["gamma"], k=400))}
    fed = {d: s for d, s in
           _hits(MultiSearcher(spark, [ha, hb]).search(["gamma"], k=400))}
    shared = sorted(set(solo) & set(fed))
    assert shared and any(solo[d] != fed[d] for d in shared)


def test_multireader_count_and_empty(spark, mr_setup):
    _, full, ha, hb = mr_setup
    ms = MultiSearcher(spark, [ha, hb])
    s = Searcher(spark, full)
    assert ms.count(["gamma", "zeta"], mode="or") == s.count(["gamma", "zeta"], "or")
    assert ms.count(["alpha", "beta"], mode="and") == s.count(["alpha", "beta"], "and")
    assert ms.search(["zzznope"], k=5).count() == 0
    assert ms.search(["zzznope", "alpha"], k=5, mode="and").count() == 0


def test_multireader_per_leaf_deletes(spark, mr_setup):
    rows, full, ha, hb = mr_setup
    want = _hits(Searcher(spark, full).search(["gamma"], k=400))
    victims = [want[0][0], want[1][0]]
    # apply the same deletes to the union index and the owning halves
    delete_docs(spark, full, victims)
    for v in victims:
        delete_docs(spark, ha if v < 200 else hb, [v])
    got = _hits(MultiSearcher(spark, [ha, hb]).search(["gamma"], k=400))
    want2 = _hits(Searcher(spark, full).search(["gamma"], k=400))
    assert got == want2
    assert not (set(victims) & {d for d, _ in got})


def test_multireader_guards(spark, mr_setup, tmp_path):
    rows, full, ha, hb = mr_setup
    with pytest.raises(ValueError, match="at least one"):
        MultiSearcher(spark, [])
    v2 = str(tmp_path / "v2")
    df = spark.createDataFrame(rows[:50])
    build_index(spark, df, v2, doc_col="doc_id", n_shards=2,
                text_fields={"text": "text"}, analyzer="standard_v2")
    with pytest.raises(ValueError, match="analyzer"):
        MultiSearcher(spark, [ha, v2])
    with pytest.raises(ValueError, match="bases"):
        MultiSearcher(spark, [ha, hb], bases=[0])


def test_multireader_bases_offsets(spark, mr_setup, tmp_path):
    # dense key_cols sub-indexes + docBase offsets == the doc_col union
    # (self-contained slice: other tests mutate the shared fixtures)
    rows, *_ = mr_setup
    sub = rows[:100]
    df = spark.createDataFrame(sub)
    da, db = str(tmp_path / "da"), str(tmp_path / "db")
    fu = str(tmp_path / "fu")
    build_index(spark, df.filter("doc_id < 60"), da, key_cols=["doc_id"],
                n_shards=4, text_fields={"text": "text"})
    build_index(spark, df.filter("doc_id >= 60"), db, key_cols=["doc_id"],
                n_shards=4, text_fields={"text": "text"})
    build_index(spark, df, fu, doc_col="doc_id", n_shards=4,
                text_fields={"text": "text"})
    # key order == doc_id order, so dense ids are doc_id and doc_id-60
    got = _hits(MultiSearcher(spark, [da, db], bases=[0, 60])
                .search(["gamma", "zeta"], k=60))
    want = _hits(Searcher(spark, fu).search(["gamma", "zeta"], k=60))
    assert got == want


BOOL_CASES = [
    # mixed occurs
    dict(clauses=[{"term": "alpha", "occur": "must"},
                  {"term": "gamma", "occur": "should"},
                  {"term": "kappa", "occur": "should"},
                  {"term": "pi", "occur": "must_not"}]),
    # msm=2 disjunction with a boost
    dict(clauses=[{"term": "alpha", "occur": "should"},
                  {"term": "beta", "occur": "should", "boost": 2.0},
                  {"term": "delta", "occur": "should"}],
         min_should_match=2),
    # nested sub-query + phrase clause
    dict(clauses=[{"clauses": [{"term": "gamma", "occur": "should"},
                               {"term": "zeta", "occur": "should"}],
                   "occur": "must"},
                  {"phrase": ["alpha", "beta"], "occur": "should"}]),
    # dismax combine
    dict(clauses=[{"term": "alpha", "occur": "should"},
                  {"term": "beta", "occur": "should"}],
         dismax_tie=0.3),
    # numeric doc-values range over the leaves' own stored tables
    dict(clauses=[{"term": "alpha", "occur": "must"}],
         numeric=[{"field": "n_chars", "lo": 60, "hi": 160}]),
]


@pytest.mark.parametrize("case", range(len(BOOL_CASES)))
def test_multireader_boolean_identical_to_union_index(spark, mr_setup, case):
    _, full, ha, hb = mr_setup
    kw = BOOL_CASES[case]
    want = _hits(Searcher(spark, full).search_boolean(k=80, **kw))
    got = _hits(MultiSearcher(spark, [ha, hb]).search_boolean(k=80, **kw))
    assert got == want
    assert len(want) > 0


def test_multireader_boolean_search_after(spark, mr_setup):
    _, full, ha, hb = mr_setup
    clauses = [{"term": "gamma", "occur": "should"},
               {"term": "zeta", "occur": "should"}]
    ms = MultiSearcher(spark, [ha, hb])
    page1 = _hits(ms.search_boolean(clauses, k=10))
    cursor = (float(page1[-1][1]), page1[-1][0])
    got = _hits(ms.search_boolean(clauses, k=10, after=cursor))
    want = _hits(Searcher(spark, full).search_boolean(clauses, k=10, after=cursor))
    assert got == want and len(got) == 10
