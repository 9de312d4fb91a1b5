"""BM25 hard-negative training triples (similarity.bm25_hard_triples).

Laws:
- pos/neg are EXACTLY the rank-1 and rank-neg_rank docs of the
  engine's own full ranking (search() is the referee);
- queries with fewer than neg_rank hits drop (no partial triples);
- one batched job serves every query (seek counter);
- guards.
"""

import numpy as np
import pytest

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher
from fdblucene_spark.operators.similarity import bm25_hard_triples

WORDS = ["ion", "flux", "core", "node", "edge", "path", "rare"]


@pytest.fixture(scope="module")
def tri_index(spark, tmp_path_factory):
    rng = np.random.default_rng(23)
    rows = [
        {"doc_id": i, "text": " ".join(rng.choice(WORDS[:6], size=int(rng.integers(4, 18))))}
        for i in range(120)
    ]
    rows.append({"doc_id": 120, "text": "rare rare ion"})  # 'rare' has 1 hit
    root = str(tmp_path_factory.mktemp("tri") / "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=2)
    return root


def test_triples_match_full_ranking(spark, tri_index):
    s = Searcher(spark, tri_index)
    queries = [("a", ["ion", "flux"]), ("b", ["core"]), ("c", ["edge", "path"])]
    got = {
        r["query_id"]: (r["pos_doc"], r["pos_score"], r["neg_doc"], r["neg_score"])
        for r in bm25_hard_triples(s, queries, neg_rank=7).collect()
    }
    for qid, terms in queries:
        full = s.search(terms, k=7, mode="or").collect()
        assert got[qid] == (
            full[0]["doc"],
            round(float(full[0]["score"]), 3),
            full[6]["doc"],
            round(float(full[6]["score"]), 3),
        ), qid


def test_triples_short_queries_drop(spark, tri_index):
    s = Searcher(spark, tri_index)
    out = bm25_hard_triples(s, [("r", ["rare"]), ("a", ["ion"])], neg_rank=7).collect()
    assert {r["query_id"] for r in out} == {"a"}  # 'rare' has 1 hit


def test_triples_one_seek_for_batch(spark, tri_index):
    s = Searcher(spark, tri_index)
    before = s._seek_count
    bm25_hard_triples(
        s, [("a", ["ion"]), ("b", ["flux"]), ("c", ["core", "node"])], neg_rank=5
    ).collect()
    assert s._seek_count == before + 1


def test_triples_guards(spark, tri_index):
    s = Searcher(spark, tri_index)
    with pytest.raises(ValueError, match="neg_rank"):
        bm25_hard_triples(s, [("a", ["ion"])], neg_rank=1)
    with pytest.raises(ValueError, match="queries"):
        bm25_hard_triples(s, [])
