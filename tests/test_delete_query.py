"""delete_by_query (IndexWriter.deleteDocuments(Query)) laws.

Query deletes resolve against the current snapshot and keep liveDocs
semantics: deleted docs leave MATCHING but corpus stats (df, avgdl,
N) stay full — so the oracle for a post-delete search is the plain
full-stats BM25 with the deleted docs dropped, which is exactly
oracle.search(..., not_terms=[deleted-term]).
"""

import numpy as np
import pytest

from fdblucene_spark import oracle
from fdblucene_spark.functions.analysis import tokenize_text
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.deletes import delete_by_query
from fdblucene_spark.operators.query import Searcher
from fdblucene_spark.sources.manifest import IndexCatalog

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


@pytest.fixture(scope="module")
def delq_index(spark, tmp_path_factory):
    rng = np.random.default_rng(31)
    rows = []
    for i in range(150):
        ln = int(rng.integers(2, 20))
        w = 1.0 / np.arange(1, len(WORDS) + 1)
        rows.append(
            {"doc_id": i, "text": " ".join(rng.choice(WORDS, size=ln, p=w / w.sum()))}
        )
    root = str(tmp_path_factory.mktemp("delq") / "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=4)
    delete_by_query(spark, root, [{"term": "gamma", "occur": "must"}])
    return rows, root


def test_delete_by_query_removes_matches(spark, delq_index):
    rows, root = delq_index
    s = Searcher(spark, root)
    assert s.search(["gamma"], k=300, mode="or").count() == 0
    victims = {r["doc_id"] for r in rows if "gamma" in tokenize_text(r["text"])}
    assert victims
    survivors = {int(r["doc"]) for r in s.search(["alpha"], k=300, mode="or").collect()}
    assert not (survivors & victims)


def test_delete_by_query_keeps_full_corpus_stats(spark, delq_index):
    """liveDocs semantics: scores after the query delete are the
    full-stats scores minus deleted docs == oracle not_terms twin."""
    rows, root = delq_index
    oidx = oracle.build_oracle_index(
        [r["doc_id"] for r in rows], [r["text"] for r in rows]
    )
    s = Searcher(spark, root)
    got = [(int(r["doc"]), np.float32(r["score"]))
           for r in s.search(["alpha", "zeta"], k=80, mode="or").collect()]
    want = [(d, np.float32(sc)) for d, sc in
            oracle.search(oidx, ["alpha", "zeta"], 80, "or", not_terms=["gamma"])]
    assert got == want


def test_delete_by_query_idempotent(spark, delq_index):
    _, root = delq_index
    before = IndexCatalog(root).load().properties.get("n_deletes")
    delete_by_query(spark, root, [{"term": "gamma", "occur": "must"}])
    after = IndexCatalog(root).load().properties.get("n_deletes")
    assert before == after


def test_delete_by_query_boolean_shape(spark, delq_index):
    """must_not composes: deleting (must zeta, must_not gamma) removes
    zeta-only docs but never resurrects anything."""
    rows, root = delq_index
    delete_by_query(spark, root, [
        {"term": "zeta", "occur": "must"},
        {"term": "gamma", "occur": "must_not"},
    ])
    s = Searcher(spark, root)  # searchers pin snapshots: open AFTER
    assert s.search(["zeta"], k=300, mode="or").count() == 0
    live = {int(r["doc"]) for r in s.search(["alpha"], k=300, mode="or").collect()}
    gone = {r["doc_id"] for r in rows
            if "zeta" in tokenize_text(r["text"]) or "gamma" in tokenize_text(r["text"])}
    assert not (live & gone)
