"""Term-vector retrieval (Lucene TermVectors analogue).

Lucene's `IndexReader.getTermVectors(doc)` returns the per-doc
forward view of a field: terms with frequencies and positions. Here
the vector is derived from the inverted postings with a doc allow-set
prune; the oracle is brute force over the fixture rows (re-tokenize,
count, enumerate positions).
"""

import collections

import numpy as np
import pytest

from fdblucene_spark.functions.analysis import tokenize_text
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.deletes import delete_docs
from fdblucene_spark.operators.query import Searcher

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


@pytest.fixture(scope="module")
def tv_index(spark, tmp_path_factory):
    rng = np.random.default_rng(41)
    rows = []
    for i in range(120):
        ln = int(rng.integers(2, 30))
        w = 1.0 / np.arange(1, len(WORDS) + 1)
        text = " ".join(rng.choice(WORDS, size=ln, p=w / w.sum()))
        rows.append({"doc_id": i, "text": text, "role": ["user", "assistant"][i % 2]})
    root = str(tmp_path_factory.mktemp("tv") / "idx")
    build_index(
        spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=4,
        text_fields={"text": "text"}, keyword_fields={"role": "role"},
    )
    return rows, root


def _brute_vector(text):
    toks = tokenize_text(text)
    out = collections.defaultdict(list)
    for p, t in enumerate(toks):
        out[t].append(p)
    return {t: (len(ps), ps) for t, ps in out.items()}


def test_term_vectors_match_brute_force(spark, tv_index):
    rows, root = tv_index
    s = Searcher(spark, root)
    docs = [3, 17, 44, 101]
    got = s.term_vectors(docs).toPandas()
    assert set(got["doc"]) == set(docs)
    by_doc = {d: g for d, g in got.groupby("doc")}
    for d in docs:
        want = _brute_vector(rows[d]["text"])
        g = by_doc[d]
        assert set(g["term"]) == set(want)
        for _, r in g.iterrows():
            freq, pos = want[r["term"]]
            assert int(r["freq"]) == freq
            assert list(r["positions"]) == pos


def test_term_vectors_keyword_field(spark, tv_index):
    """StringField semantics: one untokenized value at position 0."""
    rows, root = tv_index
    s = Searcher(spark, root)
    got = s.term_vectors([5, 6], field="role").toPandas().sort_values("doc")
    assert list(got["term"]) == ["assistant", "user"]
    assert list(got["freq"]) == [1, 1]
    assert all(list(p) == [0] for p in got["positions"])


def test_term_vectors_without_positions(spark, tv_index):
    rows, root = tv_index
    s = Searcher(spark, root)
    got = s.term_vectors([9], with_positions=False).toPandas()
    want = _brute_vector(rows[9]["text"])
    assert {r["term"]: int(r["freq"]) for _, r in got.iterrows()} == {
        t: f for t, (f, _) in want.items()
    }
    assert all(p is None for p in got["positions"])


def test_term_vectors_empty_doc_set_rejected(spark, tv_index):
    _, root = tv_index
    with pytest.raises(ValueError):
        Searcher(spark, root).term_vectors([])


def test_term_vectors_survive_delete(spark, tv_index):
    """Lucene semantics: vectors of deleted docs stay readable until a
    physical repack drops the doc."""
    rows, root = tv_index
    delete_docs(Searcher(spark, root).spark, root, [17])
    s = Searcher(spark, root)
    got = s.term_vectors([17]).toPandas()
    want = _brute_vector(rows[17]["text"])
    assert set(got["term"]) == set(want)
