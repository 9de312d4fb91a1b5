"""standard_v4 shingle analyzer (Lucene ShingleFilter, maxShingleSize=2):
bigrams indexed alongside unigrams — the classic phrase accelerator.

Laws pinned here: a 2-word phrase query equals ONE bigram-term lookup
(same doc set); dl/norms count unigrams only (discountOverlaps=true),
so unigram BM25 scores are bit-identical to a standard_v1 index over
the same corpus; shingle positions are the first member's ordinal.
"""

import numpy as np
import pytest

from fdblucene_spark.functions import bm25
from fdblucene_spark.functions.analysis import tokenize_text
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

WORDS = ["red", "blue", "green", "fox", "dog", "owl"]


@pytest.fixture(scope="module")
def sh_rows():
    rng = np.random.default_rng(17)
    return [
        {"doc_id": i,
         "text": " ".join(rng.choice(WORDS, size=int(rng.integers(2, 16))))}
        for i in range(150)
    ]


@pytest.fixture(scope="module")
def sh_index(spark, sh_rows, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("shingle") / "idx")
    build_index(spark, spark.createDataFrame(sh_rows), root, doc_col="doc_id",
                n_shards=4, analyzer="standard_v4")
    return Searcher(spark, root)


def test_bigram_term_equals_phrase_set(spark, sh_rows, sh_index):
    """search(['red fox']) on the v4 index == the phrase match set."""
    got = {int(r["doc"]) for r in sh_index.search(["red fox"], 500).collect()}
    want = set()
    for r in sh_rows:
        ts = r["text"].split()
        if any(a == "red" and b == "fox" for a, b in zip(ts, ts[1:])):
            want.add(r["doc_id"])
    assert got == want and want


def test_unigram_scores_match_v1_index(spark, sh_rows, sh_index, tmp_path_factory):
    """discountOverlaps law: shingles must not move dl/norms, so a
    unigram query scores bit-identically to a v1 index. df/idf of
    unigrams are untouched too (shingles are distinct terms)."""
    root1 = str(tmp_path_factory.mktemp("v1") / "idx")
    build_index(spark, spark.createDataFrame(sh_rows), root1, doc_col="doc_id",
                n_shards=4, analyzer="standard_v1")
    s1 = Searcher(spark, root1)
    a = [(r["doc"], r["score"]) for r in sh_index.search(["fox", "owl"], 200).collect()]
    b = [(r["doc"], r["score"]) for r in s1.search(["fox", "owl"], 200).collect()]
    assert a == b
    # avgdl/corpus stats identical (dl counts unigrams only)
    assert sh_index.manifest.sum_dl == s1.manifest.sum_dl
    assert sh_index.manifest.n_docs == s1.manifest.n_docs


def test_shingle_positions_are_first_member_ordinal(spark, sh_index, sh_rows):
    """Span/phrase machinery sees the bigram at its first member's
    position: phrase ['red fox', 'dog'] with the v4 analyzer matches
    docs where 'dog' directly follows... i.e. positions(bigram)+2 ==
    positions continue to work — asserted via the tokenize oracle."""
    # engine-side check through term_vectors: the bigram's position
    # equals the unigram pair's start ordinal
    doc = next(r["doc_id"] for r in sh_rows
               if any(a == "red" and b == "fox"
                      for a, b in zip(r["text"].split(), r["text"].split()[1:])))
    tv = {r["term"]: r for r in sh_index.term_vectors([doc], "text").collect()}
    ts = [t for t in sh_rows[doc]["text"].split()]
    first = next(i for i, (a, b) in enumerate(zip(ts, ts[1:]))
                 if a == "red" and b == "fox")
    assert first in list(tv["red fox"]["positions"])
    assert tv["red fox"]["positions"] == sorted(tv["red fox"]["positions"])


def test_tokenize_oracle_and_guards(spark, sh_rows):
    assert tokenize_text("Red fox runs", "standard_v4") == [
        "red", "fox", "runs", "red fox", "fox runs"]
    df = spark.createDataFrame(sh_rows[:5])
    import pytest as _pt
    with _pt.raises(ValueError, match="shingle"):
        build_index(spark, df, "/tmp/never-used-shingle-off",
                    doc_col="doc_id", analyzer="standard_v4",
                    store_offsets=True)
