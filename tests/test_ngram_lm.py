"""FreeTextSuggester (n-gram LM, stupid backoff ALPHA=0.4).

Oracle: pure-Python n-gram counts over the fixture corpus and the
same backoff arithmetic in plain floats.
"""

import numpy as np
import pytest

from fdblucene_spark.functions.analysis import tokenize_text
from fdblucene_spark.operators.ngram_lm import ALPHA, FreeTextSuggester, build_ngram_model

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown cat sleeps",
    "the quick red fox runs",
    "a lazy dog naps under the tree",
    "quick brown foxes are quick",
    "the dog and the fox",
]


@pytest.fixture(scope="module")
def model(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ftx") / "lm")
    df = spark.createDataFrame([(i, t) for i, t in enumerate(DOCS)],
                               "doc_id long, text string")
    meta = build_ngram_model(spark, df, "text", path, order=3)
    return path, meta


def _counts(order):
    grams = {}
    for t in DOCS:
        ts = tokenize_text(t)
        for i in range(len(ts) - order + 1):
            g = " ".join(ts[i:i + order])
            grams[g] = grams.get(g, 0) + 1
    return grams


def _oracle(context, k, prefix=""):
    ctx = tokenize_text(context) if context else []
    c1, c2, c3 = _counts(1), _counts(2), _counts(3)
    total = sum(c1.values())
    lmax = min(len(ctx), 2)
    best = {}
    for lvl in range(lmax, -1, -1):
        w = ALPHA ** (lmax - lvl)
        if lvl == 0:
            for g, n in c1.items():
                if g.startswith(prefix):
                    best.setdefault(g, w * (n / total))
        else:
            cpre = " ".join(ctx[-lvl:])
            table = c2 if lvl == 1 else c3
            denom = (c1 if lvl == 1 else c2).get(cpre)
            if not denom:
                continue
            for g, n in table.items():
                if g.startswith(cpre + " " + prefix):
                    tok = g[len(cpre) + 1:]
                    if " " not in tok:
                        best.setdefault(tok, w * (n / denom))
    out = sorted(best.items(), key=lambda p: (-p[1], p[0]))[:k]
    return out


@pytest.mark.parametrize("context,prefix", [
    ("the quick", ""),
    ("the quick", "b"),
    ("quick", ""),
    ("zzz unseen context", ""),   # full backoff to unigrams
    ("", "f"),                    # popularity completion
])
def test_freetext_matches_oracle(spark, model, context, prefix):
    path, _ = model
    got = [(r["token"], r["score"])
           for r in FreeTextSuggester(spark, path).lookup(context, k=8,
                                                          prefix=prefix).collect()]
    want = _oracle(context, 8, prefix)
    assert [t for t, _ in got] == [t for t, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12)


def test_freetext_longest_context_wins(spark, model):
    path, _ = model
    # after "the quick": "brown" dominates via the trigram level (2/3),
    # and its score must NOT be the backed-off bigram estimate
    got = {r["token"]: r["score"]
           for r in FreeTextSuggester(spark, path).lookup("the quick", k=5).collect()}
    assert got["brown"] == pytest.approx(2 / 3, rel=1e-12)


def test_freetext_guards(spark, model, tmp_path):
    path, meta = model
    assert meta["order"] == 3 and meta["total_tokens"] > 0
    s = FreeTextSuggester(spark, path)
    with pytest.raises(ValueError):
        s.lookup("the", k=0)
    with pytest.raises(ValueError):
        s.lookup("the", prefix="two words")
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        build_ngram_model(spark, df, "text", str(tmp_path / "bad"), order=1)
