"""Naive-Bayes classifier (Lucene classification module analogue).

Hand oracle replicates the exact float chain: f32 per-(token, class)
log-probs (add-1 smoothing over tokens_c + V), f64 sum, f32 prior.
"""

import numpy as np
import pytest

from fdblucene_spark.functions.analysis import tokenize_text
from fdblucene_spark.operators.classify import (
    naive_bayes_classify, naive_bayes_scores,
)

ROWS = [
    {"doc_id": 0, "cls": "code", "text": "def parse return parse def"},
    {"doc_id": 1, "cls": "code", "text": "class method return self"},
    {"doc_id": 2, "cls": "code", "text": "import numpy array def"},
    {"doc_id": 3, "cls": "prose", "text": "the quick brown fox jumps"},
    {"doc_id": 4, "cls": "prose", "text": "a tale of two cities"},
    {"doc_id": 5, "cls": "prose", "text": "the fox and the hound"},
    {"doc_id": 6, "cls": "prose", "text": ""},
]


def _hand_scores(train, target):
    classes = sorted({r["cls"] for r in train})
    n_docs = float(len(train))
    vocab = set()
    toks_c, docs_c, counts = {}, {}, {}
    for r in train:
        docs_c[r["cls"]] = docs_c.get(r["cls"], 0) + 1
        ts = tokenize_text(r["text"])
        vocab.update(ts)
        toks_c[r["cls"]] = toks_c.get(r["cls"], 0) + len(ts)
        for t in ts:
            counts[(r["cls"], t)] = counts.get((r["cls"], t), 0) + 1
    v = float(len(vocab))
    out = {}
    for r in target:
        ts = tokenize_text(r["text"])
        for c in classes:
            prior = np.float32(np.log(docs_c[c] / n_docs))
            s = 0.0
            for t in ts:
                tf = counts.get((c, t), 0)
                s += float(np.float32(np.log((tf + 1.0) / (toks_c.get(c, 0) + v))))
            out[(r["doc_id"], c)] = float(prior) + s
    return out


def test_scores_match_hand_oracle(spark):
    df = spark.createDataFrame(ROWS)
    got = naive_bayes_scores(df, df, "doc_id", "text", "cls").toPandas()
    want = _hand_scores(ROWS, ROWS)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert want[(int(r["doc_id"]), r["class"])] == pytest.approx(
            float(r["score"]), abs=0, rel=0
        ), (r["doc_id"], r["class"])


def test_classify_planted_and_ties(spark):
    df = spark.createDataFrame(ROWS)
    pred = {
        int(r["doc_id"]): r["pred"]
        for r in naive_bayes_classify(df, df, "doc_id", "text", "cls").collect()
    }
    assert pred[0] == "code" and pred[1] == "code" and pred[2] == "code"
    assert pred[3] == "prose" and pred[5] == "prose"
    # empty doc: prior-only -> most frequent class, tie-break class asc
    want = _hand_scores(ROWS, ROWS)
    best = max(["code", "prose"], key=lambda c: (want[(6, c)], ), default=None)
    # replicate the (score desc, class asc) rule exactly
    best = sorted(["code", "prose"], key=lambda c: (-want[(6, c)], c))[0]
    assert pred[6] == best == "prose"


def test_separate_train_target(spark):
    train = spark.createDataFrame(ROWS)
    tgt_rows = [
        {"doc_id": 100, "text": "def return import"},
        {"doc_id": 101, "text": "the fox"},
        {"doc_id": 102, "text": "zzz unseen tokens only"},
    ]
    tgt = spark.createDataFrame(tgt_rows)
    got = naive_bayes_classify(train, tgt, "doc_id", "text", "cls").toPandas()
    pred = {int(r["doc_id"]): r["pred"] for _, r in got.iterrows()}
    assert pred[100] == "code" and pred[101] == "prose"
    # all-unseen tokens: per-class floor x 3 + prior — well-defined
    want = _hand_scores(ROWS, tgt_rows)
    best = sorted(["code", "prose"], key=lambda c: (-want[(102, c)], c))[0]
    assert pred[102] == best


# ------------------------------------------------- KNN classifier (index-side)


def test_classify_knn_votes_match_oracle(spark, tmp_path_factory):
    from fdblucene_spark import oracle
    from fdblucene_spark.operators.build import build_index
    from fdblucene_spark.operators.query import Searcher

    rng = np.random.default_rng(41)
    words = ["alpha", "beta", "gamma", "delta", "zeta"]
    rows = []
    for i in range(120):
        ln = int(rng.integers(2, 16))
        w = 1.0 / np.arange(1, len(words) + 1)
        rows.append({
            "doc_id": i,
            "cls": "even" if i % 2 == 0 else "odd",
            "text": " ".join(rng.choice(words, size=ln, p=w / w.sum())),
        })
    root = str(tmp_path_factory.mktemp("knn") / "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id",
                n_shards=4, stored_fields={"cls": "cls"})
    s = Searcher(spark, root)
    k = 15
    got = s.classify_knn("alpha alpha zeta zeta", "cls", k=k,
                         min_term_freq=2, min_doc_freq=1).toPandas()
    oidx = oracle.build_oracle_index([r["doc_id"] for r in rows],
                                     [r["text"] for r in rows])
    top = oracle.search(oidx, ["alpha", "zeta"], k, "or")
    want = {}
    for d, _ in top:
        c = rows[d]["cls"]
        want[c] = want.get(c, 0) + 1
    assert {r["class"]: int(r["votes"]) for _, r in got.iterrows()} == want
    for _, r in got.iterrows():
        assert np.float32(r["score"]) == np.float32(int(r["votes"]) / float(k))
    # deterministic order: votes desc, then class asc among equal votes
    v = list(got["votes"])
    assert v == sorted(v, reverse=True)
