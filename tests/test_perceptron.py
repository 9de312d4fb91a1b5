"""Batch boolean perceptron (BooleanPerceptronClassifier analogue):
exact integer-arithmetic oracle in pure Python — weights init to ttf,
threshold = sumDocFreq / 2 (doubled-integer compare), per-epoch batch
error updates. Everything BIGINT, so Spark and the oracle must agree
bit-for-bit regardless of partitioning."""

import re

import pytest

from fdblucene_spark.operators.classify import (
    perceptron_classify,
    perceptron_sql,
    perceptron_weights,
)

ROWS = [
    # class True docs lean on 'spark'/'index'; False docs on 'cat'/'dog'
    (0, "spark index spark merge", True),
    (1, "index spark index", True),
    (2, "spark merge index index", True),
    (3, "cat dog cat", False),
    (4, "dog cat dog merge", False),
    (5, "cat cat dog", False),
    (6, "spark cat", True),
    (7, "dog index", False),
    (8, "", False),
]


def _toks(s):
    return re.findall(r"[a-z0-9_]+", s.lower())


def _oracle(rows, epochs):
    tf = {}  # (pid, t) -> tf
    cls = {}
    for pid, text, c in rows:
        cls[pid] = c
        for t in _toks(text):
            tf[(pid, t)] = tf.get((pid, t), 0) + 1
    sdf = len(tf)
    w = {}
    for (pid, t), f in tf.items():
        w[t] = w.get(t, 0) + f
    for _ in range(epochs):
        err = {}
        for pid, _, c in rows:
            o = sum(w.get(t, 0) * f for (p, t), f in tf.items() if p == pid)
            err[pid] = int(c) - int(2 * o >= sdf)
        delta = {}
        for (pid, t), f in tf.items():
            delta[t] = delta.get(t, 0) + err[pid] * f
        for t in w:
            w[t] = w[t] + delta.get(t, 0)
    out = {}
    for pid, _, _ in rows:
        o = sum(w.get(t, 0) * f for (p, t), f in tf.items() if p == pid)
        out[pid] = (2 * o >= sdf, 2 * o - sdf)
    return w, out, sdf


@pytest.mark.parametrize("epochs", [1, 2, 3])
def test_perceptron_exact_integer_oracle(spark, epochs):
    df = spark.createDataFrame(
        [{"doc_id": p, "text": t, "cls": c} for p, t, c in ROWS]
    )
    want_w, want_out, _ = _oracle(ROWS, epochs)
    got_w = {
        r["term"]: r["weight"]
        for r in perceptron_weights(df, "text", "cls", epochs, id_col="doc_id").collect()
    }
    assert got_w == want_w
    got = {
        r["doc_id"]: (r["pred"], r["margin"])
        for r in perceptron_classify(
            df, df, "doc_id", "text", "cls", epochs, train_id_col="doc_id"
        ).collect()
    }
    assert got == want_out


def test_perceptron_learns_planted_split(spark):
    # after training, the planted vocabulary split must classify the
    # pure docs correctly (margin signs separate)
    df = spark.createDataFrame(
        [{"doc_id": p, "text": t, "cls": c} for p, t, c in ROWS]
    )
    got = {
        r["doc_id"]: r["pred"]
        for r in perceptron_classify(
            df, df, "doc_id", "text", "cls", 3, train_id_col="doc_id"
        ).collect()
    }
    _, want_out, _ = _oracle(ROWS, 3)
    acc = sum(got[p] == c for p, _, c in ROWS) / len(ROWS)
    want_acc = sum(want_out[p][0] == c for p, _, c in ROWS) / len(ROWS)
    assert acc == want_acc  # engine is exactly the batch rule, no better/worse
    assert acc >= 0.75  # and the rule does learn the planted split


def test_perceptron_unseen_terms_and_empty_docs(spark):
    train = spark.createDataFrame(
        [{"doc_id": p, "text": t, "cls": c} for p, t, c in ROWS]
    )
    target = spark.createDataFrame(
        [{"doc_id": 100, "text": "zzz qqq"}, {"doc_id": 101, "text": ""}]
    )
    got = {
        r["doc_id"]: (r["pred"], r["margin"])
        for r in perceptron_classify(
            train, target, "doc_id", "text", "cls", 2, train_id_col="doc_id"
        ).collect()
    }
    _, _, sdf = _oracle(ROWS, 2)
    # unseen terms and empty docs: out = 0 -> margin = -sdf, pred False
    assert got[100] == (False, -sdf)
    assert got[101] == (False, -sdf)


def test_perceptron_sql_twin_matches(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    pdf = pd.DataFrame([{"doc_id": p, "text": t, "cls": c} for p, t, c in ROWS])
    con = duckdb.connect()
    con.register("docs", pdf)
    twin = con.sql(
        perceptron_sql("docs", "doc_id", "text", "cls", epochs=2)
    ).df()
    df = spark.createDataFrame(pdf)
    got = (
        perceptron_classify(df, df, "doc_id", "text", "cls", 2, train_id_col="doc_id")
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(twin["doc_id"]) == list(got["doc_id"])
    assert [bool(x) for x in twin["pred"]] == [bool(x) for x in got["pred"]]
    assert [int(x) for x in twin["margin"]] == [int(x) for x in got["margin"]]


def test_perceptron_guards(spark):
    df = spark.createDataFrame([{"doc_id": 0, "text": "a", "cls": True}])
    with pytest.raises(ValueError, match="epochs"):
        perceptron_weights(df, "text", "cls", 0)
