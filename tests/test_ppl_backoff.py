"""Trained bigram stupid-backoff perplexity (textstats.lm_perplexity_backoff).

Laws:
- exact-float hand oracle (numpy float32 quantize + float64 sum,
  the module's determinism chain) for self-trained AND cross-domain
  train corpora;
- self-training never backs off (every scored bigram is in the
  model by construction);
- out-of-domain text scores strictly higher perplexity than
  in-domain text under a cross-domain model;
- byte-identity vs the DuckDB twin (train_pred mirror);
- domain guards.
"""

import math
import re

import duckdb
import numpy as np
import pytest

from fdblucene_spark.operators.textstats import (
    lm_perplexity_backoff,
    lm_perplexity_backoff_sql,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran"),
    (2, "dogs chase the cat quickly"),
    (3, ""),
    (4, None),
    (5, "zebra unseen words entirely novel"),
    (6, "the cat sat on the mat again and again"),
]


def _tok(text):
    if text is None:
        return []
    return [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]


def _oracle(train_ids, alpha=0.4, add_k=0.5):
    c1, c2 = {}, {}
    for i, t in DOCS:
        if i not in train_ids:
            continue
        ts = _tok(t)
        for x in ts:
            c1[x] = c1.get(x, 0) + 1
        for a, b in zip(ts, ts[1:]):
            g = f"{a} {b}"
            c2[g] = c2.get(g, 0) + 1
    n_total, v = float(sum(c1.values())), float(len(c1))
    out = {}
    for i, t in DOCS:
        ts = _tok(t)
        if not ts:
            out[i] = (0, 0, None, None)
            continue
        s, nb = np.float64(0.0), 0
        for j, x in enumerate(ts):
            p_uni = (c1.get(x, 0) + add_k) / (n_total + add_k * (v + 1.0))
            if j == 0:
                lp = math.log(p_uni)
            elif f"{ts[j-1]} {x}" in c2 and ts[j - 1] in c1:
                lp = math.log(c2[f"{ts[j-1]} {x}"] / float(c1[ts[j - 1]]))
            else:
                nb += 1
                lp = math.log(alpha * p_uni)
            s += np.float64(np.float32(lp))
        out[i] = (len(ts), nb, float(s), math.exp(-float(s) / len(ts)))
    return out


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("train_ids", [frozenset(range(7)), frozenset({0, 2, 4, 6})])
def test_ppl_backoff_hand_oracle(spark, docs, train_ids):
    train = docs.filter(docs.doc_id.isin(list(train_ids)))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_backoff"], r["logprob"], r["ppl"])
        for r in lm_perplexity_backoff(docs, "doc_id", "text", train_df=train).collect()
    }
    exp = _oracle(train_ids)
    for i in exp:
        assert got[i][:2] == exp[i][:2], i
        # logprob is exact (f32 quantize -> exact f64 sum); the final
        # exp() may differ by 1 ulp between JVM Math.exp and libm
        assert (got[i][2] is None) == (exp[i][2] is None) and (
            got[i][2] is None or got[i][2] == exp[i][2]
        ), (i, got[i], exp[i])
        assert (got[i][3] is None) == (exp[i][3] is None) and (
            got[i][3] is None or math.isclose(got[i][3], exp[i][3], rel_tol=1e-14)
        ), (i, got[i], exp[i])


def test_ppl_backoff_self_train_never_backs_off(spark, docs):
    for r in lm_perplexity_backoff(docs, "doc_id", "text").collect():
        assert r["n_backoff"] == 0, r


def test_ppl_backoff_out_of_domain_scores_higher(spark, docs):
    train = docs.filter("doc_id IN (0, 1, 2, 6)")
    got = {r["doc_id"]: r["ppl"] for r in lm_perplexity_backoff(
        docs, "doc_id", "text", train_df=train
    ).collect()}
    assert got[5] > 3 * max(got[0], got[2], got[6])


def test_ppl_backoff_duckdb_twin(spark, docs):
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["n_backoff"], r["logprob"], r["ppl"])
        for r in lm_perplexity_backoff(
            docs, "doc_id", "text", train_df=docs.filter("doc_id % 2 = 0")
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", DOCS)
    twin = sorted(
        map(
            tuple,
            con.execute(
                lm_perplexity_backoff_sql("tt", "doc_id", "text", train_pred="doc_id % 2 = 0")
            ).fetchall(),
        )
    )
    assert len(got) == len(twin)
    for a, b in zip(got, twin):
        for x, y in zip(a, b):
            if isinstance(x, float) and x is not None and y is not None:
                assert x == y or abs(x - y) < 1e-12, (a, b)
            else:
                assert x == y, (a, b)


def test_ppl_backoff_guards(spark, docs):
    with pytest.raises(ValueError, match="alpha"):
        lm_perplexity_backoff(docs, "doc_id", "text", alpha=0.0)
    with pytest.raises(ValueError, match="add_k"):
        lm_perplexity_backoff(docs, "doc_id", "text", add_k=0.0)
    with pytest.raises(ValueError, match="alpha"):
        lm_perplexity_backoff_sql("tt", "doc_id", "text", alpha=1.5)
