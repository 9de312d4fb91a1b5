"""Add-k unigram LM perplexity (CCNet quality-bucketing stand-in).

Oracle: hand-computed math.log chain over the same corpus counts.
Also pins the directional contract CCNet relies on: repetitive
head-like text scores LOWER perplexity than rare-token text.
"""

import math

import numpy as np
from collections import Counter

import pytest

from fdblucene_spark.operators import textstats

DOCS = [
    (0, "the the the the cat"),
    (1, "the cat sat"),
    (2, "zyx wvu tsr qpo"),
    (3, ""),
    (4, "the cat the cat"),
]
K = 0.5


def _expected():
    toks = {d: [t for t in txt.lower().split() if t] for d, txt in DOCS}
    cnt = Counter(t for ts in toks.values() for t in ts)
    n_total = sum(cnt.values())
    v = len(cnt)
    out = {}
    for d, ts in toks.items():
        if not ts:
            out[d] = (0, None, None)
            continue
        # per-token logp quantizes to float32 before the sum (the
        # engine's addition-order-determinism contract)
        lp = sum(
            np.float64(np.float32(math.log((cnt[t] + K) / (n_total + K * (v + 1)))))
            for t in ts
        )
        out[d] = (len(ts), lp, math.exp(-lp / len(ts)))
    return out


def test_perplexity_matches_hand_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = (
        textstats.lm_perplexity(df, "doc_id", "text", add_k=K)
        .toPandas()
        .set_index("doc_id")
    )
    for d, (n, lp, ppl) in _expected().items():
        assert int(got.loc[d, "n_tokens"]) == n
        if lp is None:
            assert got.loc[d, ["logprob", "ppl"]].isna().all()
        else:
            assert abs(float(got.loc[d, "logprob"]) - lp) < 1e-10
            assert abs(float(got.loc[d, "ppl"]) - ppl) < 1e-9


def test_perplexity_orders_head_before_tail(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = (
        textstats.lm_perplexity(df, "doc_id", "text")
        .toPandas()
        .set_index("doc_id")["ppl"]
    )
    # doc 0 repeats the corpus's most frequent token; doc 2 is all
    # hapaxes — the CCNet head/tail ordering must hold
    assert float(got.loc[0]) < float(got.loc[1]) < float(got.loc[2])


def test_perplexity_rejects_bad_k(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        textstats.lm_perplexity(df, "doc_id", "text", add_k=0.0)
