"""Hash-bucket linear quality classifier (fastText-style apply).

Oracles: a pure-Python replica of the md5 feature-hash + weight +
mean + sigmoid chain (hashlib, no Spark), and the equivalence of the
two model modes — derived pseudo-weights vs an explicit broadcast
weights TABLE holding the same values (the production shape).
"""

import hashlib
import math

import numpy as np
import pytest

from fdblucene_spark.operators import curation
from fdblucene_spark.plans.explain import assert_no_rowwise_python

DOCS = [
    (0, "alpha beta gamma alpha"),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "alpha"),
    (3, "data pipeline quality filter data pipeline"),
    (4, ""),
    (5, "Mixed CASE Tokens mixed case tokens"),
]
B = 64
SALT = "clf-v1"


def _u01(s: str) -> float:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / float(16 ** 8)


def _tok(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]


def _feats(text: str) -> list[str]:
    ts = _tok(text)
    bigrams = (
        [" ".join(ts[i : i + 2]) for i in range(len(ts) - 1)]
        if len(ts) >= 2
        else [" ".join(ts)]
    )
    return ts + bigrams


def _expected(bias=0.0):
    out = {}
    for did, text in DOCS:
        fs = _feats(text)
        fs = [f for f in fs]  # shingles fallback of empty text is ""
        ws = []
        for f in fs:
            b = int(hashlib.md5(f"{SALT}:{f}".encode()).hexdigest()[:8], 16) % B
            # float32-quantized weights (order-independent sums)
            ws.append(float(np.float32(_u01(f"{SALT}:w:{b}") * 2.0 - 1.0)))
        raw = bias + (sum(ws) / len(ws) if ws else 0.0)
        out[did] = (len(ws), 1.0 / (1.0 + math.exp(-raw)))
    return out


def test_classifier_matches_hand_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = (
        curation.classifier_scores(df, "doc_id", "text", n_buckets=B)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    want = _expected()
    for did, (nf, score) in want.items():
        assert int(got.loc[did, "n_feats"]) == nf, did
        assert abs(float(got.loc[did, "score"]) - score) < 1e-12, did
        assert bool(got.loc[did, "label"]) == (score >= 0.5), did


def test_weights_table_mode_equals_derived(spark):
    """An explicit (bucket, weight) model table with the derived
    values must reproduce the derived-mode scores exactly — the
    production path (broadcast trained model) and the gate path
    (self-contained pseudo-weights) share every float op."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    wrows = [(b, _u01(f"{SALT}:w:{b}") * 2.0 - 1.0) for b in range(B)]
    wdf = spark.createDataFrame(wrows, "bucket long, weight double")
    a = (
        curation.classifier_scores(df, "doc_id", "text", n_buckets=B)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        curation.classifier_scores(df, "doc_id", "text", n_buckets=B, weights=wdf)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert a["n_feats"].tolist() == b["n_feats"].tolist()
    assert np.allclose(a["score"], b["score"], rtol=0, atol=1e-12)
    assert a["label"].tolist() == b["label"].tolist()


def test_weights_table_broadcasts_and_no_rowwise_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    wdf = spark.createDataFrame(
        [(b, 0.5) for b in range(B)], "bucket long, weight double"
    )
    out = curation.classifier_scores(df, "doc_id", "text", n_buckets=B, weights=wdf)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert_no_rowwise_python(out)
    assert_no_rowwise_python(
        curation.classifier_scores(df, "doc_id", "text", n_buckets=B)
    )


def test_bias_and_threshold(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = (
        curation.classifier_scores(df, "doc_id", "text", n_buckets=B, bias=3.0, threshold=0.9)
        .toPandas()
        .set_index("doc_id")
    )
    want = _expected(bias=3.0)
    for did, (_, score) in want.items():
        assert abs(float(got.loc[did, "score"]) - score) < 1e-12
        assert bool(got.loc[did, "label"]) == (score >= 0.9)
