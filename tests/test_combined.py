"""CombinedFieldQuery (BM25F) vs a brute-force oracle.

The oracle recomputes the documented combined-field formula from the
fixture rows with the SAME bm25 helpers (LENGTH_TABLE / intToByte4 /
norm_cache32), so agreement pins the whole float chain, not just
ranks: weighted cross-field freqs, weighted re-quantized lengths,
max-df / max-docCount pseudo-stats.
"""

import re

import numpy as np
import pytest

from fdblucene_spark.functions import bm25
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

WORDS = ["ape", "bee", "cat", "dog", "elk", "fox"]
ROLES = ["user", "assistant", "tool", "ape"]  # "ape" collides with text vocab


@pytest.fixture(scope="module")
def comb_index(spark, tmp_path_factory):
    rng = np.random.default_rng(31)
    rows = []
    for i in range(220):
        ln = int(rng.integers(2, 18))
        text = " ".join(rng.choice(WORDS, size=ln))
        role = ROLES[i % 4] if i % 7 else None  # some docs lack the keyword
        rows.append({"doc_id": i, "text": text, "role": role})
    root = str(tmp_path_factory.mktemp("comb") / "idx")
    build_index(
        spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=4,
        text_fields={"text": "text"}, keyword_fields={"role": "role"},
    )
    return rows, Searcher(spark, root)


def _brute_combined(rows, terms, w_text, w_role, k):
    toks = {r["doc_id"]: re.findall(r"\w+", r["text"].lower()) for r in rows}
    role = {r["doc_id"]: r["role"] for r in rows}
    text_docs = {d for d, ts in toks.items() if ts}
    role_docs = {d for d, v in role.items() if v is not None}
    n_docs_c = max(len(text_docs), len(role_docs))
    sum_dl_c = w_text * sum(len(ts) for ts in toks.values()) + w_role * len(role_docs)
    avgdl_c = sum_dl_c / n_docs_c
    cache = bm25.norm_cache32(avgdl_c)
    # per-doc combined quantized length
    dlq_text = {
        d: int(bm25.LENGTH_TABLE[bm25.int_to_byte4(np.array([len(ts)]))[0]])
        for d, ts in toks.items()
    }
    norm_byte = {}
    for d in toks:
        clen = w_text * dlq_text[d] + (w_role * 1 if role[d] is not None else 0.0)
        norm_byte[d] = int(bm25.int_to_byte4(np.array([int(np.floor(clen + 0.5))]))[0])
    scores: dict[int, float] = {}
    for t in sorted(set(terms)):
        df_text = sum(1 for ts in toks.values() if t in ts)
        df_role = sum(1 for v in role.values() if v == t)
        df_c = max(df_text, df_role)
        if df_c == 0:
            continue
        idf32 = np.float32(bm25.idf(float(df_c), n_docs_c))
        for d in toks:
            freq = w_text * toks[d].count(t) + (w_role if role[d] == t else 0.0)
            if freq == 0:
                continue
            f32 = np.float32(freq)
            tfn = np.float32(
                np.float64(f32) / (np.float64(f32) + np.float64(cache[norm_byte[d]]))
            )
            scores[d] = scores.get(d, 0.0) + float(np.float32(idf32 * tfn))
    ranked = sorted(scores.items(), key=lambda p: (-np.float32(p[1]), p[0]))[:k]
    return [(d, np.float32(s)) for d, s in ranked]


@pytest.mark.parametrize(
    "terms,w_text,w_role",
    [
        (["ape", "bee"], 1.0, 1.5),     # "ape" matches BOTH fields
        (["cat", "assistant"], 1.0, 2.0),  # one text-only + one role-only term
        (["dog"], 2.0, 1.0),
    ],
)
def test_combined_matches_brute_force(comb_index, terms, w_text, w_role):
    rows, s = comb_index
    got = [
        (r["doc"], np.float32(r["score"]))
        for r in s.search_combined(terms, {"text": w_text, "role": w_role}, k=300).collect()
    ]
    want = _brute_combined(rows, terms, w_text, w_role, 300)
    assert [d for d, _ in got] == [d for d, _ in want]
    assert all(abs(a - b) <= 1e-6 * max(1.0, abs(b)) for (_, a), (_, b) in zip(got, want))


def test_combined_single_field_reduces_to_bm25(comb_index):
    # weight-1 single text field: same matches as the plain or-query
    # (scores differ only through the max-docCount pseudo-stats when
    # role covers fewer docs — here text covers every doc, so n_docs_c
    # == n_docs(text) and ranking must match exactly)
    rows, s = comb_index
    comb = [(r["doc"], r["score"]) for r in
            s.search_combined(["ape", "bee"], {"text": 1.0}, k=300).collect()]
    plain = [(r["doc"], r["score"]) for r in
             s.search(["ape", "bee"], k=300, mode="or").collect()]
    assert [d for d, _ in comb] == [d for d, _ in plain]


def test_combined_validation(comb_index):
    _, s = comb_index
    with pytest.raises(ValueError, match="weight"):
        s.search_combined(["ape"], {"text": 0.0}, k=5)
    with pytest.raises(ValueError, match="non-empty"):
        s.search_combined(["ape"], {}, k=5)
    assert s.search_combined(["zzz"], {"text": 1.0}, k=5).count() == 0
