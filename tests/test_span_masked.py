"""FieldMaskingSpanQuery (SpanFieldMaskingQuery) under SpanNearQuery:
clauses on DIFFERENT fields whose positions compare in one masked
stream — Lucene's parallel-field idiom, including the javadoc's
slop=-1 unordered same-position join.

Oracle: brute-force position matching over the raw parallel token
sequences + an exact float32 BM25 score recomputation per clause in
its own field (the documented house span-score convention).
"""

import numpy as np
import pytest

from fdblucene_spark.functions import bm25
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

ROLES = ["user", "assistant", "tool", "system"]
TOOLS = ["none", "search", "calc", "shell"]


def _mk_rows(n_docs=60, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for d in range(n_docs):
        n = int(rng.integers(2, 12))
        roles = [ROLES[int(i)] for i in rng.integers(0, len(ROLES), n)]
        tools = [TOOLS[int(i)] for i in rng.integers(0, len(TOOLS), n)]
        rows.append(
            {
                "doc_id": d,
                "roleseq": " ".join(roles),
                "toolseq": " ".join(tools),
            }
        )
    return rows


@pytest.fixture(scope="module")
def masked_index(spark, tmp_path_factory):
    rows = _mk_rows()
    root = str(tmp_path_factory.mktemp("mask") / "idx")
    build_index(
        spark,
        spark.createDataFrame(rows),
        root,
        doc_col="doc_id",
        n_shards=4,
        text_fields={"roleseq": "roleseq", "toolseq": "toolseq"},
    )
    return rows, Searcher(spark, root)


def _brute_match(rows, clauses, slop, in_order):
    """Docs holding one position per clause within width slop+n-1."""
    n = len(clauses)
    w = slop + n - 1
    out = set()
    for r in rows:
        seqs = {"roleseq": r["roleseq"].split(), "toolseq": r["toolseq"].split()}
        pos = [
            [i for i, tok in enumerate(seqs[f]) if tok == t] for f, t in clauses
        ]
        if any(not p for p in pos):
            continue
        import itertools

        for combo in itertools.product(*pos):
            if in_order:
                if all(b > a for a, b in zip(combo, combo[1:])) and (
                    combo[-1] - combo[0] <= w
                ):
                    out.add(r["doc_id"])
                    break
            else:
                if max(combo) - min(combo) <= w:
                    out.add(r["doc_id"])
                    break
    return out


def _brute_scores(rows, clauses, docs):
    """House span convention: per DISTINCT (field, term) clause, full-tf
    BM25 in its own field; f64 sum of f32 addends in clause order."""
    n_docs = len(rows)
    toks = {
        d["doc_id"]: {
            "roleseq": d["roleseq"].split(),
            "toolseq": d["toolseq"].split(),
        }
        for d in rows
    }
    avgdl = {
        f: float(np.float64(sum(len(t[f]) for t in toks.values())) / n_docs)
        for f in ("roleseq", "toolseq")
    }
    scores = {}
    uniq = list(dict.fromkeys(clauses))
    for doc in docs:
        acc = np.float64(0.0)
        for f, t in uniq:
            seq = toks[doc][f]
            tf = seq.count(t)
            df = sum(1 for x in toks.values() if t in x[f])
            dl = len(seq)
            dlq = int(bm25.quantize_doclen(np.array([dl]))[0])
            dlq_len = int(bm25.LENGTH_TABLE[dlq])
            w32 = np.float32(bm25.idf(float(df), n_docs))
            s32 = np.float32(
                w32
                * bm25.tf_norm(
                    np.array([tf], dtype=np.int64),
                    np.array([dlq], dtype=np.int64),
                    avgdl[f],
                )[0]
            )
            acc += np.float64(s32)
        scores[doc] = np.float32(acc)
    return scores


CASES = [
    # same-position join: the FieldMaskingSpanQuery javadoc idiom
    ([("roleseq", "assistant"), ("toolseq", "search")], -1, False),
    # window join across fields
    ([("roleseq", "tool"), ("toolseq", "calc")], 1, False),
    # ordered cross-field chain
    ([("roleseq", "user"), ("toolseq", "shell")], 2, True),
    # three clauses, two fields
    ([("roleseq", "user"), ("roleseq", "assistant"), ("toolseq", "calc")], 3, True),
]


@pytest.mark.parametrize("clauses,slop,in_order", CASES)
def test_masked_matches_and_scores(spark, masked_index, clauses, slop, in_order):
    rows, s = masked_index
    got = s.search_span_masked(clauses, k=1000, slop=slop, in_order=in_order).toPandas()
    want = _brute_match(rows, clauses, slop, in_order)
    assert set(got["doc"].astype(int)) == want
    exp = _brute_scores(rows, clauses, want)
    for _, h in got.iterrows():
        assert np.float32(h["score"]) == exp[int(h["doc"])]
    # ranking law: score desc, doc asc
    key = [(-np.float32(sc), int(d)) for d, sc in zip(got["doc"], got["score"])]
    assert key == sorted(key)


def test_masked_same_position_is_slop_minus_one(spark, masked_index):
    rows, s = masked_index
    got = s.search_span_masked(
        [("roleseq", "assistant"), ("toolseq", "search")], k=1000, slop=-1
    ).toPandas()
    want = set()
    for r in rows:
        rr, tt = r["roleseq"].split(), r["toolseq"].split()
        if any(a == "assistant" and b == "search" for a, b in zip(rr, tt)):
            want.add(r["doc_id"])
    assert set(got["doc"].astype(int)) == want


def test_masked_missing_term_is_empty(spark, masked_index):
    _, s = masked_index
    assert (
        s.search_span_masked([("roleseq", "assistant"), ("toolseq", "nosuch")], k=10)
        .count()
        == 0
    )


def test_masked_validation(spark, masked_index):
    _, s = masked_index
    with pytest.raises(ValueError, match=">= 2 clauses"):
        s.search_span_masked([("roleseq", "user")], k=10)
    with pytest.raises(ValueError, match="in_order requires"):
        s.search_span_masked(
            [("roleseq", "user"), ("toolseq", "calc")], k=10, slop=-1, in_order=True
        )
    with pytest.raises(ValueError, match="slop must be >="):
        s.search_span_masked(
            [("roleseq", "user"), ("toolseq", "calc")], k=10, slop=-2
        )


def test_masked_honors_deletes(spark, tmp_path_factory):
    from fdblucene_spark.operators.deletes import delete_docs

    rows = _mk_rows(n_docs=30, seed=11)
    root = str(tmp_path_factory.mktemp("maskdel") / "idx")
    build_index(
        spark,
        spark.createDataFrame(rows),
        root,
        doc_col="doc_id",
        n_shards=2,
        text_fields={"roleseq": "roleseq", "toolseq": "toolseq"},
    )
    s = Searcher(spark, root)
    clauses = [("roleseq", "assistant"), ("toolseq", "search")]
    before = set(
        s.search_span_masked(clauses, k=1000, slop=1).toPandas()["doc"].astype(int)
    )
    if not before:
        pytest.skip("no matches in this draw")
    victim = min(before)
    delete_docs(spark, root, [victim])
    after = set(
        Searcher(spark, root)
        .search_span_masked(clauses, k=1000, slop=1)
        .toPandas()["doc"]
        .astype(int)
    )
    assert after == before - {victim}
