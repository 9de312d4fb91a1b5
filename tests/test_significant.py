"""significant_terms (ES JLH over fg/bg df), complete_infix, and
length_buckets.

Oracles are brute force over the fixture rows: re-tokenize, compute
foreground/background document frequencies and the JLH score in plain
Python floats (same op order as the plan), compare exactly.
"""

import hashlib

import numpy as np
import pytest

from fdblucene_spark.functions.analysis import tokenize_text
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.curation import length_buckets
from fdblucene_spark.operators.query import Searcher

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi",
]


@pytest.fixture(scope="module")
def sig_index(spark, tmp_path_factory):
    rng = np.random.default_rng(41)
    w = 1.0 / np.arange(1, len(WORDS) + 1)
    p = w / w.sum()
    rows = []
    for i in range(400):
        ln = int(rng.integers(4, 30))
        toks = list(rng.choice(WORDS, size=ln, p=p))
        # plant a correlation: docs containing 'alpha' very often also
        # contain 'omicron' (rare in the background) -> omicron should
        # be the top significant term for the query alpha
        if "alpha" in toks and rng.random() < 0.8:
            toks.append("omicron")
        rows.append({"doc_id": i, "text": " ".join(toks)})
    root = str(tmp_path_factory.mktemp("sig") / "idx")
    build_index(
        spark, spark.createDataFrame(rows), root, doc_col="doc_id",
        n_shards=4, text_fields={"text": "text"},
    )
    return rows, Searcher(spark, root)


def _oracle_significant(rows, must_term, k, min_doc_freq, exclude):
    fg_docs = [r for r in rows if must_term in set(tokenize_text(r["text"]))]
    fg_n, bg_n = len(fg_docs), len(rows)
    fg_df, bg_df = {}, {}
    for r in rows:
        for t in set(tokenize_text(r["text"])):
            bg_df[t] = bg_df.get(t, 0) + 1
    for r in fg_docs:
        for t in set(tokenize_text(r["text"])):
            fg_df[t] = fg_df.get(t, 0) + 1
    out = []
    for t, f in fg_df.items():
        if f < min_doc_freq or (exclude and t == must_term):
            continue
        fgp = float(f) / float(fg_n)
        bgp = float(bg_df[t]) / float(bg_n)
        out.append((t, f, bg_df[t], (fgp - bgp) * (fgp / bgp)))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out[:k]


def test_significant_terms_exact(sig_index):
    rows, s = sig_index
    got = [
        (r["term"], r["fg_df"], r["bg_df"], r["score"])
        for r in s.significant_terms(
            [{"term": "alpha", "occur": "must"}], k=8, min_doc_freq=3
        ).collect()
    ]
    want = _oracle_significant(rows, "alpha", 8, 3, True)
    assert [(g[0], g[1], g[2]) for g in got] == [(w[0], w[1], w[2]) for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], rel=1e-12)


def test_significant_terms_planted_correlation(sig_index):
    rows, s = sig_index
    top = s.significant_terms(
        [{"term": "alpha", "occur": "must"}], k=3, min_doc_freq=3
    ).collect()
    assert top[0]["term"] == "omicron"


def test_significant_terms_excludes_query_terms(sig_index):
    rows, s = sig_index
    clauses = [{"term": "alpha", "occur": "must"},
               {"term": "beta", "occur": "should"}]
    terms = {r["term"] for r in s.significant_terms(clauses, k=50,
                                                    min_doc_freq=1).collect()}
    assert "alpha" not in terms and "beta" not in terms
    terms_inc = {
        r["term"]
        for r in s.significant_terms(
            clauses, k=50, min_doc_freq=1, exclude_query_terms=False
        ).collect()
    }
    assert "alpha" in terms_inc


def test_significant_terms_empty_foreground(sig_index):
    _, s = sig_index
    assert (
        s.significant_terms([{"term": "zzzznope", "occur": "must"}], k=5).count()
        == 0
    )


def test_complete_infix(sig_index):
    rows, s = sig_index
    # brute-force oracle: terms containing 'mic' ranked by df desc
    df = {}
    for r in rows:
        for t in set(tokenize_text(r["text"])):
            df[t] = df.get(t, 0) + 1
    want = sorted(((t, n) for t, n in df.items() if "mic" in t),
                  key=lambda p: (-p[1], p[0]))[:5]
    got = [(r["term"], r["df"]) for r in s.complete_infix("mic", n=5).collect()]
    assert got == want
    # mid-string match included (omicron matches 'mic' infix, not prefix)
    assert any(t == "omicron" for t, _ in got)
    with pytest.raises(ValueError):
        s.complete_infix("")


def _oracle_buckets(rows, batch_size, edges, salt):
    recs = []
    for r in rows:
        n = len(tokenize_text(r["text"]))
        bkt = next((i for i, e in enumerate(edges) if n <= e), len(edges))
        key = hashlib.md5(f"{salt}:{r['doc_id']}".encode()).hexdigest()
        recs.append((bkt, key, r["doc_id"], n))
    recs.sort()
    out, seen = {}, {}
    for bkt, _, did, n in recs:
        r = seen.get(bkt, 0)
        seen[bkt] = r + 1
        out[did] = (n, bkt, r // batch_size, r % batch_size)
    return out


def test_length_buckets_exact(spark, sig_index):
    rows, _ = sig_index
    df = spark.createDataFrame(rows)
    edges = (8, 16, 24)
    got = {
        r["doc_id"]: (r["n_tokens"], r["bucket"], r["batch_idx"], r["pos_in_batch"])
        for r in length_buckets(df, "doc_id", "text", 7, edges=edges).collect()
    }
    assert got == _oracle_buckets(rows, 7, edges, "v1")


def test_length_buckets_batches_full(spark, sig_index):
    rows, _ = sig_index
    df = spark.createDataFrame(rows)
    out = length_buckets(df, "doc_id", "text", 16, edges=(12,)).collect()
    by_batch = {}
    for r in out:
        by_batch.setdefault((r["bucket"], r["batch_idx"]), []).append(r)
    for (bkt, bi), members in by_batch.items():
        # every batch except possibly the bucket's last is full
        last = max(b for bk, b in by_batch if bk == bkt)
        if bi < last:
            assert len(members) == 16
        assert sorted(r["pos_in_batch"] for r in members) == list(range(len(members)))


def test_length_buckets_salt_and_partition_invariance(spark, sig_index):
    rows, _ = sig_index
    df = spark.createDataFrame(rows)
    a = {(r["doc_id"], r["batch_idx"], r["pos_in_batch"])
         for r in length_buckets(df, "doc_id", "text", 5, edges=(16,)).collect()}
    b = {(r["doc_id"], r["batch_idx"], r["pos_in_batch"])
         for r in length_buckets(df.repartition(13), "doc_id", "text", 5,
                                 edges=(16,)).collect()}
    assert a == b
    c = {(r["doc_id"], r["batch_idx"], r["pos_in_batch"])
         for r in length_buckets(df, "doc_id", "text", 5, edges=(16,),
                                 salt="v2").collect()}
    assert a != c


def test_length_buckets_validation(spark, sig_index):
    rows, _ = sig_index
    df = spark.createDataFrame(rows[:5])
    with pytest.raises(ValueError):
        length_buckets(df, "doc_id", "text", 0)
    with pytest.raises(ValueError):
        length_buckets(df, "doc_id", "text", 4, edges=(16, 8))
