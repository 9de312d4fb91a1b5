"""Spell suggestion (DirectSpellChecker) + MoreLikeThis.

Oracles are test-local brute force: an independent Damerau DP over
the fixture vocabulary for suggest, and tf/df threshold + tf*idf
ranking recomputed from the raw rows for MLT term selection.
"""

import numpy as np
import pytest

from fdblucene_spark.functions import bm25
from fdblucene_spark.functions.analysis import tokenize_text
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi",
]


def _zipf(n):
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


@pytest.fixture(scope="module")
def ms_index(spark, tmp_path_factory):
    rng = np.random.default_rng(41)
    rows = []
    for i in range(250):
        ln = int(rng.integers(3, 40))
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(WORDS, size=ln, p=_zipf(len(WORDS))))})
    root = str(tmp_path_factory.mktemp("ms") / "idx")
    build_index(spark, spark.createDataFrame(rows), root,
                doc_col="doc_id", n_shards=4, text_fields={"text": "text"})
    return rows, Searcher(spark, root)


def _dam(a: str, b: str) -> int:
    # independent unrestricted-Damerau check (full matrix, small words)
    inf = len(a) + len(b)
    da = {}
    d = [[inf] * (len(b) + 2) for _ in range(len(a) + 2)]
    d[1][1] = 0
    for i in range(1, len(a) + 1):
        d[i + 1][1] = i
    for j in range(1, len(b) + 1):
        d[1][j + 1] = j
    for i in range(1, len(a) + 1):
        db = 0
        for j in range(1, len(b) + 1):
            k = da.get(b[j - 1], 0)
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                db = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][db] + (i - k - 1) + 1 + (j - db - 1),
            )
        da[a[i - 1]] = i
    return d[len(a) + 1][len(b) + 1]


def _vocab_df(rows):
    df = {}
    for r in rows:
        for t in set(tokenize_text(r["text"])):
            df[t] = df.get(t, 0) + 1
    return df


def _brute_suggest(rows, q, max_edits=2, prefix_len=0, maxs=5):
    df = _vocab_df(rows)
    cands = [
        t for t in df
        if t != q and t[:prefix_len] == q[:prefix_len]
        and abs(len(t) - len(q)) <= max_edits and _dam(t, q) <= max_edits
    ]
    cands.sort(key=lambda t: (_dam(t, q), -df[t], t))
    return [(t, df[t], _dam(t, q)) for t in cands[:maxs]]


@pytest.mark.parametrize("q,plen", [("alpa", 1), ("eta", 0), ("kapppa", 1)])
def test_suggest_matches_brute_force(ms_index, q, plen):
    rows, s = ms_index
    got = [(r["term"], r["df"], r["distance"])
           for r in s.suggest(q, max_edits=2, prefix_length=plen)]
    assert got == _brute_suggest(rows, q, prefix_len=plen)


def test_suggest_no_candidates(ms_index):
    _, s = ms_index
    assert s.suggest("qqqqqqqq") == []


def test_mlt_threshold_selection(ms_index):
    rows, s = ms_index
    # tf >= 2 keeps alpha/beta; 'mu' fails min_term_freq, an unknown
    # word fails min_doc_freq
    text = "alpha alpha beta beta zzznope zzznope mu"
    got = s.more_like_this(text, 15, min_term_freq=2, min_doc_freq=1)
    want = s.search(["alpha", "beta"], 15, mode="or")
    assert [(r["doc"], r["score"]) for r in got.collect()] == \
           [(r["doc"], r["score"]) for r in want.collect()]


def test_mlt_max_query_terms_ranking(ms_index):
    rows, s = ms_index
    df = _vocab_df(rows)
    n = len(rows)
    text = "alpha alpha kappa kappa"
    # tf equal -> the rarer term (higher idf) wins the single slot
    scores = {t: 2.0 * float(bm25.idf(float(df[t]), n)) for t in ("alpha", "kappa")}
    best = max(scores, key=lambda t: (scores[t], t))
    got = s.more_like_this(text, 10, max_query_terms=1,
                           min_term_freq=2, min_doc_freq=1)
    want = s.search([best], 10, mode="or")
    assert [(r["doc"], r["score"]) for r in got.collect()] == \
           [(r["doc"], r["score"]) for r in want.collect()]


def test_mlt_exclude_doc(ms_index):
    rows, s = ms_index
    src = rows[7]["text"]
    got = s.more_like_this(src, 10, min_term_freq=1, min_doc_freq=1,
                           exclude_doc=7).collect()
    assert all(r["doc"] != 7 for r in got) and len(got) == 10


def test_mlt_empty_selection(ms_index):
    _, s = ms_index
    assert s.more_like_this("zzz yyy", 5, min_term_freq=2).count() == 0


def test_span_first_matches_brute_force(ms_index):
    rows, s = ms_index
    end = 3
    want = {r["doc_id"] for r in rows
            if "alpha" in tokenize_text(r["text"])[:end]}
    got = s.search_span_first("alpha", 10_000, end=end).collect()
    assert {r["doc"] for r in got} == want and 0 < len(want) < 250
    # scores = the term's ordinary BM25 score on the surviving docs
    base = {r["doc"]: r["score"] for r in s.search(["alpha"], 10_000).collect()}
    assert all(r["score"] == base[r["doc"]] for r in got)
    # ordered score desc, doc asc
    keys = [(-r["score"], r["doc"]) for r in got]
    assert keys == sorted(keys)


def test_span_first_edges(ms_index):
    _, s = ms_index
    assert s.search_span_first("alpha", 5, end=0).count() == 0
    assert s.search_span_first("zzznope", 5, end=10).count() == 0
    # end past every doc length == plain single-term search
    full = s.search(["alpha"], 10_000).collect()
    wide = s.search_span_first("alpha", 10_000, end=10_000).collect()
    assert [(r["doc"], r["score"]) for r in full] == \
           [(r["doc"], r["score"]) for r in wide]


def test_span_range_matches_brute_force(ms_index):
    rows, s = ms_index
    lo, hi = 2, 6
    want = {r["doc_id"] for r in rows
            if "alpha" in tokenize_text(r["text"])[lo:hi]}
    got = s.search_span_range("alpha", 10_000, start=lo, end=hi).collect()
    assert {r["doc"] for r in got} == want and 0 < len(want) < 250
    # scores = the term's ordinary BM25 score on the surviving docs
    base = {r["doc"]: r["score"] for r in s.search(["alpha"], 10_000).collect()}
    assert all(r["score"] == base[r["doc"]] for r in got)
    keys = [(-r["score"], r["doc"]) for r in got]
    assert keys == sorted(keys)


def test_span_range_edges(ms_index):
    _, s = ms_index
    # empty/inverted windows match nothing; negative start clamps to 0
    assert s.search_span_range("alpha", 5, start=3, end=3).count() == 0
    assert s.search_span_range("alpha", 5, start=7, end=2).count() == 0
    full = s.search(["alpha"], 10_000).collect()
    wide = s.search_span_range("alpha", 10_000, start=-5, end=10_000).collect()
    assert [(r["doc"], r["score"]) for r in full] == \
           [(r["doc"], r["score"]) for r in wide]
    # span_first(end) == span_range(0, end)
    a = s.search_span_first("alpha", 10_000, end=3).collect()
    b = s.search_span_range("alpha", 10_000, start=0, end=3).collect()
    assert [(r["doc"], r["score"]) for r in a] == \
           [(r["doc"], r["score"]) for r in b]


def _lev(a: str, b: str) -> int:
    # classic Levenshtein (no transpositions) — FuzzySuggester's metric
    d = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, d[0] = d[0], i
        for j in range(1, len(b) + 1):
            cur = min(
                d[j] + 1,
                d[j - 1] + 1,
                prev + (0 if a[i - 1] == b[j - 1] else 1),
            )
            prev, d[j] = d[j], cur
    return d[len(b)]


def test_complete_fuzzy_matches_brute(ms_index):
    """FuzzySuggester: term prefix of len(q) within max_edits of the
    typed prefix, first char exact, ranked df desc then term asc."""
    rows, s = ms_index
    # vocabulary stats from the raw rows
    df = {}
    ttf = {}
    for r in rows:
        toks = r["text"].split()
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
        for t in toks:
            ttf[t] = ttf.get(t, 0) + 1
    for q, me in [("epsilom", 1), ("gama", 1), ("eta", 0), ("zeta", 2)]:
        got = [
            (r["term"], r["df"], r["ttf"])
            for r in s.complete_fuzzy(q, n=10, max_edits=me).collect()
        ]
        cand = [
            t for t in df
            if t[0] == q[0] and _lev(t[: len(q)], q) <= me
        ]
        want = sorted(
            ((t, df[t], ttf[t]) for t in cand),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        assert got == want, (q, me)


def test_complete_fuzzy_guards(ms_index):
    _, s = ms_index
    with pytest.raises(ValueError):
        s.complete_fuzzy("", n=5)
    with pytest.raises(ValueError):
        s.complete_fuzzy("abc", max_edits=3)
    with pytest.raises(ValueError):
        s.complete_fuzzy("abc", by="nope")
    # no first-char match -> empty
    assert s.complete_fuzzy("qqq", n=5, max_edits=2).count() == 0
