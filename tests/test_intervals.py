"""Intervals algebra vs a brute-force minimal-interval oracle.

The oracle enumerates EVERY matching interval combinatorially
(itertools over child choices), reduces to the containment-free
antichain — the definition of minimal-interval semantics — then
applies max_gaps. The vectorized packed-key implementation in
operators/intervals.py must produce the identical (start, end) sets
per document for random token arrays and random source trees, plus
the handful of classic counterexamples where naive (non-minimal)
evaluation gets containment wrong.
"""

import itertools

import numpy as np
import pytest

from fdblucene_spark.operators import intervals as iv

SHIFT = 21


def make_keys(docs_tokens):
    keys = {}
    for d, toks in enumerate(docs_tokens):
        for p, t in enumerate(toks):
            keys.setdefault(t, []).append((d << SHIFT) | p)
    return {t: np.sort(np.asarray(v, dtype=np.int64)) for t, v in keys.items()}


def unpack(ps, pe):
    out = {}
    for s, e in zip(ps.tolist(), pe.tolist()):
        out.setdefault(s >> SHIFT, set()).add((s & ((1 << SHIFT) - 1),
                                               e & ((1 << SHIFT) - 1)))
    return out


def antichain(items):
    """items: set of (s, e, w). Keep intervals not properly containing
    another matching interval."""
    spans = {(s, e) for s, e, _ in items}
    keep = set()
    for s, e, w in items:
        if not any((s2, e2) != (s, e) and s2 >= s and e2 <= e for s2, e2 in spans):
            keep.add((s, e, w))
    return keep


def brute(source, toks):
    op = next(k for k in source if k != "max_gaps")
    body = source[op]
    if op == "term":
        out = {(i, i, 1) for i, t in enumerate(toks) if t == body}
    elif op == "phrase":
        return brute({"ordered": [{"term": t} for t in body], "max_gaps": 0}, toks)
    elif op == "or":
        out = set()
        for c in body:
            out |= brute(c, toks)
        out = antichain(out)
    elif op == "ordered":
        child = [brute(c, toks) for c in body]
        out = set()
        for combo in itertools.product(*child):
            if all(combo[i][1] < combo[i + 1][0] for i in range(len(combo) - 1)):
                out.add((combo[0][0], combo[-1][1],
                         sum(e - s + 1 for s, e, _ in combo)))
        out = antichain(out)
    elif op == "unordered":
        child = [brute(c, toks) for c in body]
        out = set()
        for combo in itertools.product(*child):
            # duplicate terms need distinct positions; distinct terms
            # can never collide (one token per position)
            if len({c[0] for c in combo}) == len(combo):
                ss = min(c[0] for c in combo)
                ee = max(c[1] for c in combo)
                out.add((ss, ee, len(combo)))
        out = antichain(out)
    else:
        a, b = (brute(body[0], toks), brute(body[1], toks))
        if op in ("containing", "not_containing"):
            hit = {ai for ai in a
                   if any(ai[0] <= bs and be <= ai[1] for bs, be, _ in b)}
            out = hit if op == "containing" else a - hit
        elif op in ("contained_by", "not_contained_by"):
            hit = {ai for ai in a
                   if any(bs <= ai[0] and ai[1] <= be for bs, be, _ in b)}
            out = hit if op == "contained_by" else a - hit
        elif op == "before":
            out = {ai for ai in a if any(ai[1] < bs for bs, _, _ in b)}
        elif op == "after":
            out = {ai for ai in a if any(be < ai[0] for _, be, _ in b)}
        else:
            hit = {ai for ai in a
                   if any(bs <= ai[1] and be >= ai[0] for bs, be, _ in b)}
            out = hit if op == "overlapping" else a - hit
    if "max_gaps" in source:
        out = {(s, e, w) for s, e, w in out if (e - s + 1 - w) <= source["max_gaps"]}
    return out


def check(source, docs):
    iv.validate(source)
    ps, pe, _ = iv.evaluate(source, make_keys(docs), SHIFT)
    got = unpack(ps, pe)
    want = {}
    for d, toks in enumerate(docs):
        ivs = {(s, e) for s, e, _ in brute(source, toks)}
        if ivs:
            want[d] = ivs
    assert got == want, (source, got, want)


# ---- classic minimal-semantics counterexamples ----

def test_ordered_minimality_vigna():
    # "a c a b": naive (a@0, b@3) contains the true minimal (a@2, b@3)
    check({"ordered": [{"term": "a"}, {"term": "b"}]}, [list("acab")])


def test_containing_respects_minimality():
    # the minimal ordered(a, b) interval (2, 3) does NOT contain c@1 —
    # a naive all-combos containing would wrongly match via (0, 3)
    src = {"containing": [{"ordered": [{"term": "a"}, {"term": "b"}]},
                          {"term": "c"}]}
    docs = [list("acab"),        # no match: minimal (2,3) misses c
            list("abcab"),       # no: minimals (0,1),(3,4) miss c@2? (0,1) no c, (3,4) no c
            list("acb")]         # yes: minimal (0,2) holds c@1
    check(src, docs)


def test_unordered_minimality():
    # "b c a b": unordered(a, b) minimal = {(2,3)} plus (1..)? brute decides
    check({"unordered": [{"term": "a"}, {"term": "b"}]}, [list("bcab")])


def test_unordered_duplicate_term_needs_two_positions():
    src = {"unordered": [{"term": "a"}, {"term": "a"}]}
    check(src, [list("aba"), list("ab"), list("aa")])


def test_phrase_is_adjacent_ordered():
    check({"phrase": ["a", "b"]}, [list("ab"), list("acb"), list("ba")])


def test_maxgaps_ordered():
    src = {"ordered": [{"term": "a"}, {"term": "b"}], "max_gaps": 1}
    check(src, [list("ab"), list("acb"), list("accb"), list("b")])


def test_not_containing():
    src = {"not_containing": [{"ordered": [{"term": "a"}, {"term": "b"}]},
                              {"term": "c"}]}
    check(src, [list("acb"), list("ab"), list("acabb")])


def test_contained_by():
    # c occurrences inside an unordered(a, b) window
    src = {"contained_by": [{"term": "c"},
                            {"unordered": [{"term": "a"}, {"term": "b"}]}]}
    check(src, [list("acb"), list("cab"), list("abc"), list("bca")])


def test_before_after_overlapping():
    ab = {"ordered": [{"term": "a"}, {"term": "b"}]}
    check({"before": [ab, {"term": "c"}]}, [list("abc"), list("cab"), list("ab")])
    check({"after": [ab, {"term": "c"}]}, [list("abc"), list("cab"), list("ab")])
    check({"overlapping": [ab, {"unordered": [{"term": "c"}, {"term": "d"}]}]},
          [list("cadb"), list("abcd"), list("cdab"), list("acbd")])
    check({"non_overlapping": [ab, {"term": "c"}]},
          [list("acb"), list("abc"), list("ab")])


def test_or_minimality_mixed_width():
    # or(phrase(a,b), term(a)): term a (width 1) is always inside the
    # phrase interval, so the phrase never survives minimalization
    src = {"or": [{"phrase": ["a", "b"]}, {"term": "a"}]}
    check(src, [list("ab"), list("b"), list("cab")])


def test_nested_ordered_of_ordered():
    src = {"ordered": [{"ordered": [{"term": "a"}, {"term": "b"}]},
                       {"term": "c"}]}
    check(src, [list("abc"), list("abdc"), list("acb"), list("cab"),
                list("ababc")])


def test_empty_and_missing_terms():
    src = {"ordered": [{"term": "zz"}, {"term": "a"}]}
    ps, pe, w = iv.evaluate(src, make_keys([list("ab")]), SHIFT)
    assert ps.size == 0
    assert iv.match_docs(src, make_keys([list("ab")]), SHIFT).size == 0


# ---- randomized equivalence ----

def _rand_source(rng, vocab, depth):
    if depth == 0:
        return {"term": str(rng.choice(vocab))}
    kind = rng.choice(["ordered", "unordered", "or", "pair"])
    if kind == "unordered":
        n = int(rng.integers(2, 4))
        return {"unordered": [{"term": str(rng.choice(vocab))} for _ in range(n)]}
    if kind == "ordered":
        n = int(rng.integers(2, 4))
        src = {"ordered": [_rand_source(rng, vocab, depth - 1) for _ in range(n)]}
        if rng.random() < 0.5:
            src["max_gaps"] = int(rng.integers(0, 4))
        return src
    if kind == "or":
        n = int(rng.integers(2, 4))
        return {"or": [_rand_source(rng, vocab, depth - 1) for _ in range(n)]}
    op = str(rng.choice(list(iv._PAIR_OPS)))
    return {op: [_rand_source(rng, vocab, depth - 1),
                 _rand_source(rng, vocab, depth - 1)]}


@pytest.mark.parametrize("seed", range(40))
def test_random_equivalence(seed):
    rng = np.random.default_rng(seed)
    vocab = list("abcd")
    docs = [
        [str(t) for t in rng.choice(vocab, size=int(rng.integers(1, 15)))]
        for _ in range(8)
    ]
    src = _rand_source(rng, vocab, int(rng.integers(1, 3)))
    # gap ambiguity: a nested max_gaps over variable-width children can
    # legitimately differ between iteration orders; restrict the
    # randomized check to sources whose max_gaps sit over term leaves
    def gaps_safe(s):
        op = next(k for k in s if k != "max_gaps")
        if "max_gaps" in s and op in ("ordered", "unordered"):
            if not all(set(c) == {"term"} for c in s[op]):
                return False
        return op in ("term", "phrase") or all(
            gaps_safe(c) for c in (s[op] if isinstance(s[op], list) else [])
        )
    if not gaps_safe(src):
        src = {"ordered": [{"term": "a"}, {"term": "b"}], "max_gaps": 2}
    check(src, docs)


@pytest.fixture(scope="module")
def interval_index(spark, tmp_path_factory):
    from fdblucene_spark.operators.build import build_index

    rng = np.random.default_rng(71)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    w = 1.0 / np.arange(1, len(vocab) + 1)
    rows = []
    for i in range(250):
        ln = int(rng.integers(3, 30))
        rows.append({"doc_id": i, "text": " ".join(
            rng.choice(vocab, size=ln, p=w / w.sum()))})
    root = str(tmp_path_factory.mktemp("ivx") / "idx")
    build_index(spark, spark.createDataFrame(rows), root,
                doc_col="doc_id", n_shards=4)
    from fdblucene_spark.operators.query import Searcher
    return rows, Searcher(spark, root)


SOURCES = [
    {"ordered": [{"term": "alpha"}, {"term": "beta"}], "max_gaps": 2},
    {"containing": [
        {"unordered": [{"term": "alpha"}, {"term": "beta"}], "max_gaps": 4},
        {"term": "gamma"}]},
    {"not_containing": [
        {"ordered": [{"term": "alpha"}, {"term": "beta"}], "max_gaps": 3},
        {"term": "gamma"}]},
    {"contained_by": [
        {"term": "delta"},
        {"ordered": [{"term": "alpha"}, {"term": "beta"}], "max_gaps": 6}]},
    {"or": [{"phrase": ["alpha", "beta"]}, {"phrase": ["beta", "gamma"]}]},
]


@pytest.mark.parametrize("src_i", range(len(SOURCES)))
def test_search_intervals_end_to_end(interval_index, src_i):
    from fdblucene_spark.functions.analysis import tokenize_text

    rows, s = interval_index
    src = SOURCES[src_i]
    want = {r["doc_id"] for r in rows if brute(src, tokenize_text(r["text"]))}
    got = s.search_intervals(src, k=100000).collect()
    assert {r["doc"] for r in got} == want and want
    # scoring convention: the OR disjunction of the leaf terms
    leaves = iv.leaf_terms(src)
    or_scores = {r["doc"]: r["score"]
                 for r in s.search(leaves, 100000, "or").collect()}
    for r in got:
        assert r["score"] == pytest.approx(or_scores[r["doc"]], rel=0, abs=0)


def test_search_intervals_prefix_leaf(interval_index):
    from fdblucene_spark.functions.analysis import tokenize_text

    rows, s = interval_index
    # prefix 'ga' expands to gamma only in this vocab -> identical to
    # the explicit-term source
    src_p = {"ordered": [{"term": "alpha"}, {"prefix": "ga"}], "max_gaps": 3}
    src_t = {"ordered": [{"term": "alpha"}, {"term": "gamma"}], "max_gaps": 3}
    want = {r["doc_id"] for r in rows if brute(src_t, tokenize_text(r["text"]))}
    got = {r["doc"] for r in s.search_intervals(src_p, k=100000).collect()}
    assert got == want and want
    # a prefix with no vocabulary hit is the empty source
    none = s.search_intervals(
        {"ordered": [{"term": "alpha"}, {"prefix": "zzz"}]}, k=10).collect()
    assert none == []


def test_search_intervals_topk_ordering(interval_index):
    rows, s = interval_index
    src = SOURCES[0]
    full = s.search_intervals(src, k=100000).collect()
    top5 = s.search_intervals(src, k=5).collect()
    assert [(r["doc"], r["score"]) for r in top5] == \
        [(r["doc"], r["score"]) for r in full[:5]]
    keys = [(-r["score"], r["doc"]) for r in full]
    assert keys == sorted(keys)


def test_validate_rejects():
    for bad in (
        {"ordered": []},
        {"bogus": [{"term": "a"}]},
        {"term": ""},
        {"containing": [{"term": "a"}]},
        {"unordered": [{"ordered": [{"term": "a"}, {"term": "b"}]},
                       {"term": "c"}]},
        {"term": "a", "max_gaps": 2},
        {"ordered": [{"term": "a"}, {"term": "b"}], "max_gaps": -1},
        {"phrase": ["a"]},
    ):
        with pytest.raises(ValueError):
            iv.validate(bad)
