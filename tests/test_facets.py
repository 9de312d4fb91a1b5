"""Facet counting + the matching-docs set surface.

Lucene facets count per-value / per-range matches over the FULL match
set of a query (FacetsCollector + SortedSetDocValues /
LongRangeFacetCounts), not just the top-k page. The oracle here is
brute force over the fixture rows: re-tokenize, evaluate the boolean
predicate per doc, aggregate in Python, compare exactly.
"""

import collections

import numpy as np
import pytest

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
def facet_index(spark, tmp_path_factory):
    rng = np.random.default_rng(23)
    rows = []
    for i in range(300):
        ln = int(rng.integers(3, 40))
        text = " ".join(rng.choice(WORDS, size=ln, p=_zipf(len(WORDS))))
        rows.append({"doc_id": i, "text": text,
                     "role": ["user", "assistant", "tool"][i % 3],
                     "n_chars": len(text)})
    root = str(tmp_path_factory.mktemp("facets") / "idx")
    build_index(
        spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=4,
        text_fields={"text": "text"}, keyword_fields={"role": "role"},
        stored_fields={"role": "role", "n_chars": "n_chars"},
    )
    return rows, Searcher(spark, root)


def _match(rows, must=(), must_not=()):
    out = set()
    for r in rows:
        toks = set(tokenize_text(r["text"]))
        if all(t in toks for t in must) and not any(t in toks for t in must_not):
            out.add(r["doc_id"])
    return out


CLAUSES = [{"term": "alpha", "occur": "must"},
           {"term": "gamma", "occur": "must_not"}]


def test_matching_docs_is_the_full_set(facet_index):
    rows, s = facet_index
    want = _match(rows, must=["alpha"], must_not=["gamma"])
    got = {r["doc"] for r in s.matching_docs(CLAUSES).collect()}
    assert got == want and len(want) > 20  # not a top-k cut


def test_matching_docs_numeric(facet_index):
    rows, s = facet_index
    want = {d for d in _match(rows, must=["alpha"])
            if 50 <= rows[d]["n_chars"] <= 160}
    got = {r["doc"] for r in s.matching_docs(
        [{"term": "alpha", "occur": "must"}],
        numeric=[{"field": "n_chars", "lo": 50, "hi": 160}]).collect()}
    assert got == want


def test_facet_counts(facet_index):
    rows, s = facet_index
    matched = _match(rows, must=["alpha"], must_not=["gamma"])
    want = collections.Counter(rows[d]["role"] for d in matched)
    got = {(r["facet"], r["count"]) for r in
           s.facet_counts(CLAUSES, "role", top_n=10).collect()}
    assert got == set(want.items())


def test_facet_counts_top_n_ordering(facet_index):
    rows, s = facet_index
    out = s.facet_counts(CLAUSES, "role", top_n=2).collect()
    assert len(out) == 2
    counts = [r["count"] for r in out]
    assert counts == sorted(counts, reverse=True)


def test_facet_counts_sampled(facet_index):
    import hashlib

    rows, s = facet_index
    rate, salt = 0.5, "t1"
    matched = _match(rows, must=["alpha"], must_not=["gamma"])
    # the exact deterministic keep rule, replicated with hashlib
    kept = {d for d in matched
            if int(hashlib.md5(f"{salt}{d}".encode()).hexdigest()[:8], 16)
            / 16**8 < rate}
    assert 0 < len(kept) < len(matched)  # a real sample, not all/none
    want = collections.Counter(rows[d]["role"] for d in kept)
    got = s.facet_counts_sampled(CLAUSES, "role", rate=rate, salt=salt,
                                 top_n=10).collect()
    assert {(r["facet"], r["sample_count"]) for r in got} == set(want.items())
    # amortized correction: est = round(sample / rate), Lucene's
    # amortizeFacetCounts scaling
    assert all(r["est_count"] == round(r["sample_count"] / rate) for r in got)
    # rate=1.0 degenerates to the exact facet counts
    full = {(r["facet"], r["count"]) for r in
            s.facet_counts(CLAUSES, "role", top_n=10).collect()}
    one = {(r["facet"], r["sample_count"]) for r in
           s.facet_counts_sampled(CLAUSES, "role", rate=1.0, top_n=10).collect()}
    assert one == full
    with pytest.raises(ValueError):
        s.facet_counts_sampled(CLAUSES, "role", rate=0.0)


def test_facet_ranges_overlapping(facet_index):
    rows, s = facet_index
    matched = _match(rows, must=["alpha"], must_not=["gamma"])
    ranges = [("short", None, 120), ("mid", 80, 400), ("long", 300, None)]
    vals = [rows[d]["n_chars"] for d in matched]
    want = [
        ("short", sum(v <= 120 for v in vals)),
        ("mid", sum(80 <= v <= 400 for v in vals)),
        ("long", sum(v >= 300 for v in vals)),
    ]
    got = [(r["bucket"], r["count"])
           for r in s.facet_ranges(CLAUSES, "n_chars", ranges).collect()]
    assert got == want
    # overlap: a doc with 80 <= n_chars <= 120 counts in BOTH buckets
    assert sum(c for _, c in want) >= len(vals)


def test_facet_stats(facet_index):
    rows, s = facet_index
    matched = _match(rows, must=["alpha"], must_not=["gamma"])
    by_role = collections.defaultdict(list)
    for d in matched:
        by_role[rows[d]["role"]].append(rows[d]["n_chars"])
    want = sorted(
        ((role, len(v), sum(v), min(v), max(v), sum(v) / len(v))
         for role, v in by_role.items()),
        key=lambda t: (-t[2], t[0]),
    )
    got = [(r["facet"], r["n"], r["sum_v"], r["min_v"], r["max_v"], r["avg_v"])
           for r in s.facet_stats(CLAUSES, "role", "n_chars", top_n=10).collect()]
    assert [g[:5] for g in got] == [w[:5] for w in want]
    for g, w in zip(got, want):
        assert abs(g[5] - w[5]) < 1e-9


def test_facet_stats_top_n_is_by_sum(facet_index):
    rows, s = facet_index
    out = s.facet_stats(CLAUSES, "role", "n_chars", top_n=2).collect()
    assert len(out) == 2
    sums = [r["sum_v"] for r in out]
    assert sums == sorted(sums, reverse=True)


def test_terms_in_set(facet_index):
    rows, s = facet_index
    # keyword-field membership filter: roles user OR tool
    want = sorted(r["doc_id"] for r in rows if r["role"] in ("user", "tool"))
    got = s.search_terms_in_set("role", ["user", "tool"], 10_000).collect()
    assert [r["doc"] for r in got] == want          # docID asc (const ties)
    assert all(r["score"] == 1.0 for r in got)
    # boost + paging
    page1 = s.search_terms_in_set("role", ["user", "tool"], 5, boost=2.5).collect()
    assert [r["doc"] for r in page1] == want[:5]
    assert all(r["score"] == 2.5 for r in page1)
    cur = (float(page1[-1]["score"]), int(page1[-1]["doc"]))
    page2 = s.search_terms_in_set("role", ["user", "tool"], 5, boost=2.5,
                                  after=cur).collect()
    assert [r["doc"] for r in page2] == want[5:10]
    # text-field set + empty set
    assert s.search_terms_in_set("text", [], 10).count() == 0


def test_facet_empty_query(facet_index):
    _, s = facet_index
    dead = [{"term": "zzznope", "occur": "must"}]
    assert s.matching_docs(dead).count() == 0
    assert s.facet_counts(dead, "role").count() == 0
    got = {r["bucket"]: r["count"] for r in
           s.facet_ranges(dead, "n_chars", [("all", None, None)]).collect()}
    assert got == {"all": 0}


# ---------------------------------------------------------------- grouping
# Oracle strategy: grouping correctness is independent of BM25
# correctness (covered by test_engine/test_bm25), so the oracle takes
# the engine's OWN full scored match set and regroups it in Python
# with the documented ordering rules.


def _grouped_oracle(rows, s, terms, k_groups, group_limit):
    scored = [(r["doc"], r["score"]) for r in s._scored_match_set(terms).collect()]
    by_grp = collections.defaultdict(list)
    for doc, score in scored:
        by_grp[rows[doc]["role"]].append((doc, score))
    heads = []
    for grp, docs in by_grp.items():
        best = max(s_ for _, s_ in docs)
        best_doc = min(d for d, s_ in docs if s_ == best)
        heads.append((-best, best_doc, grp))
    heads.sort()
    out = []
    for grp_rank, (_, _, grp) in enumerate(heads[:k_groups], start=1):
        docs = sorted(by_grp[grp], key=lambda p: (-p[1], p[0]))[:group_limit]
        for doc_rank, (doc, score) in enumerate(docs, start=1):
            out.append((grp, grp_rank, doc, round(score, 5), doc_rank))
    return out


def test_search_grouped_matches_oracle(facet_index):
    rows, s = facet_index
    got = [
        (r["grp"], r["grp_rank"], r["doc"], round(r["score"], 5), r["doc_rank"])
        for r in s.search_grouped(["alpha", "beta"], "role",
                                  k_groups=3, group_limit=2).collect()
    ]
    want = _grouped_oracle(rows, s, ["alpha", "beta"], 3, 2)
    assert got == want
    assert len(got) == 6  # 3 roles x 2 docs


def test_search_grouped_limit_exceeds_group(facet_index):
    rows, s = facet_index
    # a rare term -> tiny groups; group_limit larger than any group
    got = s.search_grouped(["omicron"], "role", k_groups=3, group_limit=999).collect()
    want = _grouped_oracle(rows, s, ["omicron"], 3, 999)
    assert [(r["grp"], r["grp_rank"], r["doc"], round(r["score"], 5), r["doc_rank"])
            for r in got] == want
    # every matching doc appears exactly once
    docs = [r["doc"] for r in got]
    assert len(docs) == len(set(docs))


def test_search_grouped_k_groups_cut(facet_index):
    rows, s = facet_index
    got = s.search_grouped(["alpha", "beta"], "role",
                           k_groups=1, group_limit=3).collect()
    assert {r["grp_rank"] for r in got} == {1}
    # the surviving group is the oracle's rank-1 group
    want = _grouped_oracle(rows, s, ["alpha", "beta"], 1, 3)
    assert [(r["grp"], r["doc"]) for r in got] == [(g, d) for g, _, d, _, _ in want]


def test_search_grouped_bad_field_raises(facet_index):
    _, s = facet_index
    with pytest.raises(ValueError, match="not stored"):
        s.search_grouped(["alpha"], "no_such_field")


@pytest.fixture(scope="module")
def drill_index(spark, tmp_path_factory):
    """Two keyword+stored dims (role, src) + a numeric stored field,
    for DrillSideways and SortField-chain tests."""
    rng = np.random.default_rng(41)
    rows = []
    for i in range(300):
        ln = int(rng.integers(3, 40))
        text = " ".join(rng.choice(WORDS, size=ln, p=_zipf(len(WORDS))))
        rows.append({"doc_id": i, "text": text,
                     "role": ["user", "assistant", "tool"][i % 3],
                     "src": f"s{i % 5}", "n_chars": len(text)})
    root = str(tmp_path_factory.mktemp("drill") / "idx")
    build_index(
        spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=4,
        text_fields={"text": "text"},
        keyword_fields={"role": "role", "src": "src"},
        stored_fields={"role": "role", "src": "src", "n_chars": "n_chars"},
    )
    return rows, Searcher(spark, root)


def test_drill_sideways_excludes_own_dim(spark, drill_index):
    """Each dim's counts come from base + the OTHER dims' filters:
    sideways counts for the drilled dim must show sibling values, and
    every count equals the brute-force recount."""
    rows, s = drill_index
    base = [{"term": "alpha", "occur": "must"}]
    dd = {"role": ["user"], "src": ["s1", "s3"]}
    got = {(r["dim"], r["facet"]): r["count"]
           for r in s.drill_sideways(base, dd, top_n=10).collect()}
    alpha = _match(rows, must=("alpha",))
    by_id = {r["doc_id"]: r for r in rows}
    # role dim: base + src filter (role filter EXCLUDED)
    exp_role = collections.Counter(
        by_id[d]["role"] for d in alpha if by_id[d]["src"] in ("s1", "s3")
    )
    # src dim: base + role filter (src filter EXCLUDED)
    exp_src = collections.Counter(
        by_id[d]["src"] for d in alpha if by_id[d]["role"] == "user"
    )
    for k, v in exp_role.items():
        assert got[("role", k)] == v, k
    for k, v in exp_src.items():
        assert got[("src", k)] == v, k
    # sideways property: sibling role values present despite role=user drill
    assert ("role", "assistant") in got and ("role", "tool") in got
    assert len(got) == len(exp_role) + len(exp_src)
    with pytest.raises(ValueError):
        s.drill_sideways(base, {})


def test_drill_sideways_should_base_is_mandatory(spark, drill_index):
    """A pure-should base query stays MANDATORY beside the dim
    filters (DrillDownQuery wraps the base as MUST; a doc matching
    only the filter must NOT be counted). Regression: flattening the
    base shoulds next to the filters made msm default to 0."""
    rows, s = drill_index
    base = [{"term": "alpha", "occur": "should"},
            {"term": "beta", "occur": "should"}]
    got = {(r["dim"], r["facet"]): r["count"]
           for r in s.drill_sideways(base, {"role": ["user"], "src": ["s2"]},
                                     top_n=10).collect()}
    by_id = {r["doc_id"]: r for r in rows}
    hit = {d for d in by_id
           if {"alpha", "beta"} & set(by_id[d]["text"].split())}
    exp_role = collections.Counter(
        by_id[d]["role"] for d in hit if by_id[d]["src"] == "s2")
    exp_src = collections.Counter(
        by_id[d]["src"] for d in hit if by_id[d]["role"] == "user")
    assert {k: v for k, v in got.items() if k[0] == "role"} == {
        ("role", k): v for k, v in exp_role.items()}
    assert {k: v for k, v in got.items() if k[0] == "src"} == {
        ("src", k): v for k, v in exp_src.items()}
    # msm applies inside the base group: require both terms
    got2 = {(r["dim"], r["facet"]): r["count"]
            for r in s.drill_sideways(base, {"role": ["user"], "src": ["s2"]},
                                      top_n=10, min_should_match=2).collect()}
    hit2 = {d for d in by_id
            if {"alpha", "beta"} <= set(by_id[d]["text"].split())}
    exp_role2 = collections.Counter(
        by_id[d]["role"] for d in hit2 if by_id[d]["src"] == "s2")
    assert {k: v for k, v in got2.items() if k[0] == "role"} == {
        ("role", k): v for k, v in exp_role2.items()}


def test_sorted_multi_chain_and_after(spark, drill_index):
    """SortField chain: (n_chars desc, src asc, doc asc) matches the
    brute-force sort; searchAfter pages without overlap or gaps."""
    rows, s = drill_index
    matched = sorted(_match(rows, must=("beta",)))
    by_id = {r["doc_id"]: r for r in rows}
    exp = sorted(
        matched, key=lambda d: (-by_id[d]["n_chars"], by_id[d]["src"], d)
    )
    got = s.search_sorted_multi(
        ["beta"], 15, [("n_chars", False), ("src", True)], mode="and"
    ).collect()
    assert [r["doc"] for r in got] == exp[:15]
    assert [r["n_chars"] for r in got] == [by_id[d]["n_chars"] for d in exp[:15]]
    # page 2 via after = last hit's full sort key
    last = got[-1]
    got2 = s.search_sorted_multi(
        ["beta"], 15, [("n_chars", False), ("src", True)], mode="and",
        after=(last["n_chars"], last["src"], last["doc"]),
    ).collect()
    assert [r["doc"] for r in got2] == exp[15:30]
    with pytest.raises(ValueError):
        s.search_sorted_multi(["beta"], 5, [])
    with pytest.raises(ValueError):
        s.search_sorted_multi(["beta"], 5, [("n_chars", False)], after=(1, 2, 3))


def test_facet_taxonomy_rollup_laws(spark, drill_index):
    """Every prefix level's count equals the brute-force recount, the
    grand total equals the match-set size, and each level-1 count is
    the sum of its level-2 children (taxonomy rollup law)."""
    rows, s = drill_index
    base = [{"term": "alpha", "occur": "must"}]
    got = {(r["level"], r["path"]): r["count"]
           for r in s.facet_taxonomy(base, ["role", "src"]).collect()}
    by_id = {r["doc_id"]: r for r in rows}
    hit = _match(rows, must=("alpha",))
    assert got[(0, "")] == len(hit)
    exp1 = collections.Counter(by_id[d]["role"] for d in hit)
    exp2 = collections.Counter((by_id[d]["role"], by_id[d]["src"]) for d in hit)
    for role, n in exp1.items():
        assert got[(1, role)] == n
    for (role, src), n in exp2.items():
        assert got[(2, f"{role}/{src}")] == n
    assert len(got) == 1 + len(exp1) + len(exp2)
    for role in exp1:
        assert got[(1, role)] == sum(
            n for (r2, s2), n in exp2.items() if r2 == role
        )
    with pytest.raises(ValueError, match="path_fields"):
        s.facet_taxonomy(base, [])
    with pytest.raises(ValueError, match="not stored"):
        s.facet_taxonomy(base, ["nosuch"])


def test_count_at_least_relation(spark, drill_index):
    rows, s = drill_index
    base = [{"term": "alpha", "occur": "should"}]
    exact = len(_match(rows, must=("alpha",)))
    assert exact > 3
    n, rel = s.count_at_least(base, cap=3)
    assert (n, rel) == (3, "GTE")
    n, rel = s.count_at_least(base, cap=exact)  # boundary: cap == true count
    assert (n, rel) == (exact, "GTE")
    n, rel = s.count_at_least(base, cap=exact + 50)
    assert (n, rel) == (exact, "EQ")
    with pytest.raises(ValueError, match="cap"):
        s.count_at_least(base, cap=0)


def test_feature_functions_match_formulas(spark, drill_index):
    """FeatureField function laws through search_function_score: the
    final score equals raw + S(n_chars) with each function's exact
    formula; missing values contribute the add identity (0)."""
    import math

    from fdblucene_spark.functions import features

    rows, s = drill_index
    by_id = {r["doc_id"]: r for r in rows}
    for name, tr, fn in [
        ("satu", features.saturation(2.0, 100.0),
         lambda v: 2.0 * v / (v + 100.0)),
        ("log", features.log(0.5, 1.0), lambda v: 0.5 * math.log(1.0 + v)),
        ("sig", features.sigmoid(1.5, 120.0, 2.0),
         lambda v: 1.5 * v**2 / (v**2 + 120.0**2)),
        ("dist", features.distance_feature(3.0, 150.0, 40.0),
         lambda v: 3.0 * 40.0 / (40.0 + abs(v - 150.0))),
    ]:
        got = s.search_function_score(
            ["alpha"], "n_chars", k=20, combine="add", transform=tr
        ).collect()
        assert got, name
        for r in got:
            want = float(r["raw_score"]) + fn(by_id[r["doc"]]["n_chars"])
            assert abs(float(r["score"]) - want) < 1e-9, (name, r["doc"])
    import pytest as _pt
    for bad in (features.saturation, features.log):
        with _pt.raises(ValueError):
            bad(1.0, 0.0)
    with _pt.raises(ValueError):
        features.sigmoid(1.0, 1.0, 0.0)
    with _pt.raises(ValueError):
        features.distance_feature(1.0, 0.0, 0.0)


def test_covering_query_per_doc_msm(spark, drill_index):
    """CoveringQuery law: a doc matches iff its distinct-clause hit
    count >= its per-doc threshold (n_chars % 3 + 1 here, read from
    the stored slot); matching docs keep the plain BM25 disjunction
    sum; unsatisfiable thresholds (> clause count) never match."""
    from fdblucene_spark.functions import bm25

    rows, s = drill_index
    terms = ["alpha", "beta", "gamma"]
    got = {
        r["doc"]: float(r["score"])
        for r in s.search_covering(
            terms, "n_chars", k=400, transform=lambda c: c % 3 + 1
        ).collect()
    }
    toks = {r["doc_id"]: r["text"].split() for r in rows}
    dls = {i: len(t) for i, t in toks.items() if t}
    n_docs = len(dls)
    avgdl = sum(dls.values()) / n_docs
    dfs = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    w = {t: np.float32(bm25.idf(float(dfs[t]), n_docs)) for t in terms}
    exp = {}
    n_thr = {r["doc_id"]: r["n_chars"] % 3 + 1 for r in rows}
    for i, tk in toks.items():
        parts = []
        for t in terms:
            tf = tk.count(t)
            if tf:
                dlq = bm25.int_to_byte4(np.array([dls[i]]))
                parts.append(float((w[t] * bm25.tf_norm(
                    np.array([tf]), dlq, avgdl)).astype(np.float32)[0]))
        if parts and len(parts) >= n_thr[i]:
            exp[i] = float(np.float32(sum(parts)))
    assert got.keys() == exp.keys()
    for i, sc in got.items():
        assert abs(sc - exp[i]) < 1e-6, i
    # the threshold must actually vary and actually drop docs
    one_hit_dropped = [i for i, tk in toks.items()
                       if sum(t in tk for t in terms) == 1 and n_thr[i] > 1]
    assert one_hit_dropped and all(i not in got for i in one_hit_dropped)
    with pytest.raises(ValueError):
        s.search_covering(terms, "nope", k=5)


def test_blended_term_query(spark, drill_index):
    """BlendedTermQuery laws: every leaf's idf uses the MAX df across
    the blended leaves while tf/norms/avgdl/docCount stay per-field;
    dismax rewrite combines max + tie*(sum-max), boolean rewrite sums;
    an absent leaf contributes nothing; guards reject bad input."""
    from fdblucene_spark.functions import bm25

    rows, s = drill_index
    leaves = [
        {"field": "text", "term": "alpha"},
        {"field": "role", "term": "user", "boost": 1.5},
    ]
    toks = {r["doc_id"]: r["text"].split() for r in rows}
    dls = {i: len(t) for i, t in toks.items() if t}
    n_text = len(dls)
    avg_text = sum(dls.values()) / n_text
    df_alpha = sum(1 for t in toks.values() if "alpha" in t)
    df_user = sum(1 for r in rows if r["role"] == "user")
    df_blend = max(df_alpha, df_user)
    assert df_alpha != df_user  # the blend must actually move one leaf's idf
    w_text = (np.float32(1.0) * bm25.idf(float(df_blend), n_text)).astype(np.float32)
    w_role = (np.float32(1.5) * bm25.idf(float(df_blend), len(rows))).astype(np.float32)
    exp = {}
    for r in rows:
        i = r["doc_id"]
        parts = []
        tf = toks[i].count("alpha")
        if tf:
            dlq = bm25.int_to_byte4(np.array([dls[i]]))
            parts.append(float((w_text * bm25.tf_norm(
                np.array([tf]), dlq, avg_text)).astype(np.float32)[0]))
        if r["role"] == "user":
            dlq1 = bm25.int_to_byte4(np.array([1]))
            parts.append(float((w_role * bm25.tf_norm(
                np.array([1]), dlq1, 1.0)).astype(np.float32)[0]))
        if parts:
            sm, mx = sum(parts), max(parts)
            exp[i] = (np.float32(mx + 0.3 * (sm - mx)), np.float32(sm))
    for rw, slot in (("dismax", 0), ("or", 1)):
        got = s.search_blended(leaves, k=400, tie=0.3, rewrite=rw).collect()
        assert len(got) == len(exp), rw
        want = sorted(exp.items(), key=lambda kv: (-float(kv[1][slot]), kv[0]))
        assert [g["doc"] for g in got] == [d for d, _ in want], rw
        for g in got:
            assert abs(float(g["score"]) - float(exp[g["doc"]][slot])) < 1e-6, rw
    got2 = s.search_blended(
        leaves + [{"field": "text", "term": "zzznope"}], k=400, tie=0.3
    )
    assert got2.count() == len(exp)  # absent leaf drops (empty TermStates)
    assert s.search_blended([{"field": "text", "term": "zzznope"}], k=5).count() == 0
    import pytest as _pt
    for bad in (
        lambda: s.search_blended([], k=5),
        lambda: s.search_blended(leaves, k=5, rewrite="max"),
        lambda: s.search_blended(leaves, k=5, tie=1.5),
        lambda: s.search_blended([{"field": "text", "term": "alpha", "boost": 0}], k=5),
    ):
        with _pt.raises(ValueError):
            bad()


# ---- dynamic range facets (Lucene DynamicRangeUtil) ----

def test_dynamic_ranges_matches_brute(facet_index):
    rows, s = facet_index
    matched = _match(rows, must=["alpha"], must_not=["gamma"])
    vals = sorted((r["n_chars"], r["doc_id"]) for r in rows if r["doc_id"] in matched)
    n = len(vals)
    for n_ranges in (1, 4, 7):
        want = {}
        for r, (v, _) in enumerate(vals):
            b = r * n_ranges // n
            c, lo, hi = want.get(b, (0, v, v))
            want[b] = (c + 1, min(lo, v), max(hi, v))
        got = {
            r["bucket"]: (r["n"], r["lo"], r["hi"])
            for r in s.facet_dynamic_ranges(CLAUSES, "n_chars", n_ranges).collect()
        }
        assert got == want, n_ranges
        # equal-weight law: bucket sizes differ by at most one
        sizes = [c for c, _, _ in got.values()]
        assert max(sizes) - min(sizes) <= 1
        # ranges tile the value axis in order
        bks = sorted(got)
        for a, b in zip(bks, bks[1:]):
            assert got[a][2] <= got[b][1] or got[a][2] == got[b][1] or got[a][2] <= got[b][2]


def test_dynamic_ranges_edges(facet_index):
    rows, s = facet_index
    import pytest as _pt

    with _pt.raises(ValueError):
        s.facet_dynamic_ranges(CLAUSES, "n_chars", 0)
    # empty match set -> no rows
    assert s.facet_dynamic_ranges(
        [{"term": "zzznope", "occur": "must"}], "n_chars", 5
    ).count() == 0
    # n_ranges = 1 is the whole match set with global min/max
    matched = _match(rows, must=["alpha"], must_not=["gamma"])
    vs = [r["n_chars"] for r in rows if r["doc_id"] in matched]
    one = s.facet_dynamic_ranges(CLAUSES, "n_chars", 1).collect()
    assert len(one) == 1 and one[0]["n"] == len(vs)
    assert one[0]["lo"] == min(vs) and one[0]["hi"] == max(vs)


def test_dynamic_ranges_null_values_excluded(spark, tmp_path_factory):
    # a doc matching the query but missing the stored value must not
    # occupy a rank slot (Lucene's LongValuesSource advance contract)
    rows = [{"doc_id": i, "text": "alpha common",
             "n_chars": (None if i % 3 == 0 else 100 + i)} for i in range(30)]
    root = str(tmp_path_factory.mktemp("dynnull") / "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id",
                n_shards=2, text_fields={"text": "text"},
                stored_fields={"n_chars": "n_chars"})
    s = Searcher(spark, root)
    got = s.facet_dynamic_ranges(
        [{"term": "alpha", "occur": "must"}], "n_chars", 4).collect()
    n_valued = sum(1 for r in rows if r["n_chars"] is not None)
    assert sum(r["n"] for r in got) == n_valued
    assert all(r["lo"] is not None and r["hi"] is not None for r in got)
