"""SynonymQuery scoring (blended stats, single BM25 leaf).

Oracle: brute force in numpy through functions/bm25 — docFreq = max
member df, per-doc freq = sum of member freqs, one f32 idf*tf_norm.
Also pins the semantic difference from a plain disjunction: a doc
matching two synonyms scores ONCE with combined frequency.
"""

import math

import numpy as np
import pytest

from fdblucene_spark.functions import bm25
from fdblucene_spark.functions.analysis import tokenize_text
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.deletes import delete_docs
from fdblucene_spark.operators.query import Searcher

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


@pytest.fixture(scope="module")
def syn_index(spark, tmp_path_factory):
    rng = np.random.default_rng(29)
    rows = []
    for i in range(200):
        ln = int(rng.integers(2, 24))
        w = 1.0 / np.arange(1, len(WORDS) + 1)
        rows.append(
            {"doc_id": i, "text": " ".join(rng.choice(WORDS, size=ln, p=w / w.sum()))}
        )
    root = str(tmp_path_factory.mktemp("syn") / "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=4)
    return rows, root


def _brute(rows, members, deleted=()):
    toks = {r["doc_id"]: tokenize_text(r["text"]) for r in rows}
    dls = {d: len(t) for d, t in toks.items() if t}
    n_docs = len(dls)
    avgdl = sum(dls.values()) / n_docs
    df_max = max(sum(1 for t in toks.values() if m in t) for m in members)
    w32 = np.float32(bm25.idf(float(df_max), n_docs))
    out = []
    for d, t in toks.items():
        if d in deleted:
            continue
        tsum = sum(t.count(m) for m in members)
        if not tsum:
            continue
        dlq = int(bm25.quantize_doclen(np.array([len(t)]))[0])
        tfn = np.float32(bm25.tf_norm(np.array([tsum]), np.array([dlq]), avgdl)[0])
        out.append((d, np.float32(w32 * tfn)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def test_synonym_matches_brute_force(spark, syn_index):
    rows, root = syn_index
    s = Searcher(spark, root)
    got = s.search_synonym(["gamma", "zeta"], k=50).toPandas()
    want = _brute(rows, ["gamma", "zeta"])[:50]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    for g, (_, w) in zip(got["score"], want):
        assert np.float32(g) == w


def test_synonym_differs_from_disjunction(spark, syn_index):
    """A doc holding both members must NOT score as the sum of two
    idf-weighted leaves (or-mode); the synonym leaf blends stats."""
    rows, root = syn_index
    s = Searcher(spark, root)
    both = next(
        r["doc_id"] for r in rows
        if "alpha" in r["text"].split() and "zeta" in r["text"].split()
    )
    syn = s.search_synonym(["alpha", "zeta"], k=300).toPandas().set_index("doc")
    disj = s.search_local(["alpha", "zeta"], k=300, mode="or").set_index("doc")
    assert np.float32(syn.loc[both, "score"]) != np.float32(disj.loc[both, "score"])


def _brute_classic(rows, terms, mode="or"):
    toks = {r["doc_id"]: tokenize_text(r["text"]) for r in rows}
    dls = {d: len(t) for d, t in toks.items() if t}
    n = len(dls)
    out = []
    for d, t in toks.items():
        acc, matched = 0.0, 0
        for m in sorted(set(terms)):
            tf = t.count(m)
            if not tf:
                continue
            matched += 1
            df = sum(1 for u in toks.values() if m in u)
            w = np.float32(np.log((n + 1) / float(df + 1)) + 1.0)
            dlq = int(bm25.quantize_doclen(np.array([len(t)]))[0])
            nrm = np.float32(1.0 / np.sqrt(float(bm25.LENGTH_TABLE[dlq])))
            acc += float(np.float32(np.float32(np.sqrt(float(tf))) * w) * nrm)
        if matched and (mode == "or" or matched == len(set(terms))):
            out.append((d, np.float32(acc)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("mode", ["or", "and"])
def test_classic_tfidf_matches_brute_force(spark, syn_index, mode):
    rows, root = syn_index
    s = Searcher(spark, root)
    got = s.search_classic(["gamma", "zeta"], k=60, mode=mode).toPandas()
    want = _brute_classic(rows, ["gamma", "zeta"], mode)[:60]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    for g, (_, w) in zip(got["score"], want):
        assert np.float32(g) == w


def test_classic_absent_term(spark, syn_index):
    rows, root = syn_index
    s = Searcher(spark, root)
    assert s.search_classic(["zzznope", "gamma"], k=5, mode="and").count() == 0
    got = s.search_classic(["zzznope", "gamma"], k=20, mode="or").toPandas()
    want = _brute_classic(rows, ["gamma"])[:20]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]


def test_synonym_missing_member_and_deletes(spark, syn_index):
    rows, root = syn_index
    spark_s = Searcher(spark, root)
    assert spark_s.search_synonym(["zzznope"], k=5).count() == 0
    # unknown member alongside a real one: stats blend over present members
    got = spark_s.search_synonym(["gamma", "zzznope"], k=20).toPandas()
    want = _brute(rows, ["gamma"])[:20]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    victim = want[0][0]
    delete_docs(spark, root, [victim])
    s2 = Searcher(spark, root)
    got2 = s2.search_synonym(["gamma", "zzznope"], k=20).toPandas()
    assert victim not in set(int(d) for d in got2["doc"])


def _brute_lm_dirichlet(rows, terms, mode="or", mu=2000.0, deleted=()):
    # collection stats stay computed over ALL docs: deletes don't
    # rewrite the termdict/field stats until merge (Lucene liveDocs)
    toks = {r["doc_id"]: tokenize_text(r["text"]) for r in rows}
    dls = {d: len(t) for d, t in toks.items() if t}
    n_tok = sum(dls.values())
    out = []
    for d, t in toks.items():
        if d in deleted:
            continue
        acc, matched = 0.0, 0
        for m in sorted(set(terms)):
            tf = t.count(m)
            if not tf:
                continue
            matched += 1
            ttf = sum(u.count(m) for u in toks.values())
            p = float(np.float32(ttf + 1.0) / np.float32(n_tok + 1.0))
            dlq = int(bm25.quantize_doclen(np.array([len(t)]))[0])
            dl = float(bm25.LENGTH_TABLE[dlq])
            s = np.log(1.0 + tf / (mu * p)) + np.log(mu / (dl + mu))
            acc += float(np.float32(max(s, 0.0)))
        if matched and (mode == "or" or matched == len(set(terms))):
            out.append((d, np.float32(acc)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("mode", ["or", "and"])
def test_lm_dirichlet_matches_brute_force(spark, syn_index, mode):
    rows, root = syn_index
    s = Searcher(spark, root)
    dele = set() if s.deleted is None else set(int(d) for d in s.deleted)
    got = s.search_lm_dirichlet(["gamma", "zeta"], k=60, mode=mode).toPandas()
    want = _brute_lm_dirichlet(rows, ["gamma", "zeta"], mode, deleted=dele)[:60]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    for g, (_, w) in zip(got["score"], want):
        assert np.float32(g) == w


def test_lm_dirichlet_clamps_and_guards(spark, syn_index):
    rows, root = syn_index
    s = Searcher(spark, root)
    # tiny mu inflates the first log term; huge mu drives every score
    # toward ln(1 + tf/p*0) + ln(1) -> the clamp floor must hold >= 0
    dele = set() if s.deleted is None else set(int(d) for d in s.deleted)
    got = s.search_lm_dirichlet(["alpha"], k=300, mode="or", mu=0.5).toPandas()
    want = _brute_lm_dirichlet(rows, ["alpha"], "or", mu=0.5, deleted=dele)[:300]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    assert (got["score"] >= 0).all()
    with pytest.raises(ValueError, match="mu"):
        s.search_lm_dirichlet(["alpha"], mu=0.0)
    assert s.search_lm_dirichlet(["zzznope"], k=5).count() == 0
    assert s.search_lm_dirichlet(["zzznope", "alpha"], k=5, mode="and").count() == 0


def _brute_lm_jm(rows, terms, mode="or", lam=0.1, deleted=()):
    toks = {r["doc_id"]: tokenize_text(r["text"]) for r in rows}
    dls = {d: len(t) for d, t in toks.items() if t}
    n_tok = sum(dls.values())
    lam32 = np.float32(lam)
    one_minus = float(np.float32(1.0) - lam32)
    out = []
    for d, t in toks.items():
        if d in deleted:
            continue
        acc, matched = 0.0, 0
        for m in sorted(set(terms)):
            tf = t.count(m)
            if not tf:
                continue
            matched += 1
            ttf = sum(u.count(m) for u in toks.values())
            p = np.float32(ttf + 1.0) / np.float32(n_tok + 1.0)
            den = float(lam32 * p)
            dlq = int(bm25.quantize_doclen(np.array([len(t)]))[0])
            dl = float(bm25.LENGTH_TABLE[dlq])
            s = np.log(1.0 + (one_minus * tf / dl) / den)
            acc += float(np.float32(max(s, 0.0)))
        if matched and (mode == "or" or matched == len(set(terms))):
            out.append((d, np.float32(acc)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("mode", ["or", "and"])
def test_lm_jelinek_mercer_matches_brute_force(spark, syn_index, mode):
    rows, root = syn_index
    s = Searcher(spark, root)
    dele = set() if s.deleted is None else set(int(d) for d in s.deleted)
    got = s.search_lm_jelinek_mercer(["gamma", "zeta"], k=60, mode=mode).toPandas()
    want = _brute_lm_jm(rows, ["gamma", "zeta"], mode, deleted=dele)[:60]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    for g, (_, w) in zip(got["score"], want):
        assert np.float32(g) == w


def test_lm_jelinek_mercer_lambda_and_guards(spark, syn_index):
    rows, root = syn_index
    s = Searcher(spark, root)
    dele = set() if s.deleted is None else set(int(d) for d in s.deleted)
    got = s.search_lm_jelinek_mercer(["alpha"], k=300, lam=0.7).toPandas()
    want = _brute_lm_jm(rows, ["alpha"], "or", lam=0.7, deleted=dele)[:300]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    for bad in (0.0, 1.0, -0.5):
        with pytest.raises(ValueError, match="lambda"):
            s.search_lm_jelinek_mercer(["alpha"], lam=bad)
    assert s.search_lm_jelinek_mercer(["zzznope"], k=5).count() == 0


def _brute_dfi(rows, terms, mode="or", measure="standardized", deleted=()):
    toks = {r["doc_id"]: tokenize_text(r["text"]) for r in rows}
    dls = {d: len(t) for d, t in toks.items() if t}
    n_tok = sum(dls.values())
    mfns = {
        "standardized": lambda f, e: (f - e) / math.sqrt(e),
        "saturated": lambda f, e: (f - e) / e,
        "chisquared": lambda f, e: (f - e) * (f - e) / e,
    }
    mfn = mfns[measure]
    out = []
    for d, t in toks.items():
        if d in deleted:
            continue
        acc, matched = 0.0, 0
        for m in sorted(set(terms)):
            tf = t.count(m)
            if not tf:
                continue
            matched += 1
            ttf = sum(u.count(m) for u in toks.values())
            dlq = int(bm25.quantize_doclen(np.array([len(t)]))[0])
            dl = float(bm25.LENGTH_TABLE[dlq])
            expected = (ttf + 1.0) * dl / (n_tok + 1.0)
            s = math.log2(mfn(float(tf), expected) + 1.0) if tf > expected else 0.0
            acc += float(np.float32(s))
        if matched and (mode == "or" or matched == len(set(terms))):
            out.append((d, np.float32(acc)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("mode", ["or", "and"])
def test_dfi_matches_brute_force(spark, syn_index, mode):
    rows, root = syn_index
    s = Searcher(spark, root)
    dele = set() if s.deleted is None else set(int(d) for d in s.deleted)
    got = s.search_dfi(["gamma", "zeta"], k=60, mode=mode).toPandas()
    want = _brute_dfi(rows, ["gamma", "zeta"], mode, deleted=dele)[:60]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    for g, (_, w) in zip(got["score"], want):
        assert np.float32(g) == w


@pytest.mark.parametrize("measure", ["saturated", "chisquared"])
def test_dfi_measures_and_guards(spark, syn_index, measure):
    rows, root = syn_index
    s = Searcher(spark, root)
    dele = set() if s.deleted is None else set(int(d) for d in s.deleted)
    got = s.search_dfi(["alpha"], k=300, measure=measure).toPandas()
    want = _brute_dfi(rows, ["alpha"], "or", measure=measure, deleted=dele)[:300]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    # under-represented occurrences contribute exactly 0, never negative
    assert (got["score"] >= 0).all()
    with pytest.raises(ValueError, match="measure"):
        s.search_dfi(["alpha"], measure="nope")
    assert s.search_dfi(["zzznope"], k=5).count() == 0
    assert s.search_dfi(["zzznope", "alpha"], k=5, mode="and").count() == 0


# ---------------------------------------------------------- BooleanSimilarity


def _brute_boolean_sim(rows, terms, mode="or", boosts=None, deleted=()):
    toks = {r["doc_id"]: tokenize_text(r["text"]) for r in rows}
    out = []
    for d, t in toks.items():
        if d in deleted:
            continue
        matched = [m for m in sorted(set(terms)) if m in t]
        if not matched or (mode == "and" and len(matched) < len(set(terms))):
            continue
        sc = np.float32(
            sum(float(np.float32((boosts or {}).get(m, 1.0))) for m in matched)
        )
        out.append((d, sc))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def test_boolean_sim_matches_brute_force(spark, syn_index):
    rows, root = syn_index
    s = Searcher(spark, root)
    dele = set() if s.deleted is None else set(int(d) for d in s.deleted)
    boosts = {"gamma": 2.5, "zeta": 0.5, "alpha": 1.0}
    for mode in ("or", "and"):
        got = s.search_boolean_sim(
            ["gamma", "zeta", "alpha"], k=80, mode=mode, boosts=boosts
        ).toPandas()
        want = _brute_boolean_sim(
            rows, ["gamma", "zeta", "alpha"], mode, boosts, deleted=dele
        )[:80]
        assert [int(d) for d in got["doc"]] == [d for d, _ in want], mode
        for g, (_, w) in zip(got["score"], want):
            assert np.float32(g) == w


def test_boolean_sim_ignores_tf_and_length(spark, syn_index):
    """Two docs matching the same clause set score IDENTICALLY no
    matter their term frequencies or lengths — the similarity's whole
    point."""
    rows, root = syn_index
    s = Searcher(spark, root)
    dele = set() if s.deleted is None else set(int(d) for d in s.deleted)
    got = s.search_boolean_sim(["alpha"], k=300, mode="or").toPandas()
    assert got["score"].nunique() == 1
    assert float(got["score"].iloc[0]) == 1.0
    # and the hit SET equals the LIVE match set (no scoring cutoffs)
    match = {r["doc_id"] for r in rows
             if "alpha" in tokenize_text(r["text"])} - dele
    assert set(int(d) for d in got["doc"]) == match


def test_boolean_sim_guards(spark, syn_index):
    rows, root = syn_index
    s = Searcher(spark, root)
    with pytest.raises(ValueError, match="mode"):
        s.search_boolean_sim(["alpha"], mode="phrase")
    assert s.search_boolean_sim(["zzznope"], k=5).count() == 0
    assert s.search_boolean_sim(["zzznope", "alpha"], k=5, mode="and").count() == 0
    # absent term in or-mode simply contributes nothing
    got = s.search_boolean_sim(["zzznope", "alpha"], k=300, mode="or").toPandas()
    assert got["score"].nunique() == 1


# ------------------------------------------------------------ DFR (G, L, H2)


def _brute_dfr(rows, terms, mode="or", c=1.0, deleted=()):
    toks = {r["doc_id"]: tokenize_text(r["text"]) for r in rows}
    dls = {d: len(t) for d, t in toks.items() if t}
    n_docs = len(dls)
    avgdl = sum(dls.values()) / n_docs
    out = []
    for d, t in toks.items():
        if d in deleted or not t:
            continue
        acc, matched = 0.0, 0
        for m in sorted(set(terms)):
            tf = t.count(m)
            if not tf:
                continue
            matched += 1
            ttf = sum(tt.count(m) for tt in toks.values())
            lam = float(ttf) / float(n_docs)
            la = float(np.log2(1.0 + lam))
            lb = float(np.log2((1.0 + lam) / lam))
            dlq = float(bm25.LENGTH_TABLE[int(bm25.quantize_doclen(np.array([len(t)]))[0])])
            tfn = float(tf) * float(np.log2(1.0 + c * avgdl / dlq))
            acc += float(np.float32((la + tfn * lb) / (tfn + 1.0)))
        if matched and (mode == "or" or matched == len(set(terms))):
            out.append((d, np.float32(acc)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("mode", ["or", "and"])
def test_dfr_matches_brute_force(spark, syn_index, mode):
    rows, root = syn_index
    s = Searcher(spark, root)
    dele = set() if s.deleted is None else set(int(d) for d in s.deleted)
    got = s.search_dfr(["gamma", "zeta"], k=60, mode=mode).toPandas()
    want = _brute_dfr(rows, ["gamma", "zeta"], mode, deleted=dele)[:60]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    for g, (_, w) in zip(got["score"], want):
        assert np.float32(g) == w


def test_dfr_c_and_guards(spark, syn_index):
    rows, root = syn_index
    s = Searcher(spark, root)
    dele = set() if s.deleted is None else set(int(d) for d in s.deleted)
    got = s.search_dfr(["alpha"], k=60, c=7.0).toPandas()
    want = _brute_dfr(rows, ["alpha"], "or", c=7.0, deleted=dele)[:60]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    for g, (_, w) in zip(got["score"], want):
        assert np.float32(g) == w
    with pytest.raises(ValueError, match="c must"):
        s.search_dfr(["alpha"], c=0.0)
    with pytest.raises(ValueError, match="mode"):
        s.search_dfr(["alpha"], mode="phrase")
    assert s.search_dfr(["zzznope"], k=5).count() == 0
    assert s.search_dfr(["zzznope", "alpha"], k=5, mode="and").count() == 0


# ------------------------------------------------------- IB + Axiomatic


def _brute_ib(rows, terms, mode="or", dist="ll", lam_src="df", c=1.0, deleted=()):
    toks = {r["doc_id"]: tokenize_text(r["text"]) for r in rows}
    dls = {d: len(t) for d, t in toks.items() if t}
    n_docs = len(dls)
    avgdl = sum(dls.values()) / n_docs
    out = []
    for d, t in toks.items():
        if d in deleted or not t:
            continue
        acc, matched = 0.0, 0
        for m in sorted(set(terms)):
            tf = t.count(m)
            if not tf:
                continue
            matched += 1
            df = sum(1 for tt in toks.values() if m in tt)
            ttf = sum(tt.count(m) for tt in toks.values())
            lam = ((df if lam_src == "df" else ttf) + 1.0) / (n_docs + 1.0)
            dlq = float(bm25.LENGTH_TABLE[int(bm25.quantize_doclen(np.array([len(t)]))[0])])
            tfn = float(tf) * float(np.log2(1.0 + c * avgdl / dlq))
            if dist == "ll":
                v = -np.log2(lam / (lam + tfn))
            else:
                v = -np.log2((lam ** (tfn / (tfn + 1.0)) - lam) / (1.0 - lam))
            acc += float(np.float32(v))
        if matched and (mode == "or" or matched == len(set(terms))):
            out.append((d, np.float32(acc)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def _brute_axiomatic(rows, terms, mode="or", variant="f2exp", s=0.5, kp=0.35, deleted=()):
    toks = {r["doc_id"]: tokenize_text(r["text"]) for r in rows}
    dls = {d: len(t) for d, t in toks.items() if t}
    n_docs = len(dls)
    avgdl = sum(dls.values()) / n_docs
    out = []
    for d, t in toks.items():
        if d in deleted or not t:
            continue
        acc, matched = 0.0, 0
        for m in sorted(set(terms)):
            tf = t.count(m)
            if not tf:
                continue
            matched += 1
            df = sum(1 for tt in toks.values() if m in tt)
            if variant == "f2exp":
                idf = np.float32(((n_docs + 1.0) / df) ** kp)
            else:
                idf = np.float32(np.log((n_docs + 1.0) / df))
            dlq = float(bm25.LENGTH_TABLE[int(bm25.quantize_doclen(np.array([len(t)]))[0])])
            tfln = np.float32(tf / (tf + s + s * dlq / avgdl))
            acc += float(np.float32(tfln * idf))
        if matched and (mode == "or" or matched == len(set(terms))):
            out.append((d, np.float32(acc)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("mode,dist", [("or", "ll"), ("and", "ll"), ("or", "spl")])
def test_ib_matches_brute_force(spark, syn_index, mode, dist):
    rows, root = syn_index
    s = Searcher(spark, root)
    dele = set() if s.deleted is None else set(int(d) for d in s.deleted)
    got = s.search_ib(["gamma", "zeta"], k=60, mode=mode, distribution=dist).toPandas()
    want = _brute_ib(rows, ["gamma", "zeta"], mode, dist=dist, deleted=dele)[:60]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    for g, (_, w) in zip(got["score"], want):
        assert np.float32(g) == w


def test_ib_lambda_ttf_and_guards(spark, syn_index):
    rows, root = syn_index
    s = Searcher(spark, root)
    dele = set() if s.deleted is None else set(int(d) for d in s.deleted)
    got = s.search_ib(["alpha"], k=60, lambda_source="ttf", c=3.0).toPandas()
    want = _brute_ib(rows, ["alpha"], "or", lam_src="ttf", c=3.0, deleted=dele)[:60]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    for g, (_, w) in zip(got["score"], want):
        assert np.float32(g) == w
    with pytest.raises(ValueError, match="distribution"):
        s.search_ib(["alpha"], distribution="pl2")
    with pytest.raises(ValueError, match="lambda_source"):
        s.search_ib(["alpha"], lambda_source="idf")
    with pytest.raises(ValueError, match="c must"):
        s.search_ib(["alpha"], c=-1.0)
    assert s.search_ib(["zzznope"], k=5).count() == 0


@pytest.mark.parametrize("mode,variant", [("or", "f2exp"), ("and", "f2exp"), ("or", "f2log")])
def test_axiomatic_matches_brute_force(spark, syn_index, mode, variant):
    rows, root = syn_index
    s = Searcher(spark, root)
    dele = set() if s.deleted is None else set(int(d) for d in s.deleted)
    got = s.search_axiomatic(["gamma", "zeta"], k=60, mode=mode, variant=variant).toPandas()
    want = _brute_axiomatic(rows, ["gamma", "zeta"], mode, variant=variant, deleted=dele)[:60]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    for g, (_, w) in zip(got["score"], want):
        assert np.float32(g) == w


def test_axiomatic_params_and_guards(spark, syn_index):
    rows, root = syn_index
    s = Searcher(spark, root)
    dele = set() if s.deleted is None else set(int(d) for d in s.deleted)
    got = s.search_axiomatic(["alpha"], k=60, s=1.25, k_param=0.5).toPandas()
    want = _brute_axiomatic(rows, ["alpha"], "or", s=1.25, kp=0.5, deleted=dele)[:60]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    for g, (_, w) in zip(got["score"], want):
        assert np.float32(g) == w
    with pytest.raises(ValueError, match="variant"):
        s.search_axiomatic(["alpha"], variant="f1exp")
    with pytest.raises(ValueError, match="s must"):
        s.search_axiomatic(["alpha"], s=-0.5)
    assert s.search_axiomatic(["zzznope"], k=5).count() == 0
    assert s.search_axiomatic(["zzznope", "alpha"], k=5, mode="and").count() == 0
