"""PhraseQuery / MultiPhraseQuery phrase-frequency scoring.

Oracle: brute force in numpy through functions/bm25 — per-doc freq =
count of start positions whose slot chain completes (each start once,
whatever the alternative completion), weight = float32(double-sum of
member float32 idfs, one addend per (slot, present term)), one
tf_norm on the phrase freq. Also pins the semantic difference from
search(mode='phrase'), which sums the member terms' own BM25 scores.

Reference parity: Lucene 8 PhraseWeight/MultiPhraseQuery build one
TermStatistics per phrase position and score BM25Scorer.score(
phraseFreq, norm); the reference delegates this to Lucene
(/root/reference/README.md:53).
"""

import numpy as np
import pytest

from fdblucene_spark.functions import bm25
from fdblucene_spark.functions.analysis import tokenize_text
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.deletes import delete_docs
from fdblucene_spark.operators.query import Searcher
from fdblucene_spark.sources.manifest import IndexCatalog

WORDS = ["red", "blue", "green", "fox", "dog", "cat", "runs", "jumps"]


@pytest.fixture(scope="module")
def mp_index(spark, tmp_path_factory):
    rng = np.random.default_rng(41)
    rows = []
    for i in range(240):
        ln = int(rng.integers(3, 30))
        toks = list(rng.choice(WORDS, size=ln))
        # plant "red fox" / "red dog" bigrams, several per doc for some
        if i % 5 == 0:
            for j in range(1 + i % 3):
                pos = int(rng.integers(0, len(toks)))
                toks[pos:pos] = ["red", "fox" if (i + j) % 2 == 0 else "dog"]
        rows.append({"doc_id": i, "text": " ".join(toks)})
    root = str(tmp_path_factory.mktemp("mp") / "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=4)
    return rows, root


def _brute(rows, slots, deleted=()):
    norm_slots = [(c,) if isinstance(c, str) else tuple(c) for c in slots]
    toks = {r["doc_id"]: tokenize_text(r["text"]) for r in rows}
    dls = {d: len(t) for d, t in toks.items() if t}
    n_docs = len(dls)
    avgdl = sum(dls.values()) / n_docs
    dfs = {}
    for c in norm_slots:
        for m in c:
            dfs.setdefault(m, sum(1 for t in toks.values() if m in t))
    # idfExplain: f32 per-term idf, f64 accumulation, one addend per
    # (slot, member); absent terms (df=0) are skipped TermStates
    w_acc = np.float64(0.0)
    for c in norm_slots:
        for m in c:
            if dfs[m] > 0:
                w_acc += np.float64(np.float32(bm25.idf(float(dfs[m]), n_docs)))
    w32 = np.float32(w_acc)
    out = []
    for d, t in toks.items():
        if d in deleted:
            continue
        freq = sum(
            1
            for p in range(len(t) - len(norm_slots) + 1)
            if all(t[p + i] in norm_slots[i] for i in range(len(norm_slots)))
        )
        if not freq:
            continue
        dlq = int(bm25.quantize_doclen(np.array([len(t)]))[0])
        tfn = np.float32(bm25.tf_norm(np.array([freq]), np.array([dlq]), avgdl)[0])
        out.append((d, np.float32(w32 * tfn), freq))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def test_exact_phrase_matches_brute_force(spark, mp_index):
    rows, root = mp_index
    s = Searcher(spark, root)
    got = s.search_multi_phrase(["red", "fox"], k=100).toPandas()
    want = _brute(rows, ["red", "fox"])[:100]
    assert [int(d) for d in got["doc"]] == [d for d, _, _ in want]
    for g, (_, w, _) in zip(got["score"], want):
        assert np.float32(g) == w
    # the corpus plants multi-occurrence docs — freq>1 must be exercised
    assert any(f > 1 for _, _, f in want)


def test_multi_phrase_alternatives_and_absent_term(spark, mp_index):
    rows, root = mp_index
    s = Searcher(spark, root)
    slots = ["red", ("fox", "dog", "zzzabsent")]
    got = s.search_multi_phrase(slots, k=200).toPandas()
    want = _brute(rows, slots)[:200]
    assert [int(d) for d in got["doc"]] == [d for d, _, _ in want]
    for g, (_, w, _) in zip(got["score"], want):
        assert np.float32(g) == w
    # dropping the absent alternative changes nothing (0-df TermStates)
    got2 = s.search_multi_phrase(["red", ("fox", "dog")], k=200).toPandas()
    assert got2["doc"].tolist() == got["doc"].tolist()
    assert got2["score"].tolist() == got["score"].tolist()


def test_phrase_freq_scoring_differs_from_member_sum(spark, mp_index):
    """search(mode='phrase') scores matching docs as the SUM of the
    member terms' full BM25 scores; the Lucene phrase scorer uses the
    phrase frequency. Same match set, different scores."""
    rows, root = mp_index
    s = Searcher(spark, root)
    freq_hits = s.search_multi_phrase(["red", "fox"], k=300).toPandas()
    sum_hits = s.search(["red", "fox"], k=300, mode="phrase").toPandas()
    assert sorted(freq_hits["doc"]) == sorted(sum_hits["doc"])
    fmap = dict(zip(freq_hits["doc"], freq_hits["score"]))
    smap = dict(zip(sum_hits["doc"], sum_hits["score"]))
    assert any(np.float32(fmap[d]) != np.float32(smap[d]) for d in fmap)


def test_multi_phrase_respects_deletes(spark, mp_index):
    rows, root = mp_index
    base = _brute(rows, ["red", "fox"])
    victim = base[0][0]
    pre_version = IndexCatalog(root).load().version
    delete_docs(spark, root, [victim])
    s = Searcher(spark, root)
    got = s.search_multi_phrase(["red", "fox"], k=100).toPandas()
    want = _brute(rows, ["red", "fox"], deleted={victim})[:100]
    assert [int(d) for d in got["doc"]] == [d for d, _, _ in want]
    for g, (_, w, _) in zip(got["score"], want):
        assert np.float32(g) == w
    # snapshot pin: the pre-delete version still sees the victim
    s_old = Searcher(spark, root, version=pre_version)
    assert victim in set(
        s_old.search_multi_phrase(["red", "fox"], k=100).toPandas()["doc"]
    )


def test_multi_phrase_validation_and_empty(spark, mp_index):
    rows, root = mp_index
    s = Searcher(spark, root)
    with pytest.raises(ValueError):
        s.search_multi_phrase(["red"], k=10)
    with pytest.raises(ValueError):
        s.search_multi_phrase(["red", ()], k=10)
    # absent single-term slot can never match
    assert s.search_multi_phrase(["red", "zzzabsent"], k=10).count() == 0


def test_phrase_wildcard_expands_to_multi_phrase(spark, mp_index):
    """PhraseWildcardQuery = capped MultiTermQuery expansion per
    pattern slot + the MultiPhraseQuery scorer: results must be
    bit-identical to search_multi_phrase over the engine's own
    expansion (df desc, term asc order), empty expansions kill the
    phrase, max_expansions caps the alternative set."""
    rows, root = mp_index
    # pin the fresh-build snapshot: an earlier test tombstones a doc
    # in this shared index, and the pin doubles as time-travel
    # coverage for the new surface
    s = Searcher(spark, root, version=1)
    # single-expansion prefix: 'd' -> {dog}
    got = s.search_phrase_wildcard(["red", {"prefix": "d"}], k=100).toPandas()
    want = _brute(rows, ["red", ("dog",)])[:100]
    assert [int(d) for d in got["doc"]] == [d for d, _, _ in want]
    for g, (_, w, _) in zip(got["score"], want):
        assert np.float32(g) == w
    # multi-term expansion both slots: 'r*' -> {red, runs},
    # '*o*' -> {fox, dog}; alternative order = expansion order
    exp_r = s.expand_terms("text", prefix="r")
    exp_o = s.expand_terms("text", wildcard="*o*")
    assert set(exp_r) == {"red", "runs"} and set(exp_o) == {"fox", "dog"}
    got2 = s.search_phrase_wildcard(
        [{"prefix": "r"}, {"wildcard": "*o*"}], k=100
    ).toPandas()
    want2 = _brute(rows, [tuple(exp_r), tuple(exp_o)])[:100]
    assert [int(d) for d in got2["doc"]] == [d for d, _, _ in want2]
    for g, (_, w, _) in zip(got2["score"], want2):
        assert np.float32(g) == w
    # the cap keeps the top-1 by (df desc, term asc)
    got3 = s.search_phrase_wildcard(
        [{"prefix": "r"}, "fox"], k=100, max_expansions=1
    ).toPandas()
    want3 = _brute(rows, [(exp_r[0],), "fox"])[:100]
    assert [int(d) for d in got3["doc"]] == [d for d, _, _ in want3]
    # empty expansion -> empty result; malformed slot dict raises
    assert s.search_phrase_wildcard(["red", {"prefix": "zzz"}], k=10).count() == 0
    with pytest.raises(ValueError):
        s.search_phrase_wildcard(["red", {"regex": "d.*"}], k=10)


# ---- PhraseQuery.Builder.add(term, position) gap phrases ----

def _brute_gap(rows, slots, positions):
    norm_slots = [(c,) if isinstance(c, str) else tuple(c) for c in slots]
    offs = [p - positions[0] for p in positions]
    toks = {r["doc_id"]: tokenize_text(r["text"]) for r in rows}
    dls = {d: len(t) for d, t in toks.items() if t}
    n_docs = len(dls)
    avgdl = sum(dls.values()) / n_docs
    dfs = {}
    for c in norm_slots:
        for m in c:
            dfs.setdefault(m, sum(1 for t in toks.values() if m in t))
    w_acc = np.float64(0.0)
    for c in norm_slots:
        for m in c:
            if dfs[m] > 0:
                w_acc += np.float64(np.float32(bm25.idf(float(dfs[m]), n_docs)))
    w32 = np.float32(w_acc)
    out = []
    for d, t in toks.items():
        freq = sum(
            1
            for p in range(len(t) - offs[-1])
            if all(t[p + offs[i]] in norm_slots[i] for i in range(len(norm_slots)))
        )
        if not freq:
            continue
        dlq = int(bm25.quantize_doclen(np.array([len(t)]))[0])
        tfn = np.float32(bm25.tf_norm(np.array([freq]), np.array([dlq]), avgdl)[0])
        out.append((d, np.float32(w32 * tfn)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def test_phrase_gap_positions_match_brute(spark, mp_index):
    rows, root = mp_index
    s = Searcher(spark, root)
    for slots, positions in [
        (["red", "runs"], [0, 2]),        # red ? runs
        (["red", ("fox", "dog")], [0, 2]),  # alternatives after a gap
        (["red", "fox", "runs"], [0, 1, 4]),  # mixed contiguous + gap
    ]:
        got = s.search_multi_phrase(slots, k=100, positions=positions).toPandas()
        want = _brute_gap(rows, slots, positions)[:100]
        assert [int(d) for d in got["doc"]] == [d for d, _ in want], (slots, positions)
        for g, (_, w) in zip(got["score"], want):
            assert np.float32(g) == w


def test_phrase_gap_reduces_to_contiguous_and_guards(spark, mp_index):
    rows, root = mp_index
    s = Searcher(spark, root)
    # positions [0, 1] is exactly the default contiguous phrase
    a = {(r["doc"], r["score"]) for r in
         s.search_multi_phrase(["red", "fox"], k=100, positions=[0, 1]).collect()}
    b = {(r["doc"], r["score"]) for r in
         s.search_multi_phrase(["red", "fox"], k=100).collect()}
    assert a == b and a
    # base offset is normalized away: [5, 7] == [0, 2]
    c = {(r["doc"], r["score"]) for r in
         s.search_multi_phrase(["red", "runs"], k=100, positions=[5, 7]).collect()}
    d = {(r["doc"], r["score"]) for r in
         s.search_multi_phrase(["red", "runs"], k=100, positions=[0, 2]).collect()}
    assert c == d
    with pytest.raises(ValueError, match="align"):
        s.search_multi_phrase(["red", "fox"], k=5, positions=[0])
    with pytest.raises(ValueError, match="increasing"):
        s.search_multi_phrase(["red", "fox"], k=5, positions=[2, 2])
