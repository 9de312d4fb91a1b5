"""ToParentBlockJoin roll-up (child query -> parent entities).

Oracle: the engine's own full child match set (rank-identity of that
set is pinned elsewhere) re-aggregated in numpy with Lucene's
ScoreMode float semantics — f32 max/min, f64-sum-cast-f32 total,
f32(f64 sum / count) avg — then compared exactly.
"""

import numpy as np
import pytest

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


@pytest.fixture(scope="module")
def bj_index(spark, tmp_path_factory):
    rng = np.random.default_rng(13)
    rows = []
    doc = 0
    for conv in range(40):
        for _ in range(int(rng.integers(2, 8))):
            ln = int(rng.integers(2, 20))
            w = 1.0 / np.arange(1, len(WORDS) + 1)
            rows.append(
                {
                    "doc_id": doc,
                    "conv_id": conv,
                    "grp": f"g{conv % 5}",
                    "text": " ".join(rng.choice(WORDS, size=ln, p=w / w.sum())),
                }
            )
            doc += 1
    root = str(tmp_path_factory.mktemp("bj") / "idx")
    build_index(
        spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=4,
        keyword_fields={"grp": "grp"},
        stored_fields={"conv_id": "conv_id", "grp": "grp"},
    )
    return rows, Searcher(spark, root)


def _brute(rows, s, terms, mode, score_mode):
    hits = s.search_local(terms, k=len(rows) + 1, mode=mode)
    parent_of = {r["doc_id"]: r["conv_id"] for r in rows}
    groups = {}
    for _, h in hits.iterrows():
        groups.setdefault(parent_of[int(h["doc"])], []).append(np.float32(h["score"]))
    out = []
    for p, ss in groups.items():
        a = np.array(ss, dtype=np.float32)
        if score_mode == "max":
            sc = a.max()
        elif score_mode == "min":
            sc = a.min()
        elif score_mode == "total":
            sc = np.float32(a.astype(np.float64).sum())
        elif score_mode == "avg":
            sc = np.float32(a.astype(np.float64).sum() / len(a))
        else:
            sc = np.float32(0.0)
        out.append((p, sc, len(a)))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out


@pytest.mark.parametrize("score_mode", ["max", "total", "avg", "min", "none"])
def test_block_join_modes(spark, bj_index, score_mode):
    rows, s = bj_index
    got = (
        s.search_block_join(["alpha", "gamma"], "conv_id", k=15, score_mode=score_mode)
        .toPandas()
    )
    want = _brute(rows, s, ["alpha", "gamma"], "or", score_mode)[:15]
    assert [int(p) for p in got["parent"]] == [p for p, _, _ in want]
    assert [int(n) for n in got["n_children"]] == [n for _, _, n in want]
    for g, (_, w, _) in zip(got["score"], want):
        assert np.float32(g) == w


def test_block_join_and_mode(spark, bj_index):
    rows, s = bj_index
    got = (
        s.search_block_join(["alpha", "beta"], "conv_id", k=10, score_mode="max", mode="and")
        .toPandas()
    )
    want = _brute(rows, s, ["alpha", "beta"], "and", "max")[:10]
    assert [int(p) for p in got["parent"]] == [p for p, _, _ in want]


def test_join_util_self_join(spark, bj_index):
    """JoinUtil: from-query 'alpha' -> distinct grp values of its
    matches -> every doc whose grp keyword holds one of them."""
    rows, s = bj_index
    got = s.search_join(
        [{"term": "alpha", "occur": "must"}], "grp", "grp", k=len(rows) + 1
    ).toPandas()
    from fdblucene_spark.functions.analysis import tokenize_text

    grps = {r["grp"] for r in rows if "alpha" in tokenize_text(r["text"])}
    want = sorted(r["doc_id"] for r in rows if r["grp"] in grps)
    assert sorted(int(d) for d in got["doc"]) == want
    assert set(got["score"]) == {1.0}


def test_join_util_bounds_and_empty(spark, bj_index):
    rows, s = bj_index
    with pytest.raises(ValueError):
        s.search_join([{"term": "alpha", "occur": "must"}], "grp", "grp",
                      k=10, max_join_terms=1)
    assert s.search_join([{"term": "zzznope", "occur": "must"}], "grp", "grp", k=10).count() == 0
    with pytest.raises(ValueError):
        s.search_join([{"term": "alpha", "occur": "must"}], "nope", "grp", k=10)


def test_block_join_rejects_unstored_parent(spark, bj_index):
    _, s = bj_index
    with pytest.raises(ValueError):
        s.search_block_join(["alpha"], "nope", k=5)
    with pytest.raises(ValueError):
        s.search_block_join(["alpha"], "conv_id", score_mode="sum")


@pytest.mark.parametrize("combine", ["multiply", "add"])
def test_function_score(spark, bj_index, combine):
    rows, s = bj_index
    got = s.search_function_score(
        ["alpha", "gamma"], "conv_id", k=20, combine=combine
    ).toPandas()
    hits = s.search_local(["alpha", "gamma"], k=len(rows) + 1, mode="or")
    conv = {r["doc_id"]: float(r["conv_id"]) for r in rows}
    want = []
    for _, h in hits.iterrows():
        raw = float(np.float32(h["score"]))
        v = conv[int(h["doc"])]
        want.append((int(h["doc"]), raw * v if combine == "multiply" else raw + v))
    want.sort(key=lambda t: (-t[1], t[0]))
    assert [int(d) for d in got["doc"]] == [d for d, _ in want[:20]]
    for g, (_, w) in zip(got["score"], want):
        assert abs(g - w) < 1e-12


def test_function_score_guards(spark, bj_index):
    _, s = bj_index
    with pytest.raises(ValueError):
        s.search_function_score(["alpha"], "nope", k=5)
    with pytest.raises(ValueError):
        s.search_function_score(["alpha"], "conv_id", k=5, combine="max")


def test_to_child_fans_parent_scores_down(spark, bj_index):
    """ToChildBlockJoinQuery: every child of a matching parent scores
    the parent's folded score; rank (parent score desc, doc asc)."""
    rows, s = bj_index
    got = s.search_to_child(
        ["alpha", "gamma"], "conv_id", k=40, score_mode="total"
    ).toPandas()
    pscore = {p: sc for p, sc, _ in _brute(rows, s, ["alpha", "gamma"], "or", "total")}
    want = [
        (r["doc_id"], r["conv_id"], pscore[r["conv_id"]])
        for r in rows
        if r["conv_id"] in pscore
    ]
    want.sort(key=lambda t: (-t[2], t[0]))
    want = want[:40]
    assert [int(d) for d in got["doc"]] == [d for d, _, _ in want]
    assert [int(p) for p in got["parent"]] == [p for _, p, _ in want]
    for g, (_, _, w) in zip(got["score"], want):
        assert np.float32(g) == w


def test_to_child_includes_unmatched_children(spark, bj_index):
    """Children that did NOT match the child query still return when
    their parent matched (Lucene's child iterator walks the block)."""
    rows, s = bj_index
    hits = s.search_local(["alpha"], k=len(rows) + 1, mode="or")
    matched_docs = {int(h["doc"]) for _, h in hits.iterrows()}
    matched_parents = {r["conv_id"] for r in rows if r["doc_id"] in matched_docs}
    got = s.search_to_child(["alpha"], "conv_id", k=len(rows) + 1).toPandas()
    got_docs = {int(d) for d in got["doc"]}
    expected_docs = {r["doc_id"] for r in rows if r["conv_id"] in matched_parents}
    assert got_docs == expected_docs
    assert not got_docs <= matched_docs  # some returned turns didn't match


def test_to_child_guards(spark, bj_index):
    _, s = bj_index
    with pytest.raises(ValueError):
        s.search_to_child(["alpha"], "nope", k=5)
    with pytest.raises(ValueError):
        s.search_to_child(["alpha"], "conv_id", k=5, score_mode="sum")


def test_search_collapse_matches_brute(spark, bj_index):
    """Field collapsing: best doc per grp (score desc, doc asc inside
    a key), winners ranked (score desc, doc asc), cut to k."""
    rows, s = bj_index
    got = s.search_collapse(["alpha", "gamma"], "grp", k=4).toPandas()
    hits = s.search_local(["alpha", "gamma"], k=len(rows) + 1, mode="or")
    grp_of = {r["doc_id"]: r["grp"] for r in rows}
    best = {}
    for _, h in hits.iterrows():
        g = grp_of[int(h["doc"])]
        cand = (np.float32(h["score"]), -int(h["doc"]))
        if g not in best or cand > best[g]:
            best[g] = cand
    want = sorted(
        ((g, -c[1], c[0]) for g, c in best.items()),
        key=lambda t: (-t[2], t[1]),
    )[:4]
    assert list(got["grp"]) == [g for g, _, _ in want]
    assert [int(d) for d in got["doc"]] == [d for _, d, _ in want]
    for g, (_, _, w) in zip(got["score"], want):
        assert np.float32(g) == w


def test_search_collapse_guards(spark, bj_index):
    _, s = bj_index
    with pytest.raises(ValueError):
        s.search_collapse(["alpha"], "nope", k=5)
    assert s.search_collapse(["zzznope"], "grp", k=5).count() == 0


def test_to_child_excludes_tombstoned_children(spark, tmp_path_factory):
    """Deleted children must not come back through the fan-down
    (liveDocs semantics) even though the stored table still holds
    their rows until repack."""
    from fdblucene_spark.operators.build import build_index
    from fdblucene_spark.operators.deletes import delete_docs

    rows = [
        {"doc_id": i, "conv_id": i // 4, "text": "alpha beta" if i % 4 == 0 else "beta"}
        for i in range(40)
    ]
    root = str(tmp_path_factory.mktemp("tc-del") / "idx")
    build_index(
        spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=2,
        stored_fields={"conv_id": "conv_id"},
    )
    delete_docs(spark, root, [1, 5, 9])
    s = Searcher(spark, root)
    got = {int(r["doc"]) for r in s.search_to_child(["alpha"], "conv_id", k=100).collect()}
    assert got, "parents should match"
    assert not got & {1, 5, 9}, "tombstoned children leaked through fan-down"
    # all surviving children of matching parents present
    matched_parents = {r["conv_id"] for r in rows if "alpha" in r["text"]}
    want = {
        r["doc_id"] for r in rows
        if r["conv_id"] in matched_parents and r["doc_id"] not in (1, 5, 9)
    }
    assert got == want


def test_search_diversified_matches_brute(spark, bj_index):
    """DiversifiedTopDocsCollector: at most max_per_key docs per key
    (within-key rank by score desc, doc asc), survivors ranked
    (score desc, doc asc) and cut to k."""
    rows, s = bj_index
    got = s.search_diversified(["alpha", "gamma"], "grp", k=6, max_per_key=2).toPandas()
    hits = s.search_local(["alpha", "gamma"], k=len(rows) + 1, mode="or")
    grp_of = {r["doc_id"]: r["grp"] for r in rows}
    per_key: dict = {}
    ranked = sorted(
        ((np.float32(h["score"]), int(h["doc"])) for _, h in hits.iterrows()),
        key=lambda t: (-t[0], t[1]),
    )
    want = []
    for sc, d in ranked:
        g = grp_of[d]
        per_key[g] = per_key.get(g, 0) + 1
        if per_key[g] <= 2:
            want.append((g, d, sc, per_key[g]))
    want = want[:6]
    assert [int(d) for d in got["doc"]] == [d for _, d, _, _ in want]
    assert list(got["grp"]) == [g for g, _, _, _ in want]
    assert [int(r) for r in got["rn"]] == [r for _, _, _, r in want]
    for g, (_, _, w, _) in zip(got["score"], want):
        assert np.float32(g) == w


def test_search_diversified_collapse_equivalence(spark, bj_index):
    """max_per_key=1 reproduces field collapsing exactly."""
    rows, s = bj_index
    div = s.search_diversified(["alpha", "gamma"], "grp", k=4, max_per_key=1).toPandas()
    col = s.search_collapse(["alpha", "gamma"], "grp", k=4).toPandas()
    assert [int(d) for d in div["doc"]] == [int(d) for d in col["doc"]]
    assert list(div["grp"]) == list(col["grp"])


def test_search_diversified_guards(spark, bj_index):
    _, s = bj_index
    with pytest.raises(ValueError):
        s.search_diversified(["alpha"], "nope", k=5)
    with pytest.raises(ValueError):
        s.search_diversified(["alpha"], "grp", k=5, max_per_key=0)
