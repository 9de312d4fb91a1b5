"""SweetSpotSimilarity (lucene/misc) oracle tests.

Brute-force referee replays the exact float chain: Classic idf,
baseline-floor or hyperbolic tf, plateau length norm over the
SmallFloat-quantized length. Also pins the reduction law: with all
defaults search_sweet_spot is bit-identical to search_classic.
Ref parity target: the reference reaches SweetSpotSimilarity through
stock Lucene 8 setSimilarity (pom.xml lucene-core); semantics per
misc/SweetSpotSimilarity.java.
"""

import numpy as np
import pytest

from fdblucene_spark.functions import bm25
from fdblucene_spark.functions.analysis import tokenize_text
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
LN = (4, 10)  # plateau straddles the corpus's 2..24 token lengths
STEEP = 0.4
TF = (1.5, 2.0)  # (tf_base, tf_min): freq 1 and 2 hit the floor
HYP = (0.5, 3.0, 1.6, 2.5)  # (h_min, h_max, h_base, h_xoffset)


@pytest.fixture(scope="module")
def ss_index(spark, tmp_path_factory):
    rng = np.random.default_rng(31)
    rows = []
    for i in range(220):
        ln = int(rng.integers(2, 25))
        w = 1.0 / np.arange(1, len(WORDS) + 1)
        rows.append(
            {"doc_id": i, "text": " ".join(rng.choice(WORDS, size=ln, p=w / w.sum()))}
        )
    root = str(tmp_path_factory.mktemp("ss") / "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=4)
    return rows, root


def _tf32(tf, hyperbolic):
    if hyperbolic is not None:
        h_min, h_max, h_base, h_xoff = hyperbolic
        return np.float32(
            h_min
            + (h_max - h_min) / 2.0 * (np.tanh((tf - h_xoff) * np.log(h_base)) + 1.0)
        )
    t_base, t_min = TF
    if tf <= t_min:
        return np.float32(t_base)
    return np.float32(np.sqrt(tf + t_base * t_base - t_min))


def _brute(rows, terms, mode="or", hyperbolic=None, ln=LN, steep=STEEP):
    toks = {r["doc_id"]: tokenize_text(r["text"]) for r in rows}
    n = sum(1 for t in toks.values() if t)
    lo, hi = float(ln[0]), float(ln[1])
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
            L = max(float(bm25.LENGTH_TABLE[dlq]), 1.0)
            nrm = np.float32(
                1.0 / np.sqrt(steep * (abs(L - lo) + abs(L - hi) - (hi - lo)) + 1.0)
            )
            acc += float(np.float32(np.float32(_tf32(float(tf), hyperbolic) * w) * nrm))
        if matched and (mode == "or" or matched == len(set(terms))):
            out.append((d, np.float32(acc)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("mode", ["or", "and"])
def test_sweet_spot_matches_brute_force(spark, ss_index, mode):
    rows, root = ss_index
    s = Searcher(spark, root)
    got = s.search_sweet_spot(
        ["gamma", "zeta"], k=80, mode=mode,
        ln_min=LN[0], ln_max=LN[1], steepness=STEEP,
        tf_base=TF[0], tf_min=TF[1],
    ).toPandas()
    want = _brute(rows, ["gamma", "zeta"], mode)[:80]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    for g, (_, w) in zip(got["score"], want):
        assert np.float32(g) == w


def test_sweet_spot_defaults_reduce_to_classic(spark, ss_index):
    rows, root = ss_index
    s = Searcher(spark, root)
    ss = s.search_sweet_spot(["gamma", "beta"], k=200).toPandas()
    cl = s.search_classic(["gamma", "beta"], k=200).toPandas()
    assert [int(d) for d in ss["doc"]] == [int(d) for d in cl["doc"]]
    assert all(np.float32(a) == np.float32(b) for a, b in zip(ss["score"], cl["score"]))


def test_sweet_spot_hyperbolic_matches_brute_force(spark, ss_index):
    rows, root = ss_index
    s = Searcher(spark, root)
    got = s.search_sweet_spot(
        ["alpha"], k=80,
        ln_min=LN[0], ln_max=LN[1], steepness=STEEP, hyperbolic=HYP,
    ).toPandas()
    want = _brute(rows, ["alpha"], hyperbolic=HYP)[:80]
    assert [int(d) for d in got["doc"]] == [d for d, _ in want]
    for g, (_, w) in zip(got["score"], want):
        assert np.float32(g) == w


def test_sweet_spot_hyperbolic_saturates():
    # the S-curve is bounded: tf contribution lives in (h_min, h_max)
    # and is monotone — spam repetition stops paying
    vals = [float(_tf32(f, HYP)) for f in (1, 2, 3, 5, 10, 100, 10000)]
    assert all(HYP[0] < v < HYP[1] + 1e-6 for v in vals)
    assert vals == sorted(vals)
    assert vals[-1] == pytest.approx(HYP[1], abs=1e-4)


def test_sweet_spot_plateau_is_flat_inside(spark, ss_index):
    # two docs whose quantized lengths both land inside [lo, hi] get
    # the SAME norm factor: the per-term score depends only on tf
    lo, hi = float(LN[0]), float(LN[1])
    for L in (4.0, 6.0, 8.0, 10.0):
        assert STEEP * (abs(L - lo) + abs(L - hi) - (hi - lo)) == 0.0


def test_sweet_spot_guards(spark, ss_index):
    _, root = ss_index
    s = Searcher(spark, root)
    with pytest.raises(ValueError):
        s.search_sweet_spot(["alpha"], mode="xor")
    with pytest.raises(ValueError):
        s.search_sweet_spot(["alpha"], ln_min=5, ln_max=3)
    with pytest.raises(ValueError):
        s.search_sweet_spot(["alpha"], steepness=0.0)
    with pytest.raises(ValueError):
        s.search_sweet_spot(["alpha"], hyperbolic=(1.0, 2.0, 1.0, 0.0))
    assert s.search_sweet_spot(["zzznope"], k=5).count() == 0
    assert s.search_sweet_spot(["zzznope", "alpha"], k=5, mode="and").count() == 0
