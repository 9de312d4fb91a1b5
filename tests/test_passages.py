"""Passage ranking (Searcher.highlight_passages).

Laws:
- exact-float brute-force oracle: fixed token-window passages,
  contribution f32(f32(idf) * tf/(tf+1)) summed in f64, final f32,
  top max_passages per hit by (p_score desc, passage asc);
- every returned doc is a top-k hit with its hit score attached;
- stability across repeated runs (the docs= pushdown must not
  drop occurrences whatever the block layout);
- guards.
"""

import numpy as np
import pytest

from fdblucene_spark.functions import bm25
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

TERMS = ["alpha", "beta"]


def _rows():
    return [
        {
            "doc_id": i,
            "text": " ".join(
                (["alpha"] * (1 + i % 3) + ["filler"] * 7 + ["beta"] * (i % 2) + ["pad"] * 6)
                * 3
            ),
        }
        for i in range(20)
    ]


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    rows = _rows()
    root = str(tmp_path_factory.mktemp("psg") / "idx")
    build_index(
        spark,
        spark.createDataFrame(rows),
        root,
        doc_col="doc_id",
        n_shards=2,
        keyword_fields={},
        store_offsets=True,
    )
    return rows, root


def _oracle(rows, hits, w, m):
    toks = {r["doc_id"]: r["text"].split() for r in rows}
    n_docs = len(rows)
    dfs = {t: sum(1 for ts in toks.values() if t in ts) for t in TERMS}
    idf = {t: np.float32(bm25.idf(dfs[t], n_docs)) for t in TERMS if dfs[t] > 0}
    out = []
    for d, score in hits:
        ptf = {}
        for i, t in enumerate(toks[d]):
            if t in idf:
                key = (i // w, t)
                ptf[key] = ptf.get(key, 0) + 1
        ps = {}
        for (p, t), tf in ptf.items():
            c = np.float32(np.float64(idf[t]) * (tf / (tf + 1.0)))
            s, n = ps.get(p, (np.float64(0.0), 0))
            ps[p] = (s + np.float64(c), n + tf)
        ranked = sorted(
            ((p, np.float32(s), n) for p, (s, n) in ps.items()),
            key=lambda x: (-x[1], x[0]),
        )[:m]
        for p, s, n in sorted(ranked, key=lambda x: (-x[1], x[0])):
            out.append((d, score, p, float(s), n))
    return sorted(out)


def test_passages_brute_force(spark, pidx):
    rows, root = pidx
    s = Searcher(spark, root)
    hits = [(int(r["doc"]), np.float32(r["score"])) for r in s.search(TERMS, 5, "or").collect()]
    got = sorted(
        (int(r["doc"]), np.float32(r["score"]), int(r["passage"]), float(np.float32(r["p_score"])), int(r["n_occ"]))
        for r in s.highlight_passages(TERMS, k=5, passage_len=10, max_passages=2).collect()
    )
    assert got == _oracle(rows, hits, 10, 2)


@pytest.mark.parametrize("w,m", [(5, 1), (16, 3)])
def test_passages_geometries(spark, pidx, w, m):
    rows, root = pidx
    s = Searcher(spark, root)
    hits = [(int(r["doc"]), np.float32(r["score"])) for r in s.search(TERMS, 8, "or").collect()]
    got = sorted(
        (int(r["doc"]), np.float32(r["score"]), int(r["passage"]), float(np.float32(r["p_score"])), int(r["n_occ"]))
        for r in s.highlight_passages(TERMS, k=8, passage_len=w, max_passages=m).collect()
    )
    assert got == _oracle(rows, hits, w, m)


def test_passages_stable_across_runs(spark, pidx):
    rows, root = pidx
    s = Searcher(spark, root)
    base = sorted(
        map(tuple, s.highlight_passages(TERMS, k=5, passage_len=10, max_passages=2).collect())
    )
    for _ in range(3):
        again = sorted(
            map(tuple, s.highlight_passages(TERMS, k=5, passage_len=10, max_passages=2).collect())
        )
        assert again == base


def test_passages_guards_and_empty(spark, pidx):
    rows, root = pidx
    s = Searcher(spark, root)
    with pytest.raises(ValueError, match="passage_len"):
        s.highlight_passages(TERMS, k=5, passage_len=0)
    with pytest.raises(ValueError, match="max_passages"):
        s.highlight_passages(TERMS, k=5, max_passages=0)
    assert s.highlight_passages(["zzz_absent"], k=5).count() == 0
