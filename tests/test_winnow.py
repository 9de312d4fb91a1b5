"""Winnowing fingerprints (textstats.winnow_fingerprints — Schleimer
et al. 2003, the MOSS base scheme).

Laws:
- pure-Python referee (md5 gram hashes, rightmost-min window picks,
  short-doc single-pick rule) matches exactly at 3 (k, window)
  points;
- the winnowing GUARANTEE: two docs sharing a run of >= k+window-1
  tokens share at least one fingerprint;
- density: the fingerprint count is a small fraction of the gram
  count on a long random-ish doc (~2/(window+1));
- partition invariance; byte-identity vs the DuckDB twin; guards.
"""

import hashlib

import duckdb
import pytest

from fdblucene_spark.operators.textstats import (
    winnow_fingerprints,
    winnow_fingerprints_sql,
)

DOCS = [
    (0, "a b c d e f g h i j a b c d e"),
    (1, "x y"),
    (2, None),
    (3, "a b c d e"),
    (4, "one two three four five six seven eight nine ten eleven twelve"),
    (5, "Shared run HERE: a b c d e f g h END differs totally now"),
]


def _ref(text, k, w):
    if text is None:
        return set()
    import re

    ts = [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]
    if len(ts) < k:
        return set()
    grams = [
        int(hashlib.md5(" ".join(ts[i : i + k]).encode()).hexdigest()[:8], 16)
        for i in range(len(ts) - k + 1)
    ]
    picks = set()
    width = min(w, len(grams))
    for j in range(max(len(grams) - w + 1, 1)):
        win = grams[j : j + width]
        mn = min(win)
        picks.add((j + max(i for i, v in enumerate(win) if v == mn), mn))
    return picks


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("k,w", [(3, 4), (5, 4), (2, 6)])
def test_winnow_referee(spark, docs, k, w):
    got = {}
    for r in winnow_fingerprints(docs, "doc_id", "text", k=k, window=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, text in DOCS:
        assert got.get(i, set()) == _ref(text, k, w), (i, k, w)


def test_winnow_shared_run_guarantee(spark, docs):
    # docs 0 and 5 share the 8-token run 'a b c d e f g h'
    # (>= k + window - 1 = 6 tokens) -> at least one shared fp
    rows = winnow_fingerprints(docs, "doc_id", "text", k=3, window=4).collect()
    fps = {}
    for r in rows:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[5]
    assert fps[0] & fps[3]  # the 5-token prefix run also suffices
    assert not fps.get(4, set()) & fps[0]  # disjoint vocab shares nothing


def test_winnow_density(spark):
    text = " ".join(f"w{(i * 7919) % 4001}" for i in range(3000))
    df = spark.createDataFrame([(9, text)], "doc_id long, text string")
    n = winnow_fingerprints(df, "doc_id", "text", k=5, window=8).count()
    grams = 3000 - 4
    # expected density 2/(w+1) ~ 0.22; allow generous slack
    assert 0.1 * grams < n < 0.4 * grams, n


def test_winnow_invariance_twin_guards(spark, docs):
    a = sorted(map(tuple, winnow_fingerprints(docs, "doc_id", "text").collect()))
    b = sorted(
        map(tuple, winnow_fingerprints(docs.repartition(5), "doc_id", "text").collect())
    )
    assert a == b
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", DOCS)
    twin = sorted(
        map(tuple, con.execute(winnow_fingerprints_sql("tt", "doc_id", "text")).fetchall())
    )
    assert a == twin
    with pytest.raises(ValueError, match="k must"):
        winnow_fingerprints(docs, "doc_id", "text", k=0)
    with pytest.raises(ValueError, match="window"):
        winnow_fingerprints(docs, "doc_id", "text", window=0)
    with pytest.raises(ValueError, match=">= 1"):
        winnow_fingerprints_sql("tt", "doc_id", "text", k=0)


def test_winnow_candidate_pairs(spark):
    from fdblucene_spark.operators.dedup import (
        winnow_candidate_pairs,
        winnow_candidate_pairs_sql,
    )
    import duckdb

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "X alpha beta gamma delta epsilon zeta eta theta Y other tail"),
        (2, "unrelated words entirely other vocabulary stream flowing"),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(
            tuple,
            winnow_candidate_pairs(
                df, "doc_id", "text", k=3, window=4, min_shared=1
            ).collect(),
        )
    )
    pairs = {(a, b) for a, b, _ in got}
    # 0/3 exact dup; 0/1 and 1/3 share the 8-token run (>= k+w-1=6)
    assert {(0, 1), (0, 3), (1, 3)} <= pairs
    assert not any(2 in (a, b) for a, b in pairs)
    # exact dup shares at least as many fps as the partial overlap
    n = {(a, b): s for a, b, s in got}
    assert n[(0, 3)] >= n[(0, 1)]
    # twin identity + partition invariance
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", rows)
    twin = sorted(
        map(
            tuple,
            con.execute(
                winnow_candidate_pairs_sql("tt", "doc_id", "text", k=3, window=4, min_shared=1)
            ).fetchall(),
        )
    )
    assert got == twin
    again = sorted(
        map(
            tuple,
            winnow_candidate_pairs(
                df.repartition(3), "doc_id", "text", k=3, window=4, min_shared=1
            ).collect(),
        )
    )
    assert got == again
    # min_shared raises the bar; max_bucket drops universal fps
    hi = winnow_candidate_pairs(df, "doc_id", "text", k=3, window=4, min_shared=99)
    assert hi.count() == 0
    capped = winnow_candidate_pairs(
        df, "doc_id", "text", k=3, window=4, min_shared=1, max_bucket=1
    )
    assert capped.count() == 0  # every shared fp is held by >= 2 docs
    with pytest.raises(ValueError, match="min_shared"):
        winnow_candidate_pairs(df, "doc_id", "text", min_shared=0)
