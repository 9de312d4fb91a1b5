"""Fill-in-the-middle transform (curation.fim_transform).

Laws:
- the md5 draws are exactly reproducible in pure Python (hashlib),
  so every decision and both cut points have a hand oracle;
- prefix || middle || suffix reassembles the original text for every
  transformed row (the paper's lossless split);
- partitioning and rerun invariance (decisions are pure functions of
  (salt, id));
- byte-identity vs the DuckDB twin in both PSM and SPM modes;
- domain guards.
"""

import hashlib

import duckdb
import pytest

from fdblucene_spark.operators.curation import fim_sql, fim_transform

DOCS = [
    (1, "hello world this is a doc"),
    (2, ""),
    (3, None),
    (4, "x"),
    (5, "the quick brown fox jumps over the lazy dog near the bank"),
    (6, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (7, "don't stop believing 'mid-stream'"),
]


def _u(salt: str, tag: str, doc_id: int) -> float:
    h = hashlib.md5(f"{salt}:{tag}:{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) / float(16**8)


def _expected(rate: float, salt: str, mode: str):
    pre, suf, mid = "<PRE>", "<SUF>", "<MID>"
    out = {}
    for doc_id, text in DOCS:
        fim = _u(salt, "d", doc_id) < rate and text is not None
        if not fim:
            out[doc_id] = (False, None, None, None, text)
            continue
        u1, u2 = _u(salt, "a", doc_id), _u(salt, "b", doc_id)
        n = len(text)
        p1 = int(min(u1, u2) * (n + 1))
        p2 = int(max(u1, u2) * (n + 1))
        px, md, sx = text[:p1], text[p1:p2], text[p2:]
        rend = (
            f"{pre}{px}{suf}{sx}{mid}{md}"
            if mode == "psm"
            else f"{suf}{sx}{pre}{px}{mid}{md}"
        )
        out[doc_id] = (True, px, md, sx, rend)
    return out


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("rate,mode", [(0.6, "psm"), (1.0, "spm"), (0.0, "psm")])
def test_fim_hand_oracle(spark, docs, rate, mode):
    got = {
        r["doc_id"]: (
            r["fim"],
            r["fim_prefix"],
            r["fim_middle"],
            r["fim_suffix"],
            r["rendered"],
        )
        for r in fim_transform(docs, "doc_id", "text", rate=rate, mode=mode).collect()
    }
    assert got == _expected(rate, "fim-v1", mode)


def test_fim_lossless_split(spark, docs):
    for r in fim_transform(docs, "doc_id", "text", rate=1.0).collect():
        if r["fim"]:
            orig = dict(DOCS)[r["doc_id"]]
            assert r["fim_prefix"] + r["fim_middle"] + r["fim_suffix"] == orig


def test_fim_partition_and_rerun_invariance(spark, docs):
    a = sorted(map(tuple, fim_transform(docs, "doc_id", "text").collect()))
    b = sorted(
        map(tuple, fim_transform(docs.repartition(7), "doc_id", "text").collect())
    )
    c = sorted(map(tuple, fim_transform(docs, "doc_id", "text").collect()))
    assert a == b == c
    # a different salt re-draws
    d = sorted(
        map(tuple, fim_transform(docs, "doc_id", "text", salt="fim-v2").collect())
    )
    assert a != d


@pytest.mark.parametrize("mode", ["psm", "spm"])
def test_fim_duckdb_twin_identity(spark, docs, mode):
    got = sorted(
        map(tuple, fim_transform(docs, "doc_id", "text", rate=0.7, mode=mode).collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(doc_id BIGINT, text VARCHAR); "
        "INSERT INTO t VALUES "
        + ", ".join(
            f"({i}, " + ("NULL" if s is None else "'" + s.replace("'", "''") + "'") + ")"
            for i, s in DOCS
        )
    )
    twin = sorted(
        map(tuple, con.execute(fim_sql("t", "doc_id", "text", rate=0.7, mode=mode)).fetchall())
    )
    assert got == twin


def test_fim_guards(spark, docs):
    with pytest.raises(ValueError, match="rate"):
        fim_transform(docs, "doc_id", "text", rate=1.5)
    with pytest.raises(ValueError, match="mode"):
        fim_transform(docs, "doc_id", "text", mode="pms")
    with pytest.raises(ValueError, match="mode"):
        fim_sql("t", "doc_id", "text", mode="pms")
