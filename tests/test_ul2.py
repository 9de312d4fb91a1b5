"""UL2 mixture-of-denoisers (curation.ul2_mixture).

Laws:
- md5 routing is reproducible in pure Python: each doc lands in
  exactly one of R/X/S at the documented thresholds;
- the R and X branches are EXACTLY span_corruption at their param
  points (salt-namespaced), with the paradigm tag prepended;
- the S branch is a lossless prefix/suffix token split;
- mixture fractions track (r_frac, x_frac) on a larger corpus;
- partition invariance; byte-identity vs the DuckDB twin; guards.
"""

import hashlib

import duckdb
import pytest

from fdblucene_spark.operators.curation import (
    span_corruption,
    ul2_mixture,
    ul2_mixture_sql,
)

ROWS = [(i, f"tok{i} " * (4 + i % 17) + "alpha beta gamma end") for i in range(40)] + [
    (40, ""),
    (41, None),
]


def _u(salt, tag, doc_id):
    h = hashlib.md5(f"{salt}:{tag}:{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) / float(16**8)


def _route(doc_id, r=0.4, x=0.4, salt="ul2-v1"):
    u = _u(salt, "o", doc_id)
    return "R" if u < r else ("X" if u < r + x else "S")


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_ul2_routing_and_branches(spark, docs):
    out = {r["doc_id"]: r for r in ul2_mixture(docs, "doc_id", "text").collect()}
    assert len(out) == len(ROWS)
    for doc_id, _ in ROWS:
        assert out[doc_id]["denoiser"] == _route(doc_id), doc_id
        assert out[doc_id]["input_text"].startswith(f"[{out[doc_id]['denoiser']}] ")
    # R branch == span_corruption at (.15, 3) under the namespaced salt
    r_ids = [i for i, _ in ROWS if _route(i) == "R"]
    sc = {
        r["doc_id"]: (r["input_text"], r["target_text"])
        for r in span_corruption(
            docs.filter(docs.doc_id.isin(r_ids)), "doc_id", "text", 0.15, 3.0, "ul2-v1:r"
        ).collect()
    }
    for i in r_ids:
        assert out[i]["input_text"] == "[R] " + sc[i][0]
        assert out[i]["target_text"] == sc[i][1]
    # S branch: lossless prefix/suffix token split
    for i, text in ROWS:
        if _route(i) != "S":
            continue
        toks = (text or "").lower().split() if text else []
        toks = [t for t in toks if t]
        inp = out[i]["input_text"][4:].split(" ") if out[i]["input_text"] != "[S] " else []
        tgt = out[i]["target_text"].split(" ") if out[i]["target_text"] else []
        assert inp + tgt == toks, i


def test_ul2_fractions_track(spark):
    big = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2}") for i in range(3000)], "doc_id long, text string"
    )
    from collections import Counter

    c = Counter(
        r["denoiser"] for r in ul2_mixture(big, "doc_id", "text", 0.25, 0.25).collect()
    )
    for d in ("R", "X"):
        assert 0.21 < c[d] / 3000 < 0.29, c
    assert 0.45 < c["S"] / 3000 < 0.55, c


def test_ul2_invariance_and_twin(spark, docs):
    a = sorted(map(tuple, ul2_mixture(docs, "doc_id", "text").collect()))
    b = sorted(map(tuple, ul2_mixture(docs.repartition(7), "doc_id", "text").collect()))
    assert a == b
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", ROWS)
    twin = sorted(map(tuple, con.execute(ul2_mixture_sql("tt", "doc_id", "text")).fetchall()))
    assert a == twin


def test_ul2_guards(spark, docs):
    with pytest.raises(ValueError, match="r_frac"):
        ul2_mixture(docs, "doc_id", "text", r_frac=0.7, x_frac=0.5)
    with pytest.raises(ValueError, match="r_frac"):
        ul2_mixture_sql("tt", "doc_id", "text", r_frac=-0.1)
