"""BERT-style MLM masking (curation.mlm_mask).

Laws:
- every draw (selection, 80/10/10 branch, self-vocab random index)
  is reproducible in pure Python via hashlib — full hand oracle;
- label_tokens/label_positions always name the ORIGINAL tokens at
  the selected positions (the loss targets), whatever the branch;
- unselected positions are byte-unchanged in input_text;
- realized mask fraction tracks mask_rate on a long doc, and the
  80/10/10 branch mix tracks its fractions;
- partition/rerun invariance + salt re-draw;
- byte-identity vs the DuckDB twin;
- domain guards.
"""

import hashlib
import re

import duckdb
import pytest

from fdblucene_spark.operators.curation import mlm_mask, mlm_mask_sql

DOCS = [
    (0, " ".join(f"tok{j}" for j in range(60))),
    (1, ""),
    (2, None),
    (3, "one"),
    (4, "The quick brown Fox! jumps over 99 lazy dogs tonight again and again forever more"),
]


def _u(salt, tag, doc_id, i):
    h = hashlib.md5(f"{salt}:{tag}:{doc_id}:{i}".encode()).hexdigest()
    return int(h[:8], 16) / float(16**8)


def _tok(text):
    if text is None:
        return []
    return [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]


def _expected(doc_id, text, rate, kf=0.1, rf=0.1, salt="mlm-v1", mask="[MASK]"):
    ts = _tok(text)
    n = len(ts)
    rendered, lpos, ltok = [], [], []
    for i in range(n):
        if _u(salt, "m", doc_id, i) >= rate:
            rendered.append(ts[i])
            continue
        lpos.append(i)
        ltok.append(ts[i])
        b = _u(salt, "b", doc_id, i)
        if b < kf:
            rendered.append(ts[i])
        elif b < kf + rf:
            rendered.append(ts[int(_u(salt, "r", doc_id, i) * n)])
        else:
            rendered.append(mask)
    return (n, len(lpos), " ".join(rendered), lpos, ltok)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("rate,kf,rf", [(0.15, 0.1, 0.1), (0.3, 0.2, 0.3), (0.5, 0.0, 0.0)])
def test_mlm_hand_oracle(spark, docs, rate, kf, rf):
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_masked"],
            r["input_text"],
            list(r["label_positions"]),
            list(r["label_tokens"]),
        )
        for r in mlm_mask(
            docs, "doc_id", "text", mask_rate=rate, keep_frac=kf, random_frac=rf
        ).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == _expected(doc_id, text, rate, kf, rf), doc_id


def test_mlm_unselected_unchanged_and_labels_original(spark, docs):
    for r in mlm_mask(docs, "doc_id", "text", mask_rate=0.3).collect():
        ts = _tok(dict(DOCS)[r["doc_id"]])
        rendered = r["input_text"].split(" ") if r["input_text"] else []
        sel = set(r["label_positions"])
        for i, t in enumerate(ts):
            if i not in sel:
                assert rendered[i] == t
        assert list(r["label_tokens"]) == [ts[i] for i in r["label_positions"]]


def test_mlm_rate_and_branch_mix(spark):
    ts = " ".join(f"tok{j}" for j in range(6000))
    df = spark.createDataFrame([(7, ts)], "doc_id long, text string")
    r = mlm_mask(df, "doc_id", "text", mask_rate=0.15).collect()[0]
    frac = r["n_masked"] / r["n_tokens"]
    assert 0.12 < frac < 0.18, frac
    rendered = r["input_text"].split(" ")
    toks = ts.split(" ")
    n_mask_tok = sum(1 for i in r["label_positions"] if rendered[i] == "[MASK]")
    # 80% of selected become [MASK] (±10 points on ~900 draws)
    assert 0.7 < n_mask_tok / r["n_masked"] < 0.9
    n_kept = sum(
        1 for i in r["label_positions"] if rendered[i] == toks[i]
    )
    assert n_kept / r["n_masked"] < 0.25  # keep 10% + random self-hits


def test_mlm_invariance(spark, docs):
    def key(rows):
        return sorted(
            (r["doc_id"], r["input_text"], tuple(r["label_positions"])) for r in rows
        )

    a = key(mlm_mask(docs, "doc_id", "text").collect())
    b = key(mlm_mask(docs.repartition(4), "doc_id", "text").collect())
    assert a == b
    c = key(mlm_mask(docs, "doc_id", "text", salt="mlm-v2").collect())
    assert a != c


def test_mlm_duckdb_twin(spark, docs):
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["n_masked"], r["input_text"],
         tuple(r["label_positions"]), tuple(r["label_tokens"]))
        for r in mlm_mask(docs, "doc_id", "text", mask_rate=0.3).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", DOCS)
    twin = sorted(
        (b[0], b[1], b[2], b[3], tuple(b[4]), tuple(b[5]))
        for b in con.execute(mlm_mask_sql("tt", "doc_id", "text", mask_rate=0.3)).fetchall()
    )
    assert got == twin


def test_mlm_guards(spark, docs):
    with pytest.raises(ValueError, match="mask_rate"):
        mlm_mask(docs, "doc_id", "text", mask_rate=1.0)
    with pytest.raises(ValueError, match="keep_frac"):
        mlm_mask(docs, "doc_id", "text", keep_frac=0.7, random_frac=0.5)
    with pytest.raises(ValueError, match="mask_rate"):
        mlm_mask_sql("tt", "doc_id", "text", mask_rate=0.0)
