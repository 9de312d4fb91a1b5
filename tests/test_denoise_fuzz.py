"""Randomized twin-identity fuzz for the denoising family.

40 seeded printable-ASCII documents (quotes, punctuation, weird
spacing, empty, null) run through fim_transform / span_corruption /
mlm_mask / ul2_mixture on Spark AND DuckDB in one batch per op —
any engine/twin drift in tokenization, substring arithmetic, md5
uniforms, or rendering fails byte-for-byte."""

import random
import string

import duckdb
import pytest

from fdblucene_spark.operators.curation import (
    fim_sql,
    fim_transform,
    mlm_mask,
    mlm_mask_sql,
    span_corruption,
    span_corruption_sql,
    ul2_mixture,
    ul2_mixture_sql,
)

ALPHABET = string.ascii_letters + string.digits + " _'\"-.,!?;:()\t"


def _docs():
    rng = random.Random(424242)
    rows = [(0, ""), (1, None), (2, "x"), (3, "  \t  "), (4, "'';--\"")]
    for i in range(5, 40):
        n = rng.randint(1, 220)
        rows.append((i, "".join(rng.choice(ALPHABET) for _ in range(n))))
    return rows


@pytest.fixture(scope="module")
def fuzz(spark):
    rows = _docs()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", rows)
    return df, con


def _norm(v):
    return tuple(v) if isinstance(v, list) else v


def _cmp(spark_df, con, sql):
    got = sorted(tuple(_norm(x) for x in r) for r in spark_df.collect())
    twin = sorted(tuple(_norm(x) for x in r) for r in con.execute(sql).fetchall())
    assert got == twin


def test_fuzz_fim(spark, fuzz):
    df, con = fuzz
    for rate, mode in ((0.6, "psm"), (1.0, "spm")):
        _cmp(
            fim_transform(df, "doc_id", "text", rate=rate, mode=mode),
            con,
            fim_sql("tt", "doc_id", "text", rate=rate, mode=mode),
        )


def test_fuzz_span_corruption(spark, fuzz):
    df, con = fuzz
    for dens, m in ((0.15, 3.0), (0.5, 1.5)):
        _cmp(
            span_corruption(df, "doc_id", "text", noise_density=dens, mean_span_len=m),
            con,
            span_corruption_sql("tt", "doc_id", "text", noise_density=dens, mean_span_len=m),
        )


def test_fuzz_mlm(spark, fuzz):
    df, con = fuzz
    _cmp(
        mlm_mask(df, "doc_id", "text", mask_rate=0.3),
        con,
        mlm_mask_sql("tt", "doc_id", "text", mask_rate=0.3),
    )


def test_fuzz_ul2(spark, fuzz):
    df, con = fuzz
    _cmp(
        ul2_mixture(df, "doc_id", "text"),
        con,
        ul2_mixture_sql("tt", "doc_id", "text"),
    )
