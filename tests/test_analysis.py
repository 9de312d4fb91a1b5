"""Analyzer tests: pure-Python vs Arrow UDF parity, plan hygiene."""

import pandas as pd
from pyspark.sql import functions as F

from fdblucene_spark.functions.analysis import (
    tokenize_text,
    tokens_udf,
    tokenize_expr_ascii,
    with_tokens,
)
from fdblucene_spark.plans.explain import assert_no_rowwise_python


def test_tokenize_text_cases():
    assert tokenize_text("Hello, World!") == ["hello", "world"]
    assert tokenize_text("Café naïve ÜBER") == ["café", "naïve", "über"]
    assert tokenize_text("a-b_c 東京") == ["a", "b_c", "東京"]
    assert tokenize_text("") == []
    assert tokenize_text(None) == []
    assert tokenize_text("x  y\t z\n") == ["x", "y", "z"]


def test_udf_matches_pure_python(spark):
    texts = [
        "Hello, World!",
        "Café naïve-user! ÜBER,fast",
        "term00001 term00002 term00001",
        "",
        None,
        "O'Brien 東京データ решение",
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": pd.Series(texts, dtype="object")}))
    got = [r["toks"] for r in df.select(tokens_udf("text").alias("toks")).collect()]
    want = [tokenize_text(t) for t in texts]
    assert got == want


def test_ascii_fast_path_equivalence(spark):
    # on pure-ascii corpora the JVM expression == the versioned analyzer
    texts = ["the fast key order", "spark group query row data", "a b  c", "x1 y2"]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    slow = [r[0] for r in df.select(tokens_udf("text")).collect()]
    fast = [r[0] for r in df.select(tokenize_expr_ascii(F.col("text"))).collect()]
    assert slow == fast == [tokenize_text(t) for t in texts]


def test_no_rowwise_python_in_plan(spark):
    df = spark.range(10).withColumn("text", F.lit("a b c"))
    toks = with_tokens(df)
    assert_no_rowwise_python(toks)
    plan = toks._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # tokenizer is Arrow-vectorized
