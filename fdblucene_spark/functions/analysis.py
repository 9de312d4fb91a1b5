"""Text analysis: versioned tokenizer as a vectorized pandas UDF.

The reference delegates analysis to Lucene's default analyzer on
TextField (reference: SimpleFDBDirectoryTest.java:204, pom.xml:35-39)
and pins config per directory at creation (reference:
FDBDirectory.java:416-428 getOrSetPageSize pattern). We rebuild it as
a versioned analyzer whose id is recorded in the index manifest, so a
reader can refuse an index built with a different analyzer.

standard_v1: NFC-free lowercase + Unicode word extraction (\\w+).
Tokenization runs Series-at-a-time inside an Arrow-batched pandas UDF
(BASELINE.json input_hint: no per-row Python UDFs). A pure-JVM
expression variant (split on non-word chars) is provided for corpora
known to be ASCII — it produces identical tokens there and keeps the
whole stage in codegen.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANALYZER_VERSION = "standard_v1"
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

KEYWORD_ANALYZER = "keyword_v1"  # whole value = single term, no lowercase
                                 # (reference: StringField("_id", ...),
                                 #  SimpleFDBDirectoryTest.java:205)


def tokenize_text(text: str | None) -> list[str]:
    """Reference tokenizer for the pytest oracle — same regex, plain Python."""
    if text is None:
        return []
    return _TOKEN_RE.findall(text.lower())


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokens_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched analyzer: Series in, Series of token lists out."""
    return texts.fillna("").str.lower().str.findall(_TOKEN_RE)


def tokenize_expr_ascii(col: Column) -> Column:
    """JVM-only tokenizer for ASCII corpora: identical to standard_v1
    when text contains no non-ASCII word chars. Stays in whole-stage
    codegen (no Python at all)."""
    return F.filter(F.split(F.lower(col), r"[^a-z0-9_]+"), lambda t: t != F.lit(""))


def with_tokens(
    df: DataFrame, text_col: str = "text", out_col: str = "tokens", ascii_fast_path: bool = False
) -> DataFrame:
    """Add a token-array column using the versioned analyzer."""
    expr = tokenize_expr_ascii(F.col(text_col)) if ascii_fast_path else tokens_udf(F.col(text_col))
    return df.withColumn(out_col, expr)


def exploded_terms(
    df: DataFrame, doc_col: str = "doc", text_col: str = "text", ascii_fast_path: bool = False
) -> DataFrame:
    """(doc, text) -> (doc, pos, term) — one row per token occurrence.

    posexplode runs JVM-side; only the token extraction touches Python
    (and not at all on the ascii fast path).
    """
    toks = with_tokens(df, text_col=text_col, ascii_fast_path=ascii_fast_path)
    return toks.select(
        F.col(doc_col).alias("doc"), F.posexplode("tokens").alias("pos", "term")
    )
