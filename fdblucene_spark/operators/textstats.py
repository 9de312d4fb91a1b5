"""Text-analysis operators for training-data pipelines.

Language ID (marker-token heuristic), quality scoring, token
counting (whitespace / analyzer / BPE-ish), and document
fingerprinting. All pure Catalyst expressions (whole-stage codegen,
zero Python) — each has an exact ANSI-SQL twin used as the DuckDB
oracle in __spark_entry__.py.

These extend the reference's scope: fdblucene itself delegates all
text analysis to Lucene (reference: SimpleFDBDirectoryTest.java:204);
a 100 TB training-data pipeline needs these as first-class operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# fixed marker lists (deterministic; overlap with the synthetic vocab so
# the heuristic has signal). Order = tie-break precedence.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "data", "fast", "key"],
    "de": ["der", "die", "und", "schnell", "wert"],
    "es": ["el", "la", "los", "datos", "rapido"],
    "fr": ["le", "la", "les", "vite", "valeur"],
}

STOPWORDS = ["the", "a", "of", "and", "or", "to", "in"]

_TOKENIZE_SQL = "[^a-z0-9_]+"  # ascii twin of the standard_v1 analyzer


def tokens_col(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), _TOKENIZE_SQL), lambda t: t != F.lit(""))


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens_ws, n_tokens, n_chars, avg_token_len, n_bpe_ish).

    n_tokens_ws: whitespace split; n_tokens: analyzer tokens;
    n_bpe_ish: sum over tokens of ceil(len/4) — a deterministic stand-
    in for a BPE vocab (≈4 chars/token), good enough for budget
    estimation at pipeline scale.
    """
    toks = tokens_col(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit(""))).cast("long").alias("n_tokens_ws"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.round(
            F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("avg_token_len"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.ceil(F.length(t) / 4.0)).alias("n_bpe_ish"),
    )


def token_counts_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
)
SELECT d.{id_col},
       len(list_filter(string_split_regex(d.{text_col}, '\\s+'), t -> t <> ''))::BIGINT AS n_tokens_ws,
       len(t.ts)::BIGINT AS n_tokens,
       length(d.{text_col})::BIGINT AS n_chars,
       round(list_sum(list_transform(t.ts, x -> length(x)::DOUBLE))
             / greatest(len(t.ts), 1), 4) AS avg_token_len,
       list_sum(list_transform(t.ts, x -> ceil(length(x)/4.0)::BIGINT))::BIGINT AS n_bpe_ish
FROM {table} d JOIN toks t USING ({id_col})
"""


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic quality score: length, stopword and diversity terms.

    quality = 0.4*min(1, n_tokens/100) + 0.3*(1 - stopword_ratio)
            + 0.3*distinct_ratio            (rounded to 4)
    """
    toks = tokens_col(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    # quality as ONE exact-integer ratio, then a single IEEE division:
    #   0.4*min(1, n_tok/100) + 0.3*(1-ns/n) + 0.3*(nd/n)
    # = (min(200n, 2*n_tok*n) + 150(n-ns) + 150nd) / (500n)
    # The ratio can land EXACTLY on a round-to-4 tie (e.g. 14358/24000
    # = 0.59825), where Spark (HALF_UP on the shortest decimal repr)
    # and engines that round the true binary value (DuckDB) disagree
    # by one final digit. The +1e-12 nudge pushes exact ties upward on
    # both sides and cannot move any non-tie: with n <= 10^6 the ratio
    # grid spacing around a boundary is >= 1/(500n*10^4) >> 1e-12.
    q_num = (
        F.when(F.size(toks) >= 100, 200 * n).otherwise(2 * F.size(toks) * n)
        + 150 * (n - n_stop) + 150 * n_distinct
    )
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(n_stop / n, 4).alias("stopword_ratio"),
        F.round(n_distinct / n, 4).alias("distinct_ratio"),
        F.round(
            q_num.cast("double") / (500 * n).cast("double") + F.lit(1e-12), 4
        ).alias("quality"),
    )


def quality_scores_sql(table: str, id_col: str, text_col: str) -> str:
    stoplist = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
), m AS (
  SELECT {id_col}, ts,
         greatest(len(ts), 1) AS n,
         len(list_filter(ts, t -> t IN ({stoplist}))) AS n_stop,
         len(list_distinct(ts)) AS n_distinct
  FROM toks
)
SELECT {id_col},
       len(ts)::BIGINT AS n_tokens,
       round(n_stop / n::DOUBLE, 4) AS stopword_ratio,
       round(n_distinct / n::DOUBLE, 4) AS distinct_ratio,
       -- same exact-integer numerator / single division / +1e-12
       -- tie-nudge as the engine (see quality_scores): bit-identical
       -- before rounding, and exact .xxxx5 ties round the same way
       round(((CASE WHEN len(ts) >= 100 THEN 200 * n ELSE 2 * len(ts) * n END)
              + 150 * (n - n_stop) + 150 * n_distinct)::DOUBLE
             / (500 * n)::DOUBLE + 1e-12, 4) AS quality
FROM m
"""


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-overlap language ID. pred_lang = argmax over marker hit
    counts (distinct tokens), ties broken by fixed precedence order,
    'und' when all scores are 0."""
    toks = F.array_distinct(tokens_col(text_col))
    cols = [F.col(id_col)]
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        # bind arr via outer closure: a 2-arg lambda would make pyspark
        # pass (value, index) and shadow the default argument
        pred = (lambda a: (lambda t: F.array_contains(a, t)))(arr)
        cols.append(F.size(F.filter(toks, pred)).alias(f"score_{lang}"))
    scored = df.select(*cols)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties -> apply last
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return scored.select(
        F.col(id_col),
        *[F.col(f"score_{lang}").cast("long").alias(f"score_{lang}") for lang in langs],
        F.when(best > 0, pred).otherwise(F.lit("und")).alias("pred_lang"),
    )


def lang_id_sql(table: str, id_col: str, text_col: str) -> str:
    score_exprs = []
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        score_exprs.append(
            f"len(list_filter(list_distinct(ts), t -> t IN ({lst})))::BIGINT AS score_{lang}"
        )
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = "CASE "
    for lang in langs:
        case += f"WHEN score_{lang} = {best} THEN '{lang}' "
    case += "END"
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
), s AS (
  SELECT {id_col}, {', '.join(score_exprs)} FROM toks
)
SELECT {id_col}, {', '.join(f'score_{lang}' for lang in langs)},
       CASE WHEN {best} > 0 THEN {case} ELSE 'und' END AS pred_lang
FROM s
"""


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content fingerprint: md5 over the sorted distinct token set —
    robust to token order/duplication (near-dup pre-filter)."""
    toks = tokens_col(text_col)
    return df.select(
        F.col(id_col),
        F.md5(F.to_binary(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))), F.lit("utf-8"))).alias("fingerprint"),
        F.md5(F.to_binary(F.col(text_col), F.lit("utf-8"))).alias("exact_hash"),
    )


def fingerprints_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
SELECT {id_col},
       md5(array_to_string(list_sort(list_distinct(
            list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> ''))), ' ')) AS fingerprint,
       md5({text_col}) AS exact_hash
FROM {table}
"""
