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


def repetition_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, Table A1;
    Dolma's repetition taggers): per-document n-gram repetition
    signals used to drop degenerate / boilerplate text before
    pretraining.

    Columns (all deterministic; fractions are exact-integer ratios
    through ONE IEEE division + the same 1e-12 tie-nudge as
    quality_scores, so the DuckDB twin is bit-identical):
      n_tokens          analyzer token count
      max_token_run     longest run of one repeated token ("batch
                        batch batch" degeneracy), >= 1 when n_tokens>0
      top_bigram        most frequent word bigram (ties: lexicographic
                        min), NULL when n_tokens < 2
      top_bigram_count  its occurrence count (0 when no bigrams)
      top_bigram_frac   2 * top_bigram_count / n_tokens — the
                        fraction-of-tokens-in-top-ngram signal
      dup_bigram_frac   2 * sum(count of bigrams occurring > 1) /
                        n_tokens (overlaps counted; may exceed 1 on
                        pathological text — a feature for filtering)
      dup_trigram_frac  3 * sum(count of trigrams occurring > 1) /
                        n_tokens

    Distributed shape: max_token_run is a shuffle-free single-pass
    fold inside the row (Catalyst `aggregate`); the n-gram counts
    explode to (doc, gram) with map-side partial aggregation — the
    shuffle is keyed by doc id like every per-doc pipeline op, no
    corpus-global state anywhere.
    """
    toks = tokens_col(text_col)
    zero = F.lit(0).cast("long")
    run = F.aggregate(
        toks,
        F.struct(
            F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc.best,
                F.when(t == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    from ._spread import spread

    df = spread(df)
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        run.alias("max_token_run"),
        toks.alias("_ts"),
    )
    # word n-grams: 1-based element_at over an index sequence, guarded
    # for docs shorter than the gram (empty array, not negative slice)
    def _grams(n: int) -> Column:
        ts = F.col("_ts")
        return F.when(
            F.size(ts) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(ts) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(ts, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    bg = (
        base.select(id_col, F.explode(_grams(2)).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy(id_col)
        .agg(
            F.min(F.struct((-F.col("c")).alias("nc"), F.col("gram").alias("g"))).alias("top"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(zero)).alias("dupc"),
        )
        .select(
            id_col,
            F.col("top.g").alias("top_bigram"),
            (-F.col("top.nc")).cast("long").alias("top_bigram_count"),
            F.col("dupc").cast("long").alias("bg_dupc"),
        )
    )
    tg = (
        base.select(id_col, F.explode(_grams(3)).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy(id_col)
        .agg(F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(zero)).alias("tg_dupc"))
    )
    n = F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
    nudge = F.lit(1e-12)
    return (
        base.drop("_ts")
        .join(bg, id_col, "left")
        .join(tg, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "max_token_run",
            "top_bigram",
            F.coalesce("top_bigram_count", zero).alias("top_bigram_count"),
            F.round(
                (2 * F.coalesce("top_bigram_count", zero)).cast("double") / n + nudge, 4
            ).alias("top_bigram_frac"),
            F.round(
                (2 * F.coalesce("bg_dupc", zero)).cast("double") / n + nudge, 4
            ).alias("dup_bigram_frac"),
            F.round(
                (3 * F.coalesce("tg_dupc", zero)).cast("double") / n + nudge, 4
            ).alias("dup_trigram_frac"),
        )
    )


def repetition_metrics_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of repetition_metrics — same grams, same run
    detection (gaps-and-islands over token positions), same
    exact-integer ratios + 1e-12 nudge."""
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
), base AS (
  SELECT {id_col}, ts, len(ts)::BIGINT AS n_tokens FROM toks
), flat AS (
  SELECT {id_col}, tp.p AS p, tp.t AS t
  FROM (SELECT {id_col}, unnest(list_transform(range(1, len(ts) + 1),
               i -> struct_pack(p := i, t := ts[i]))) AS tp FROM toks)
), runs AS (
  SELECT {id_col}, t, p - row_number() OVER (PARTITION BY {id_col}, t ORDER BY p) AS g
  FROM flat
), runlen AS (
  SELECT {id_col}, count(*)::BIGINT AS rl FROM runs GROUP BY {id_col}, t, g
), maxrun AS (
  SELECT {id_col}, max(rl)::BIGINT AS max_token_run FROM runlen GROUP BY {id_col}
), bg AS (
  SELECT {id_col}, unnest(list_transform(range(1, len(ts)),
         i -> ts[i] || ' ' || ts[i + 1])) AS gram
  FROM toks WHERE len(ts) >= 2
), bgc AS (
  SELECT {id_col}, gram, count(*)::BIGINT AS c FROM bg GROUP BY {id_col}, gram
), bga AS (
  SELECT {id_col},
         min(struct_pack(nc := -c, g := gram)) AS top,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS bg_dupc
  FROM bgc GROUP BY {id_col}
), tg AS (
  SELECT {id_col}, unnest(list_transform(range(1, len(ts) - 1),
         i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])) AS gram
  FROM toks WHERE len(ts) >= 3
), tgc AS (
  SELECT {id_col}, gram, count(*)::BIGINT AS c FROM tg GROUP BY {id_col}, gram
), tga AS (
  SELECT {id_col}, sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS tg_dupc
  FROM tgc GROUP BY {id_col}
)
SELECT b.{id_col},
       b.n_tokens,
       coalesce(m.max_token_run, 0)::BIGINT AS max_token_run,
       (bga.top).g AS top_bigram,
       coalesce(-(bga.top).nc, 0)::BIGINT AS top_bigram_count,
       round((2 * coalesce(-(bga.top).nc, 0))::DOUBLE / greatest(b.n_tokens, 1) + 1e-12, 4) AS top_bigram_frac,
       round((2 * coalesce(bga.bg_dupc, 0))::DOUBLE / greatest(b.n_tokens, 1) + 1e-12, 4) AS dup_bigram_frac,
       round((3 * coalesce(tga.tg_dupc, 0))::DOUBLE / greatest(b.n_tokens, 1) + 1e-12, 4) AS dup_trigram_frac
FROM base b
LEFT JOIN maxrun m USING ({id_col})
LEFT JOIN bga USING ({id_col})
LEFT JOIN tga USING ({id_col})
"""


# PII / pattern tagging (training-data curation: scrub-before-train).
# Patterns restricted to syntax with IDENTICAL semantics in Java regex
# (Spark, JVM codegen) and RE2 (DuckDB twin): character classes,
# bounded repeats, alternation — no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "url": r"https?://[^\s]+",
    "phone": r"\+\d[\d\-]{7,14}\d",
}


def pii_tags(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII occurrence counts + a redacted-text digest —
    the Dolma/CCNet-style scrub pass a pretraining pipeline runs
    before tokenization. Columns: n_email / n_ipv4 / n_url / n_phone
    (match counts per pattern) and redacted_hash (md5 of the text
    with every match replaced by <TYPE>, applied in the fixed
    PII_PATTERNS order so the digest is deterministic). Pure Catalyst
    regexp expressions — whole-stage codegen, zero Python, no
    shuffle; at 100 TB this is a map-only pass."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    red = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.select(
        F.col(id_col),
        *counts,
        F.md5(F.to_binary(red, F.lit("utf-8"))).alias("redacted_hash"),
    )


def pii_tags_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of pii_tags (RE2 regexps, same patterns/order)."""
    counts = ",\n       ".join(
        f"len(regexp_extract_all({text_col}, '{pat}'))::BIGINT AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    red = text_col
    for name, pat in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '<{name.upper()}>', 'g')"
    return f"""
SELECT {id_col},
       {counts},
       md5({red}) AS redacted_hash
FROM {table}
"""


# --------------------------------------------------------- LM perplexity
def lm_perplexity(
    df: DataFrame, id_col: str, text_col: str, add_k: float = 0.5
) -> DataFrame:
    """Per-doc perplexity under a corpus-trained add-k unigram LM —
    the deterministic stand-in for CCNet's KenLM quality bucketing
    (low perplexity = head-like text, high = tail/garbage; CCNet
    splits the corpus into head/middle/tail thirds on exactly this
    number). p(t) = (cnt(t) + k) / (N + k * (V + 1)); ppl =
    exp(-sum(ln p) / n_tokens). Self-scoring (the model trains on the
    corpus it scores), so no OOV path is needed; V + 1 reserves the
    usual unseen-token slot so the distribution stays proper.

    Plan shape at 100 TB: one explode, one term-keyed partial+final
    count agg (the 'model'), one term-keyed join back, one doc-keyed
    agg — no driver-side model state (the vocab stays distributed;
    contrast classifier_scores, whose bucketed model broadcasts).
    Returns (id, n_tokens, logprob, ppl); empty docs keep NULL
    logprob/ppl.
    """
    if add_k <= 0:
        raise ValueError("add_k must be > 0")
    toks = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("t"))
    counts = toks.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    consts = counts.agg(
        F.sum("cnt").cast("double").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("v_size"),
    )
    # per-token log-probs quantize to float32 BEFORE the per-doc sum:
    # a float64 sum of same-scale float32 addends is EXACT for any
    # realistic doc length (>= 29 bits of mantissa headroom), so the
    # sum is addition-order-independent — Spark's partial-agg order
    # and the SQL twin's order can't diverge by an ulp (the same
    # determinism trick the BM25 kernels use for per-term scores)
    logp = counts.crossJoin(F.broadcast(consts)).select(
        "t",
        F.log(
            (F.col("cnt") + F.lit(float(add_k)))
            / (F.col("n_total") + F.lit(float(add_k)) * (F.col("v_size") + F.lit(1.0)))
        ).cast("float").alias("logp"),
    )
    agg = (
        toks.join(logp, "t")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("logp").cast("double")).alias("logprob"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.col("logprob"),
            F.exp(-F.col("logprob") / F.col("n_tokens")).alias("ppl"),
        )
    )


def lm_perplexity_sql(table: str, id_col: str, text_col: str, add_k: float = 0.5) -> str:
    """DuckDB twin of lm_perplexity: same count/smooth/ln/exp chain."""
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
), tok AS (
  SELECT {id_col}, unnest(ts) AS t FROM toks
), counts AS (
  SELECT t, count(*)::BIGINT AS cnt FROM tok GROUP BY t
), consts AS (
  SELECT sum(cnt)::DOUBLE AS n_total, count(*)::DOUBLE AS v_size FROM counts
), logp AS (
  -- float32 quantization before the sum: see lm_perplexity (makes the
  -- float64 per-doc sum exact, hence addition-order-independent)
  SELECT t, ln((cnt + {float(add_k)!r}) / (c.n_total + {float(add_k)!r} * (c.v_size + 1.0)))::FLOAT AS logp
  FROM counts, consts c
), agg AS (
  SELECT {id_col}, count(*)::BIGINT AS n_tokens, sum(logp::DOUBLE) AS logprob
  FROM tok JOIN logp USING (t) GROUP BY {id_col}
)
SELECT d.{id_col}, COALESCE(a.n_tokens, 0)::BIGINT AS n_tokens, a.logprob,
       exp(-a.logprob / a.n_tokens) AS ppl
FROM {table} d LEFT JOIN agg a USING ({id_col})
"""


def lm_perplexity_backoff(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train_df: DataFrame | None = None,
    alpha: float = 0.4,
    add_k: float = 0.5,
) -> DataFrame:
    """Per-doc perplexity under a TRAINED bigram stupid-backoff LM —
    the full CCNet shape (Wenzek et al. 2020 train a KenLM on the
    target domain and bucket CommonCrawl by its perplexity), where
    lm_perplexity is the self-trained unigram stand-in. Stupid
    backoff (Brants et al. 2007, the ngram_lm module's scoring):

      i = 0:                ln(p_uni(t_0))
      bigram (prev, t) seen: ln(cnt2(prev, t) / cnt1(prev))
      else (backoff):        ln(alpha * p_uni(t))

    with p_uni(t) = (cnt1(t) + k) / (N + k * (V + 1)) — add-k keeps
    out-of-domain tokens finite where raw stupid backoff would emit
    ln(0) (KenLM's <unk> slot). train_df defaults to df
    (self-scoring); pass the target-domain corpus to reproduce
    CCNet's cross-domain filter, which is what makes the backoff
    path fire. Per-token logs quantize to float32 before the exact
    float64 per-doc sum (the module's addition-order-independence
    trick), so Spark agg order and the SQL twin cannot diverge.

    Plan shape at 100 TB: two count aggs over the TRAIN corpus (the
    model — vocab/bigram-dictionary sized, stays distributed), then
    the scored corpus explodes once into (prev, t) rows and makes
    THREE dictionary-keyed joins (bigram, context count, unigram) +
    one doc-keyed agg; no driver model state, no window — positions
    come from one higher-order zip, not lag(). Returns (id, n_tokens,
    n_backoff, logprob, ppl); empty docs keep NULL logprob/ppl."""
    if not (0.0 < float(alpha) <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if add_k <= 0:
        raise ValueError("add_k must be > 0")
    train = train_df if train_df is not None else df
    ttoks = train.select(F.explode(tokens_col(text_col)).alias("t"))
    counts1 = ttoks.groupBy("t").agg(F.count(F.lit(1)).alias("c1"))
    ttoks2 = train.select(tokens_col(text_col).alias("ts")).select(
        F.explode(
            F.when(
                F.size("ts") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("ts"), i, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g")
    )
    counts2 = ttoks2.groupBy("g").agg(F.count(F.lit(1)).alias("c2"))
    consts = counts1.agg(
        F.sum("c1").cast("double").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("v_size"),
    )
    from ._spread import spread

    df = spread(df)
    ts = tokens_col(text_col)
    pos = df.select(F.col(id_col), ts.alias("ts")).select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("ts") > 0,
                F.transform(
                    F.sequence(F.lit(0), F.size("ts") - 1),
                    lambda i: F.struct(
                        i.alias("i"),
                        F.element_at(F.col("ts"), i + 1).alias("t"),
                        F.when(i > 0, F.element_at(F.col("ts"), i)).alias("prev"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<i:int,t:string,prev:string>>"))
        ).alias("p")
    ).select(F.col(id_col), "p.i", "p.t", "p.prev")
    g = F.concat_ws(" ", F.col("prev"), F.col("t"))
    joined = (
        pos.withColumn("g", F.when(F.col("i") > 0, g))
        .join(counts2.withColumnRenamed("g", "g").alias("b"), "g", "left")
        .join(
            counts1.select(F.col("t").alias("prev"), F.col("c1").alias("c_prev")),
            "prev",
            "left",
        )
        .join(counts1, "t", "left")
        .crossJoin(F.broadcast(consts))
    )
    p_uni = (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(add_k))) / (
        F.col("n_total") + F.lit(float(add_k)) * (F.col("v_size") + F.lit(1.0))
    )
    bigram_hit = (F.col("i") > 0) & F.col("c2").isNotNull() & F.col("c_prev").isNotNull()
    logp = (
        F.when(F.col("i") == 0, F.log(p_uni))
        .when(bigram_hit, F.log(F.col("c2").cast("double") / F.col("c_prev").cast("double")))
        .otherwise(F.log(F.lit(float(alpha)) * p_uni))
    ).cast("float")
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when((F.col("i") > 0) & ~bigram_hit, 1).otherwise(0)).alias("n_backoff"),
        F.sum(logp.cast("double")).alias("logprob"),
    )
    return (
        df.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_backoff"), F.lit(0)).cast("long").alias("n_backoff"),
            F.col("logprob"),
            F.exp(-F.col("logprob") / F.col("n_tokens")).alias("ppl"),
        )
    )


def lm_perplexity_backoff_sql(
    table: str,
    id_col: str,
    text_col: str,
    train_pred: str = "TRUE",
    alpha: float = 0.4,
    add_k: float = 0.5,
) -> str:
    """DuckDB twin of lm_perplexity_backoff — same counts over the
    train slice (train_pred mirrors the engine's train_df filter),
    same backoff branch, same f32-quantize-then-f64-sum chain."""
    if not (0.0 < float(alpha) <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    return f"""
WITH ppb_tr AS (
  SELECT list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table} WHERE {train_pred}
), ppb_c1 AS (
  SELECT t, count(*)::BIGINT AS c1 FROM (SELECT unnest(ts) AS t FROM ppb_tr) GROUP BY t
), ppb_c2 AS (
  SELECT g, count(*)::BIGINT AS c2 FROM (
    SELECT unnest(CASE WHEN len(ts) >= 2
                  THEN list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])
                  ELSE [] END) AS g
    FROM ppb_tr) GROUP BY g
), ppb_k AS (
  SELECT sum(c1)::DOUBLE AS n_total, count(*)::DOUBLE AS v_size FROM ppb_c1
), ppb_doc AS (
  SELECT {id_col}, list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
), ppb_pos AS (
  SELECT {id_col}, i - 1 AS i, ts[i] AS t,
         CASE WHEN i > 1 THEN ts[i - 1] END AS prev
  FROM ppb_doc, unnest(range(1, len(ts) + 1)) AS u(i)
), ppb_j AS (
  SELECT p.{id_col}, p.i,
         b.c2, cp.c1 AS c_prev, u.c1,
         (COALESCE(u.c1, 0) + {float(add_k)!r}) / (k.n_total + {float(add_k)!r} * (k.v_size + 1.0)) AS p_uni,
         (p.i > 0 AND b.c2 IS NOT NULL AND cp.c1 IS NOT NULL) AS hit
  FROM ppb_pos p
  LEFT JOIN ppb_c2 b ON p.i > 0 AND b.g = p.prev || ' ' || p.t
  LEFT JOIN ppb_c1 cp ON cp.t = p.prev
  LEFT JOIN ppb_c1 u ON u.t = p.t
  CROSS JOIN ppb_k k
), ppb_a AS (
  SELECT {id_col}, count(*)::BIGINT AS n_tokens,
         sum(CASE WHEN i > 0 AND NOT hit THEN 1 ELSE 0 END)::BIGINT AS n_backoff,
         sum((CASE WHEN i = 0 THEN ln(p_uni)
                   WHEN hit THEN ln(c2::DOUBLE / c_prev::DOUBLE)
                   ELSE ln({float(alpha)!r} * p_uni) END)::FLOAT::DOUBLE) AS logprob
  FROM ppb_j GROUP BY {id_col}
)
SELECT d.{id_col}, COALESCE(a.n_tokens, 0)::BIGINT AS n_tokens,
       COALESCE(a.n_backoff, 0)::BIGINT AS n_backoff, a.logprob,
       exp(-a.logprob / a.n_tokens) AS ppl
FROM {table} d LEFT JOIN ppb_a a USING ({id_col})
"""


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS local fingerprinting algorithm): hash every
    k-token gram, slide a `window`-wide window over the hash
    sequence, and select each window's MINIMUM hash (ties to the
    RIGHTMOST minimum, the paper's base scheme §4); the deduplicated
    (position, hash) picks are the document's fingerprints. The
    guarantee that makes this the plagiarism/near-dup standard: any
    shared run of at least k + window - 1 tokens between two
    documents yields at least one SHARED fingerprint, while the
    fingerprint density stays ~2/(window+1) of the grams. The paper
    hashes character k-grams; this pass uses analyzer-token k-grams
    (the practical choice for text/code corpora) with the module's
    md5-prefix hash, so it is a pure function of the token stream —
    partition-invariant and exactly reproducible by the SQL twin.
    Documents with at least k tokens but fewer than `window` grams
    keep one fingerprint (the min over all their grams) so short
    docs stay comparable.

    Pure Catalyst higher-order array ops (per-window cost is a
    `window`-wide slice — linear in doc length), map-only, zero
    shuffles, no UDF. Returns one row per fingerprint: (id, pos, fp)
    with pos = the selected k-gram's token position."""
    if int(k) < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if int(window) < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    k, w = int(k), int(window)
    ts = F.coalesce(tokens_col(text_col), F.array().cast("array<string>"))
    m = F.size(ts) - F.lit(k - 1)  # number of k-grams
    grams = F.when(
        m > 0,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.conv(
                F.substring(
                    F.md5(F.to_binary(F.concat_ws(" ", F.slice(ts, i, k)), F.lit("utf-8"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    from ._spread import spread

    out = spread(df).select(F.col(id_col), grams.alias("__g"))
    g = F.col("__g")
    n_win = F.greatest(F.size(g) - F.lit(w - 1), F.lit(1))
    width = F.least(F.lit(w), F.size(g))
    picks = F.when(
        F.size(g) > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n_win - 1),
                lambda j: F.struct(
                    (
                        j
                        + width
                        - F.array_position(
                            F.reverse(F.slice(g, j + 1, width)),
                            F.array_min(F.slice(g, j + 1, width)),
                        )
                    ).cast("long").alias("pos"),
                    F.array_min(F.slice(g, j + 1, width)).alias("fp"),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<pos:long,fp:long>>"))
    return (
        out.select(F.col(id_col), F.explode(picks).alias("p"))
        .select(F.col(id_col), F.col("p.pos").alias("pos"), F.col("p.fp").alias("fp"))
    )


def winnow_fingerprints_sql(
    table: str, id_col: str, text_col: str, k: int = 5, window: int = 4
) -> str:
    """DuckDB twin of winnow_fingerprints — same gram hash, same
    rightmost-min window picks, same short-doc rule."""
    if int(k) < 1 or int(window) < 1:
        raise ValueError("k and window must be >= 1")
    k, w = int(k), int(window)
    return f"""
WITH wf_t AS (
  SELECT {id_col},
         coalesce(list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> ''), []) AS ts
  FROM {table}
), wf_g AS (
  SELECT {id_col},
         CASE WHEN len(ts) >= {k}
              THEN list_transform(range(1, len(ts) - {k - 1} + 1),
                     i -> CAST(('0x' || substr(md5(array_to_string(ts[i:i + {k - 1}], ' ')), 1, 8)) AS BIGINT))
              ELSE [] END AS g
  FROM wf_t
), wf_p AS (
  SELECT {id_col},
         list_transform(range(0, greatest(len(g) - {w - 1}, 1)),
           j -> struct_pack(
             pos := j + least({w}, len(g))
                    - list_position(list_reverse(g[j + 1:j + least({w}, len(g))]),
                                    list_min(g[j + 1:j + least({w}, len(g))])),
             fp := list_min(g[j + 1:j + least({w}, len(g))]))) AS picks
  FROM wf_g WHERE len(g) > 0
)
SELECT DISTINCT {id_col}, CAST(p.pos AS BIGINT) AS pos, p.fp AS fp
FROM (SELECT {id_col}, unnest(picks) AS p FROM wf_p)
"""
