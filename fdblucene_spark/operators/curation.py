"""Corpus-curation operators for training-data pipelines.

Benchmark decontamination, paragraph-level dedup, and deterministic
stratified sampling — the pre-training passes that run AFTER the
per-doc taggers (textstats) and document-level dedup (dedup), in the
published shapes (GPT-3 appendix C n-gram decontamination; CCNet /
Dolma duplicated-paragraph removal; fixed-rate per-domain sampling).

Like the sibling modules, every operator is pure Catalyst (no Python
in the hot path) and ships an exact DuckDB SQL twin: md5 is the shared
deterministic hash, so Spark and the oracle agree bit-for-bit.

Scale notes (the 100 TB story):
- decontaminate: the benchmark gram set is SMALL by construction
  (eval suites: 1e5–1e7 grams); it broadcasts, so the corpus-side
  explode never shuffles — one map-side join + per-doc partial agg.
  broadcast=False falls back to a shuffle join for pathological
  benchmark sizes.
- paragraph dedup: one shuffle keyed by paragraph hash (the global
  occurrence count), one window per (hash) for the keeper rank, one
  per-doc reassembly agg keyed by id. Skewed boilerplate paragraphs
  (the common case: headers/footers repeated millions of times) stay
  bounded because the count aggregate reduces map-side before the
  shuffle.
- stratified_sample: stateless hash thresholding — no shuffle at
  all, deterministic across runs/cluster sizes, exactly reproducible
  by the SQL twin (md5-prefix uniform in [0, 1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles_col, _shingles_sql
from .textstats import _TOKENIZE_SQL, tokens_col

DECONTAM_N = 8  # word n-gram size (GPT-3 used 13; synthetic docs are shorter)


def benchmark_ngrams(bench: DataFrame, text_col: str, n: int = DECONTAM_N) -> DataFrame:
    """DISTINCT md5-hashed word n-grams of a benchmark/eval set —
    the contamination reference relation (one column: gram_h)."""
    from ._spread import spread

    return (
        spread(bench).select(F.explode(shingles_col(text_col, n)).alias("g"))
        .select(F.md5(F.to_binary(F.col("g"), F.lit("utf-8"))).alias("gram_h"))
        .distinct()
    )


def decontaminate(
    df: DataFrame,
    bench_grams: DataFrame,
    id_col: str,
    text_col: str,
    n: int = DECONTAM_N,
    broadcast: bool = True,
) -> DataFrame:
    """GPT-3-style n-gram decontamination: per training doc, how many
    of its DISTINCT word n-grams appear anywhere in the benchmark
    gram set (benchmark_ngrams output). Returns
    (id, n_grams, n_hits, hit_frac, contaminated) — contaminated is
    the published any-overlap rule (n_hits > 0); callers wanting a
    fraction threshold filter on hit_frac."""
    from ._spread import spread

    grams = spread(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_col(text_col, n))).alias("g"),
    ).select(
        id_col, F.md5(F.to_binary(F.col("g"), F.lit("utf-8"))).alias("gram_h")
    )
    ref = bench_grams.withColumn("__hit", F.lit(1))
    if broadcast:
        ref = F.broadcast(ref)
    return (
        grams.join(ref, "gram_h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_hits"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_grams"), 4).alias("hit_frac"),
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


def decontaminate_sql(
    table: str,
    id_col: str,
    text_col: str,
    bench_where: str,
    n: int = DECONTAM_N,
) -> str:
    """DuckDB twin: the benchmark set is `SELECT ... FROM table WHERE
    bench_where` (self-referential benchmarks keep the gate corpus
    closed over the same parquet)."""
    return f"""
WITH btoks AS (
  SELECT list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table} WHERE {bench_where}
), bgrams AS (
  SELECT DISTINCT md5(g) AS gram_h
  FROM (SELECT unnest({_shingles_sql(text_col, n)}) AS g FROM btoks)
), dtoks AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
), dgrams AS (
  SELECT {id_col}, md5(g) AS gram_h
  FROM (SELECT {id_col}, unnest(list_distinct({_shingles_sql(text_col, n)})) AS g FROM dtoks)
)
SELECT d.{id_col}, count(*)::BIGINT AS n_grams,
       sum(CASE WHEN b.gram_h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits,
       round(sum(CASE WHEN b.gram_h IS NOT NULL THEN 1 ELSE 0 END) / count(*)::DOUBLE, 4) AS hit_frac,
       sum(CASE WHEN b.gram_h IS NOT NULL THEN 1 ELSE 0 END) > 0 AS contaminated
FROM dgrams d LEFT JOIN bgrams b ON b.gram_h = d.gram_h
GROUP BY d.{id_col}
"""


# --------------------------------------------------------- paragraph dedup
PARA_SPLIT = r"\.\s+"  # sentence-ish paragraphs in the synthetic corpora


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_regex: str = PARA_SPLIT,
    min_count: int = 2,
) -> DataFrame:
    """CCNet/Dolma duplicated-paragraph removal: split each doc into
    paragraphs, hash each normalized paragraph, count occurrences
    CORPUS-WIDE, and drop every occurrence of a paragraph seen >=
    min_count times EXCEPT the first (lowest (id, position) keeps it —
    deterministic, so reruns and the SQL twin agree). Returns
    (id, n_paras, n_dropped, text_clean) with the survivors rejoined
    in their original order.

    Normalization is lowercase+trim (CCNet normalizes before
    hashing); empty paragraphs are ignored.
    """
    from ._spread import spread

    paras = spread(df).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), split_regex)).alias("pos", "para"),
    ).withColumn("pnorm", F.lower(F.trim(F.col("para")))).filter(F.col("pnorm") != "")
    paras = paras.withColumn(
        "ph", F.md5(F.to_binary(F.col("pnorm"), F.lit("utf-8")))
    )
    counted = paras.groupBy("ph").agg(
        F.count(F.lit(1)).alias("pcount"),
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias("keeper"),
    )
    marked = paras.join(counted, "ph").withColumn(
        "is_drop",
        (F.col("pcount") >= int(min_count))
        & ~((F.col(id_col) == F.col("keeper.i")) & (F.col("pos") == F.col("keeper.p"))),
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.col("is_drop").cast("long")).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("is_drop"),
                                F.struct(F.col("pos"), F.col("para")),
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                ". ",
            ).alias("text_clean"),
        )
        .select(id_col, "n_paras", "n_dropped", "text_clean")
    )


def paragraph_dedup_sql(
    table: str,
    id_col: str,
    text_col: str,
    split_regex: str = PARA_SPLIT,
    min_count: int = 2,
) -> str:
    return f"""
WITH paras AS (
  SELECT {id_col}, p.i - 1 AS pos, p.para, lower(trim(p.para)) AS pnorm
  FROM (
    SELECT {id_col},
           unnest(list_transform(
             range(1, len(string_split_regex({text_col}, '{split_regex}')) + 1),
             i -> struct_pack(para := string_split_regex({text_col}, '{split_regex}')[i], i := i))) AS p
    FROM {table}
  )
  WHERE lower(trim(p.para)) <> ''
), hashed AS (
  SELECT *, md5(pnorm) AS ph FROM paras
), counted AS (
  SELECT ph, count(*)::BIGINT AS pcount,
         min(struct_pack(i := {id_col}, p := pos)) AS keeper
  FROM hashed GROUP BY ph
), marked AS (
  SELECT h.{id_col}, h.pos, h.para,
         c.pcount >= {min_count}
           AND NOT (h.{id_col} = c.keeper.i AND h.pos = c.keeper.p) AS is_drop
  FROM hashed h JOIN counted c ON c.ph = h.ph
)
SELECT {id_col}, count(*)::BIGINT AS n_paras,
       sum(CASE WHEN is_drop THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
       coalesce(array_to_string(list(para ORDER BY pos) FILTER (WHERE NOT is_drop), '. '), '') AS text_clean
FROM marked GROUP BY {id_col}
"""


# ----------------------------------------------------- duplicated substrings
def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Exact-substring duplicate detection (the Lee et al.
    "Deduplicating Training Data Makes Language Models Better"
    operator, re-expressed window-wise): a token position is
    duplicated if some n-token window covering it appears in >=
    min_doc_freq DISTINCT docs corpus-wide; maximal runs of
    consecutive duplicated window starts merge into spans. Returns
    (id, span_start, span_end, span_tokens) with token-index bounds
    (span_end inclusive, = last covered token).

    Docs shorter than n tokens have no n-token window and emit
    nothing. The published suffix-array formulation finds arbitrary-
    length duplicates; fixed-n windows find exactly the duplicates of
    length >= n (a duplicate of length L >= n is a run of L - n + 1
    duplicated windows), which is the practical configuration (Lee et
    al. use a 50-token threshold) and shuffles ONLY (hash, doc, pos)
    triples — no suffix array, no global sort of the corpus text.

    Scale shape: one explode (T window rows for T corpus tokens), one
    partial+final distinct-doc count keyed by the md5 window hash,
    one hash join back, one per-doc window for the island merge.
    Boilerplate skew is bounded by the count aggregate's map-side
    combine (the join fans duplicated grams back out only to their
    own occurrences)."""
    toks = tokens_col(text_col)
    base = df.select(F.col(id_col), toks.alias("__ts")).filter(F.size("__ts") >= n)
    grams = base.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("__ts") - (n - 1)),
                lambda i: F.md5(
                    F.to_binary(F.concat_ws(" ", F.slice("__ts", i, n)), F.lit("utf-8"))
                ),
            )
        ).alias("pos", "gh"),
    )
    counts = grams.groupBy("gh").agg(
        F.countDistinct(id_col).alias("gdf")
    ).filter(F.col("gdf") >= int(min_doc_freq))
    dup = grams.join(counts.select("gh"), "gh")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = dup.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        islands.groupBy(id_col, "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (n - 1)).alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("long"),
            F.col("span_end").cast("long"),
            (F.col("span_end") - F.col("span_start") + 1).cast("long").alias("span_tokens"),
        )
    )


def duplicated_spans_sql(
    table: str,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_doc_freq: int = 2,
) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
), grams AS (
  SELECT {id_col}, g.i - 1 AS pos, md5(g.s) AS gh
  FROM (
    SELECT {id_col},
           unnest(list_transform(range(1, len(ts) - {n - 2}),
             i -> struct_pack(s := array_to_string(ts[i:i+{n - 1}], ' '), i := i))) AS g
    FROM toks WHERE len(ts) >= {n}
  )
), counts AS (
  SELECT gh FROM grams GROUP BY gh HAVING count(DISTINCT {id_col}) >= {min_doc_freq}
), dup AS (
  SELECT g.{id_col}, g.pos FROM grams g JOIN counts c ON c.gh = g.gh
), islands AS (
  SELECT {id_col}, pos,
         pos - row_number() OVER (PARTITION BY {id_col} ORDER BY pos) AS grp
  FROM dup
)
SELECT {id_col}, min(pos)::BIGINT AS span_start,
       (max(pos) + {n - 1})::BIGINT AS span_end,
       (max(pos) + {n - 1} - min(pos) + 1)::BIGINT AS span_tokens
FROM islands GROUP BY {id_col}, grp
"""


def remove_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Apply step of exact-substring dedup: cut token ranges (the
    duplicated_spans output, or any (id, span_start, span_end)
    relation after a keeper policy) from each doc. Returns
    (id, text_clean, n_tokens, n_tokens_removed); text_clean is the
    surviving tokens re-joined with single spaces — token-level
    reconstruction, the standard contract of token-level dedup
    pipelines (original whitespace is not preserved).

    Shape: spans collapse to one small array per doc (collect_list
    after the group-by), then a single map-only pass filters each
    doc's token vector by index — no second shuffle over the corpus
    text beyond the doc-keyed span join."""
    sp = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("a"), F.col("span_end").alias("b"))
        ).alias("__spans")
    )
    ts = tokens_col(text_col)
    j = df.select(F.col(id_col), ts.alias("__ts")).join(sp, id_col, "left")
    spans_arr = F.coalesce(
        F.col("__spans"),
        F.array().cast("array<struct<a:long,b:long>>"),
    )
    kept = F.filter(
        "__ts",
        lambda t, i: ~F.exists(
            spans_arr, lambda s: (i >= s["a"]) & (i <= s["b"])
        ),
    )
    return j.select(
        id_col,
        F.array_join(kept, " ").alias("text_clean"),
        F.size("__ts").cast("long").alias("n_tokens"),
        (F.size("__ts") - F.size(kept)).cast("long").alias("n_tokens_removed"),
    )


# ------------------------------------------------------ stratified sampling
def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic per-stratum sampling (domain mixing): keep a row
    iff u(id) < rate(stratum), where u = the first 8 md5 hex digits of
    (salt || id) scaled to [0, 1). Unlike DataFrame.sampleBy, the
    decision is a pure function of (id, salt) — stable across runs,
    partitionings, and cluster sizes, and exactly reproducible by the
    SQL twin. Stateless map-only pass: no shuffle, no RNG state."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.to_binary(F.concat(F.lit(salt), F.col(id_col).cast("string")), F.lit("utf-8"))),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        / F.lit(float(16**8))
    )
    rate = F.lit(float(default_rate))
    for key, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == key, F.lit(float(r))).otherwise(rate)
    return df.withColumn("__u", u).filter(F.col("__u") < rate).drop("__u")


def plan_mixture(
    df: DataFrame,
    strata_col: str,
    size_col: str,
    weights: dict[str, float],
    budget: float,
) -> dict[str, float]:
    """Domain-mixing rate planner: per-stratum sampling rates that hit
    a total token/byte `budget` at the target mixture `weights`
    (the Pile/Dolma-style mixture table). rate(d) = min(1, target_d /
    observed_d) with target_d = budget * w_d / sum(w): a stratum
    smaller than its target saturates at 1.0 (can't upsample by
    dropping; weighted-epoch repetition is a training-loop concern,
    not a filter's). Driver-side state is one row per stratum (the
    mixture table is human-sized by definition); the heavy part — the
    per-stratum size aggregate — is one partial+final Spark agg.
    Feed the result to stratified_sample for the deterministic
    apply."""
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum positive")
    totals = {
        r[0]: float(r[1])
        for r in df.groupBy(strata_col).agg(F.sum(size_col)).collect()
        if r[0] is not None and r[1] is not None
    }
    rates = {}
    for d, w in sorted(weights.items()):
        t = totals.get(d)
        if not t or t <= 0:
            continue
        rates[d] = min(1.0, ((float(budget) * float(w)) / wsum) / t)
    return rates


def plan_mixture_sql_rate(
    table: str,
    strata_col: str,
    size_col: str,
    weights: dict[str, float],
    budget: float,
) -> str:
    """The twin's rate expression: a correlated CASE over per-stratum
    totals, float-op-ordered exactly like plan_mixture."""
    wsum = float(sum(weights.values()))
    whens = " ".join(
        f"WHEN {strata_col} = '{d}' THEN least(1.0, (({float(budget)!r} * {float(w)!r}) / {wsum!r}) / "
        f"(SELECT sum({size_col})::DOUBLE FROM {table} t WHERE t.{strata_col} = '{d}'))"
        for d, w in sorted(weights.items())
    )
    return f"(CASE {whens} ELSE 0.0 END)"


def stratified_sample_sql(
    table: str,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "v1",
    select: str = "*",
) -> str:
    whens = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {float(r)!r}" for k, r in sorted(rates.items())
    )
    return f"""
SELECT {select} FROM {table}
WHERE (CAST(('0x' || substr(md5('{salt}' || {id_col}::VARCHAR), 1, 8)) AS BIGINT)::DOUBLE
       / {float(16 ** 8)!r})
      < (CASE {whens} ELSE {float(default_rate)!r} END)
"""


# ----------------------------------------------------- quality classifier
CLF_SALT = "clf-v1"


def _u01(col):
    """md5-prefix uniform in [0, 1): the module's shared deterministic
    'random' (first 8 hex digits / 16^8), bit-identical in DuckDB."""
    return (
        F.conv(
            F.substring(F.md5(F.to_binary(col, F.lit("utf-8"))), 1, 8), 16, 10
        ).cast("double")
        / F.lit(float(16 ** 8))
    )


def classifier_features(text_col: str, bigrams: bool = True):
    """Feature array of the hash-bucket classifier: analyzer unigrams,
    plus word bigrams when bigrams=True (fastText's wordNgrams=2).
    Docs with < 2 tokens fall back to the whole-text 'bigram'
    (shingles_col fallback) — deterministic and twin-matched."""
    toks = tokens_col(text_col)
    return F.concat(toks, shingles_col(text_col, 2)) if bigrams else toks


def classifier_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    salt: str = CLF_SALT,
    weights: DataFrame | None = None,
    bias: float = 0.0,
    threshold: float = 0.5,
    bigrams: bool = True,
    broadcast: bool = True,
) -> DataFrame:
    """fastText-style linear quality classifier APPLY (the CCNet /
    GPT-3 model-based quality filter): features = unigrams (+ word
    bigrams), hashed into n_buckets (the hashing trick), mean of the
    bucket weights + bias through a sigmoid -> (id, n_feats, score,
    label). label = score >= threshold.

    weights: optional (bucket:long, weight:double) model table — the
    production shape: a trained model BROADCASTS (n_buckets rows) and
    the apply is one map-side join + one per-doc partial agg; no
    corpus-sized shuffle beyond the doc-keyed combine. broadcast=False
    falls back to a shuffle join for pathological bucket counts.
    weights=None derives deterministic pseudo-weights from the bucket
    id itself (u01(salt:w:bucket) * 2 - 1) — fully map-side, no join,
    and exactly reproducible by the SQL twin (classifier_sql), which
    is what the driver gate checks. Swapping in a trained table
    changes the scores, never the plan shape.

    Docs whose text yields zero features keep score = sigmoid(bias)
    (the model's prior), n_feats = 0.
    """
    from ._spread import spread

    feats = (
        spread(df).select(F.col(id_col), F.explode(classifier_features(text_col, bigrams)).alias("f"))
        .withColumn(
            "bucket",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.to_binary(F.concat(F.lit(salt + ":"), F.col("f")), F.lit("utf-8"))),
                        1, 8,
                    ),
                    16, 10,
                ).cast("long"),
                F.lit(int(n_buckets)),
            ),
        )
    )
    if weights is None:
        feats = feats.withColumn(
            "w",
            _u01(F.concat(F.lit(salt + ":w:"), F.col("bucket").cast("string"))) * F.lit(2.0)
            - F.lit(1.0),
        )
    else:
        wdf = weights.select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("weight").cast("double").alias("w"),
        )
        feats = feats.join(
            F.broadcast(wdf) if broadcast else wdf, "bucket", "left"
        ).withColumn("w", F.coalesce(F.col("w"), F.lit(0.0)))
    agg = feats.withColumn("w", F.col("w").cast("float")).groupBy(id_col).agg(
        # float32-quantized addends -> exact, order-independent sum
        F.count(F.lit(1)).alias("n_feats"),
        F.sum(F.col("w").cast("double")).alias("wsum"),
    )
    raw = F.lit(float(bias)) + F.when(
        F.col("n_feats") > 0, F.col("wsum") / F.col("n_feats")
    ).otherwise(F.lit(0.0))
    return (
        df.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-raw))).alias("score"),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-raw)) >= F.lit(float(threshold))).alias(
                "label"
            ),
        )
    )


def classifier_sql(
    table: str,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    salt: str = CLF_SALT,
    bias: float = 0.0,
    threshold: float = 0.5,
    bigrams: bool = True,
) -> str:
    """DuckDB twin of classifier_scores (derived-weights mode): same
    md5 bucket hash, same u01*2-1 weight chain, same mean+sigmoid
    float order."""
    feat_src = f"list_concat(ts, {_shingles_sql(text_col, 2)})" if bigrams else "ts"
    u8 = (
        lambda e: f"(CAST(('0x' || substr(md5({e}), 1, 8)) AS BIGINT)::DOUBLE"
        f" / {float(16 ** 8)!r})"
    )
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
), feats AS (
  SELECT {id_col}, unnest({feat_src}) AS f FROM toks
), bucketed AS (
  SELECT {id_col},
         CAST(('0x' || substr(md5('{salt}:' || f), 1, 8)) AS BIGINT) % {int(n_buckets)} AS bucket
  FROM feats
), weighted AS (
  SELECT {id_col}, ({u8(f"'{salt}:w:' || bucket::VARCHAR")} * 2.0 - 1.0)::FLOAT AS w
  FROM bucketed
), agg AS (
  SELECT {id_col}, count(*)::BIGINT AS n_feats, sum(w::DOUBLE) AS wsum FROM weighted GROUP BY {id_col}
)
SELECT t.{id_col}, COALESCE(a.n_feats, 0)::BIGINT AS n_feats,
       1.0 / (1.0 + exp(-({float(bias)!r} + CASE WHEN a.n_feats > 0 THEN a.wsum / a.n_feats ELSE 0.0 END))) AS score,
       1.0 / (1.0 + exp(-({float(bias)!r} + CASE WHEN a.n_feats > 0 THEN a.wsum / a.n_feats ELSE 0.0 END))) >= {float(threshold)!r} AS label
FROM {table} t LEFT JOIN agg a USING ({id_col})
"""


# ----------------------------------------------- sequence packing
def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int,
    sep_tokens: int = 1,
    num_partitions: int | None = None,
    freeze_dir: str | None = None,
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: concatenate every
    document's analyzer tokens (+ sep_tokens separator/EOS tokens per
    doc) in id order into one virtual token stream, then cut it into
    fixed-length training sequences of seq_len. Returns one row per
    doc: (id, n_tokens, tok_start, chunk_first, chunk_last) — the
    doc's global token offset and the inclusive range of training
    chunks it lands in. Explode sequence(chunk_first, chunk_last) for
    a (chunk_id, doc) assignment table; group by chunk for the pack
    manifest a loader would read.

    The global prefix sum uses the build's dense-docID scan pattern
    (build.py assign_dense_doc_ids) instead of a single-partition
    window: range-partition by id + in-partition sort, FREEZE to
    parquet (pins the sampled range boundaries so both the totals job
    and the final join see one consistent partitioning), per-partition
    token totals -> cumulative offsets (one collect of num_partitions
    rows), then global offset = partition offset + in-partition
    running sum. Parallelism stays num_partitions end-to-end — no
    stage ever sees the whole stream.

    sep_tokens=0 with an empty doc contributes nothing: the next
    doc's tok_start is unchanged, and chunk_last = the chunk of
    tok_start - 1 (so chunk_last < chunk_first exactly when
    tok_start sits on a chunk boundary)."""
    import os as _os
    import uuid as _uuid

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if sep_tokens < 0:
        raise ValueError("sep_tokens must be >= 0")
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    if freeze_dir is None:
        freeze_dir = _os.path.join("/tmp", "sparklucene-pack-" + _uuid.uuid4().hex[:12])
    from ._spread import spread

    # tokenize AFTER the range partitioning: repartitionByRange's
    # sampling pass evaluates its child's projection, so counting
    # tokens before it would run the tokenizer twice (sample + write);
    # ranged rows carry only (id, text) into the sort, and _contrib is
    # computed once in the freeze-write stage. Output is identical —
    # _mid stamps the same (partition, in-partition id order) ranks.
    keyed = (
        spread(df).select(F.col(id_col), F.col(text_col))
        .repartitionByRange(num_partitions, F.col(id_col))
        .sortWithinPartitions(id_col)
        .select(
            F.col(id_col),
            (F.size(tokens_col(text_col)).cast("long") + F.lit(int(sep_tokens))).alias("_contrib"),
        )
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    keyed.write.mode("errorifexists").parquet(freeze_dir)
    frozen = spark.read.parquet(freeze_dir)
    pid = F.shiftright(F.col("_mid"), 33).cast("int")
    sums = {
        int(r["pid"]): int(r["s"])
        for r in frozen.groupBy(pid.alias("pid")).agg(F.sum("_contrib").alias("s")).collect()
    }
    offsets, acc = [], 0
    for p in sorted(sums):
        offsets.append((p, acc))
        acc += sums[p]
    off_df = F.broadcast(
        spark.createDataFrame(offsets or [(0, 0)], "pid int, _poff long")
    )
    w = (
        Window.partitionBy("pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (F.col("_poff") + F.coalesce(F.sum("_contrib").over(w), F.lit(0))).alias("tok_start")
    sep = int(sep_tokens)
    return (
        frozen.withColumn("pid", pid)
        .join(off_df, "pid")
        .select(F.col(id_col), "_contrib", start)
        .select(
            F.col(id_col),
            (F.col("_contrib") - sep).alias("n_tokens"),
            F.col("tok_start"),
            F.floor(F.col("tok_start") / seq_len).cast("long").alias("chunk_first"),
            F.floor((F.col("tok_start") + F.col("_contrib") - 1) / seq_len)
            .cast("long")
            .alias("chunk_last"),
        )
    )


def pack_sequences_sql(
    table: str, id_col: str, text_col: str, seq_len: int, sep_tokens: int = 1
) -> str:
    """DuckDB twin of pack_sequences: a plain running-sum window in id
    order (the oracle can afford the global window the engine avoids)."""
    sep = int(sep_tokens)
    return f"""
WITH toks AS (
  SELECT {id_col},
         len(list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> ''))::BIGINT AS n_tokens
  FROM {table}
), seq AS (
  SELECT {id_col}, n_tokens,
         (sum(n_tokens + {sep}) OVER (ORDER BY {id_col} ROWS UNBOUNDED PRECEDING)
          - (n_tokens + {sep}))::BIGINT AS tok_start
  FROM toks
)
SELECT {id_col}, n_tokens, tok_start,
       (tok_start // {int(seq_len)})::BIGINT AS chunk_first,
       ((tok_start + n_tokens + {sep} - 1) // {int(seq_len)})::BIGINT AS chunk_last
FROM seq
"""


# ------------------------------------------- deterministic global shuffle
def global_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "v1",
    num_partitions: int | None = None,
    freeze_dir: str | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training order: every doc gets
    a dense 0-based shuffle_rank, the global sort rank under
    md5(salt || id) with an id tiebreak — a seeded permutation that is
    partition-invariant, rerun-identical, and changes wholesale with
    the salt (re-shuffle between epochs by bumping it). Compose with
    pack_sequences ordered by shuffle_rank for shuffled-and-packed
    training shards.

    Scale shape: delegates to the dense-docID scan
    (build.assign_dense_doc_ids) keyed on the hash — range-partition
    + freeze + footer counts + broadcast offsets; no global window,
    no skew (md5 keys are uniform by construction)."""
    from .build import assign_dense_doc_ids

    key = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    keyed = df.select(F.col(id_col), key.alias("_shufkey"))
    out = assign_dense_doc_ids(
        keyed, ["_shufkey", id_col],
        num_partitions=num_partitions, freeze_dir=freeze_dir,
    )
    return out.select(F.col(id_col), F.col("doc").alias("shuffle_rank"))


def global_shuffle_sql(table: str, id_col: str, salt: str = "v1") -> str:
    """DuckDB twin: ROW_NUMBER over the same md5 order."""
    return f"""
SELECT {id_col},
       (ROW_NUMBER() OVER (ORDER BY md5('{salt}:' || {id_col}::VARCHAR) ASC, {id_col} ASC) - 1)::BIGINT
         AS shuffle_rank
FROM {table}
"""


def cap_per_key(
    df: DataFrame,
    id_col: str,
    key_col: str,
    max_per_key: int,
    salt: str = "v1",
) -> DataFrame:
    """Per-domain/source document cap — the Common-Crawl curation
    primitive that stops one domain from dominating the mix: keep at
    most max_per_key docs per key, chosen DETERMINISTICALLY as the
    md5(salt || id)-smallest within the key (id tiebreak). Reruns and
    repartitionings agree; bumping the salt re-draws the sample.
    Returns (id, key, cap_rank, keep): cap_rank is the 1-based hash
    rank within the key, keep = cap_rank <= max_per_key — callers
    filter on keep or inspect what the cap would drop.

    Scale shape: ONE window shuffle keyed by key_col over (id, key)
    only (two slim columns, never the payload); md5 ordering spreads
    each key's rows uniformly so the per-key sort has no adversarial
    order. A pathologically hot key concentrates its window on one
    task — the same skew profile as any per-domain groupBy; salt the
    key upstream if a single domain is corpus-sized."""
    if int(max_per_key) < 1:
        raise ValueError("max_per_key must be >= 1")
    hkey = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(key_col).orderBy(hkey.asc(), F.col(id_col).asc())
    return df.select(id_col, key_col).withColumn(
        "cap_rank", F.row_number().over(w).cast("long")
    ).withColumn("keep", F.col("cap_rank") <= int(max_per_key))


def cap_per_key_sql(
    table: str, id_col: str, key_col: str, max_per_key: int, salt: str = "v1"
) -> str:
    """DuckDB twin: ROW_NUMBER over the same md5-within-key order."""
    return f"""
SELECT {id_col}, {key_col},
       ROW_NUMBER() OVER (PARTITION BY {key_col}
                          ORDER BY md5('{salt}:' || {id_col}::VARCHAR) ASC,
                                   {id_col} ASC)::BIGINT AS cap_rank,
       ROW_NUMBER() OVER (PARTITION BY {key_col}
                          ORDER BY md5('{salt}:' || {id_col}::VARCHAR) ASC,
                                   {id_col} ASC) <= {int(max_per_key)} AS keep
FROM {table}
"""


TRACKING_PARAM_RE = (
    "^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref|ref_src)(=|$)"
)


def canonical_url(url) -> F.Column:
    """Canonical form of a URL column — the normalization CCNet-style
    web curation applies before URL-level dedup. Rules (each one a
    documented, twin-replicated string op; NO percent-decoding):

    1. lowercase the scheme and the host
    2. strip one leading 'www.' from the host
    3. strip the scheme's default port (:80 http, :443 https)
    4. drop the #fragment
    5. drop tracking query params (TRACKING_PARAM_RE: utm_*, fbclid,
       gclid, msclkid, mc_eid, ref, ref_src)
    6. sort surviving params by their full 'k=v' string (duplicate
       keys keep a deterministic value order)
    7. strip trailing slashes from the path (root '/' and '' collapse
       — intended for dedup keys, not for refetching)

    Pure Catalyst (regexp/split/filter/sort/join — whole-stage
    codegen); the DuckDB twin canonical_url_sql applies the identical
    chain, so canonical keys agree byte-for-byte."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # rule 4 (first, like the twin)
    host = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(host, ":443$", "")).otherwise(host)
    )
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    parts = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    canon_q = F.array_join(F.array_sort(parts), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of canonical_url: the same 7 rules over `expr`.
    Every regexp is ^/$-anchored or fragment-greedy so Spark's
    replace-all and DuckDB's replace-first agree by construction."""
    scheme = f"lower(regexp_extract(trim({expr}), '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))"
    rest = (
        f"regexp_replace(regexp_replace(trim({expr}), "
        f"'^[A-Za-z][A-Za-z0-9+.\\-]*://', ''), '#.*$', '')"
    )
    host = f"regexp_replace(lower(regexp_extract({rest}, '^([^/?]*)', 1)), '^www\\.', '')"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '') "
        f"ELSE {host} END"
    )
    path = f"regexp_replace(regexp_extract({rest}, '^[^/?]*([^?]*)', 1), '/+$', '')"
    query = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    canon_q = (
        f"array_to_string(list_sort(list_filter(string_split({query}, '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}'))), '&')"
    )
    return (
        f"({scheme} || '://' || ({host}) || {path} || "
        f"CASE WHEN {canon_q} <> '' THEN '?' || {canon_q} ELSE '' END)"
    )


_HTML_ENTITIES = [
    # &amp; decodes LAST so '&amp;lt;' -> '&lt;' (one level, no
    # double-decode) — the order WET-style extractors use
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

# block-level closers/breaks that become newlines so paragraph
# structure survives tag stripping (what a WET extraction keeps)
_HTML_BREAK_RE = r"(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/td|/section|/article)[^>]*>"


def extract_html(html) -> F.Column:
    """Plain text from an HTML column — the WET-style extraction pass
    that turns crawl HTML into trainable text. Deliberately a
    deterministic string chain (NOT a DOM parser; crawl-scale
    extractors are regex/state-machine passes for the same reason):

    1. drop <script>/<style> blocks wholesale (with their content)
    2. drop <!-- comments -->
    3. block-level closers (_HTML_BREAK_RE) become newlines
    4. strip every remaining tag
    5. decode the common entities (&amp; LAST — single-level decode)
    6. collapse horizontal whitespace, trim lines, drop empty lines

    Pure Catalyst; extract_html_sql is the char-identical DuckDB twin
    (both regex engines see the same (?is)/non-greedy patterns; the
    twin passes the 'g' option where DuckDB defaults to first-match).
    Compose with clean_c4 / quality taggers downstream."""
    t = html
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, _HTML_BREAK_RE, "\n")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, ch in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, r"[ \t\r]+", " ")
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )
    # null/empty inputs normalize to '' (the twin coalesces the same
    # way — DuckDB's empty-list array_to_string is NULL)
    return F.coalesce(F.array_join(lines, "\n"), F.lit(""))


def extract_html_sql(expr: str) -> str:
    """DuckDB twin of extract_html over `expr` (same chain, same
    order; 'g' = global to match Spark's replace-all default)."""
    t = f"regexp_replace({expr}, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    t = f"regexp_replace({t}, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    t = f"regexp_replace({t}, '(?s)<!--.*?-->', ' ', 'g')"
    t = f"regexp_replace({t}, '{_HTML_BREAK_RE}', chr(10), 'g')"
    t = f"regexp_replace({t}, '<[^>]+>', ' ', 'g')"
    for ent, ch in _HTML_ENTITIES:
        lit = ch.replace("'", "''")
        t = f"replace({t}, '{ent}', '{lit}')"
    t = f"regexp_replace({t}, '[ \\t\\r]+', ' ', 'g')"
    return (
        f"coalesce(array_to_string(list_filter(list_transform("
        f"string_split({t}, chr(10)), x -> trim(x)), x -> x <> ''), chr(10)), '')"
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """URL-level exact dedup over the canonical form: returns
    (id, canon_url, keeper) where keeper marks the min-id doc per
    canonical URL — the first-stage web-crawl dedup (one URL fetched
    many times across snapshots collapses to one document).

    Scale shape: canonicalization is map-only; the keeper rule is ONE
    partial+final min agg keyed by canon_url joined back on the key —
    no window, no self-join on the payload."""
    canon = df.select(
        F.col(id_col).alias("id"), canonical_url(F.col(url_col)).alias("canon_url")
    )
    keepers = canon.groupBy("canon_url").agg(F.min("id").alias("_keep_id"))
    return (
        canon.join(keepers, "canon_url")
        .select(
            F.col("id").alias(id_col),
            "canon_url",
            (F.col("id") == F.col("_keep_id")).alias("keeper"),
        )
    )


def url_dedup_sql(src_sql: str, id_col: str, url_expr: str) -> str:
    """DuckDB twin of url_dedup over `src_sql` rows."""
    return f"""
WITH src AS ({src_sql}),
canon AS (SELECT {id_col} AS id, {canonical_url_sql(url_expr)} AS canon_url FROM src),
keepers AS (SELECT canon_url, min(id) AS keep_id FROM canon GROUP BY canon_url)
SELECT c.id AS {id_col}, c.canon_url, c.id = k.keep_id AS keeper
FROM canon c JOIN keepers k USING (canon_url)
"""


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
    stride: int | None = None,
) -> DataFrame:
    """Sliding-window document chunking (the HF-tokenizer
    `return_overflowing_tokens` + stride pattern): split each doc's
    analyzer token stream into windows of `window` tokens starting
    every `stride` tokens (stride < window = overlapping context for
    RAG indexing / long-doc pretraining). One row per chunk:
    (id, chunk_idx, tok_start, n_tokens, chunk_text) with chunk_text
    the space-joined analyzer tokens of the slice.

    Chunk rule: the last chunk is the FIRST whose end reaches the doc
    end — n_chunks = 1 if n <= window else ceil((n-window)/stride)+1,
    so every token is covered and no window is a strict subset of an
    earlier one. Zero-token docs emit zero chunks.

    Scale shape: pure Catalyst (tokenize -> explode(sequence) ->
    slice), whole-stage codegen, zero shuffles — chunking stays
    embarrassingly parallel however large the corpus; downstream
    repartition is the caller's choice."""
    if window <= 0:
        raise ValueError("window must be positive")
    stride = window if stride is None else int(stride)
    if not (0 < stride <= window):
        raise ValueError("stride must be in (0, window]")
    toks = tokens_col(text_col)
    n = F.size("_ts")
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.ceil((n - F.lit(window)) / F.lit(stride)).cast("long") + 1
    )
    from ._spread import spread

    return (
        spread(df).select(F.col(id_col), toks.alias("_ts"))
        .where(n > 0)
        .select(
            F.col(id_col),
            F.col("_ts"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            (F.col("chunk_idx") * stride).alias("tok_start"),
            F.slice(F.col("_ts"), (F.col("chunk_idx") * stride + 1).cast("int"), window).alias("_cts"),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            "tok_start",
            F.size("_cts").cast("long").alias("n_tokens"),
            F.array_join("_cts", " ").alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    table: str, id_col: str, text_col: str, window: int, stride: int | None = None
) -> str:
    """DuckDB twin of chunk_documents (same tokenizer regex, same
    last-chunk rule)."""
    stride = window if stride is None else int(stride)
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
), sized AS (
  SELECT {id_col}, ts, len(ts)::BIGINT AS n FROM toks WHERE len(ts) > 0
), expanded AS (
  SELECT {id_col}, ts,
         unnest(range(0, CASE WHEN n <= {int(window)} THEN 1
                              ELSE ceil((n - {int(window)})::DOUBLE / {stride})::BIGINT + 1 END)) AS chunk_idx
  FROM sized
)
SELECT {id_col}, chunk_idx, (chunk_idx * {stride})::BIGINT AS tok_start,
       len(ts[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {int(window)}])::BIGINT AS n_tokens,
       array_to_string(ts[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {int(window)}], ' ') AS chunk_text
FROM expanded
"""


def plan_temperature(
    df: DataFrame,
    strata_col: str,
    size_col: str,
    alpha: float,
    budget: float,
) -> dict[str, float]:
    """Temperature-based mixture planner (the mT5/XLM-R alpha-sampling
    recipe): target weights are DERIVED from the observed sizes,
    p_d = size_d^alpha / sum(size^alpha) — alpha=1 keeps natural
    proportions, alpha->0 flattens toward uniform, upweighting
    low-resource domains. rate(d) = min(1, budget * p_d / size_d),
    applied with stratified_sample like plan_mixture. Same scale
    shape: ONE partial+final per-stratum agg; the mixture table is
    driver-sized by definition."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    totals = {
        r[0]: float(r[1])
        for r in df.groupBy(strata_col).agg(F.sum(size_col)).collect()
        if r[0] is not None and r[1] is not None and float(r[1]) > 0
    }
    # sum in sorted-stratum order: the float result is then a pure
    # function of the (exact) totals, reproducible by the SQL twin
    denom = sum(totals[d] ** alpha for d in sorted(totals))
    if denom <= 0:
        return {}
    return {
        d: min(1.0, (float(budget) * (t ** alpha / denom)) / t)
        for d, t in sorted(totals.items())
    }


def plan_temperature_sql(
    table: str, strata_col: str, size_col: str, alpha: float, budget: float
) -> str:
    """DuckDB twin of plan_temperature: the per-stratum rates table.
    Totals are exact (BIGINT sums, exact in double); the cross-stratum
    power sum is a float reduction whose addend order SQL does not
    pin, so twins compare rates ROUNDED (the gate rounds floats to 9
    digits) rather than raw ulps — the engine's sorted-order Python
    sum and the SQL sum agree to far more than 9 digits on a
    human-sized mixture table."""
    a = float(alpha)
    return f"""
WITH sizes AS (
  SELECT {strata_col} AS stratum, sum({size_col})::DOUBLE AS s
  FROM {table} WHERE {strata_col} IS NOT NULL GROUP BY {strata_col} HAVING sum({size_col}) > 0
), d AS (SELECT sum(pow(s, {a!r})) AS denom FROM sizes)
SELECT stratum, round(least(1.0, ({float(budget)!r} * (pow(s, {a!r}) / d.denom)) / s), 9) AS rate
FROM sizes CROSS JOIN d
"""


def conversation_dedup(
    df: DataFrame,
    conv_col: str,
    order_col: str,
    text_col: str,
    sep: str = "\x1f",
) -> DataFrame:
    """Conversation-level exact dedup over a turns table — the
    transcript analogue of document exact dedup (dedup.exact_duplicates):
    two conversations are duplicates iff their turn texts are identical
    IN TURN ORDER. fingerprint = md5 over the ordered turn texts joined
    by `sep` (the separator keeps ["ab","c"] != ["a","bc"]); keeper =
    the minimum conv id per fingerprint (deterministic, rerun-stable).
    Returns one row per conversation: (conv, fingerprint, keeper).

    Scale shape: ONE conv-keyed agg (sort_array(collect_list(struct))
    -> in-order concat — a conversation's turns are bounded, so the
    collected array is too) + one fingerprint-keyed min agg joined
    back. No window over the corpus, no self-join; both shuffles key
    on high-cardinality ids."""
    rolled = df.groupBy(F.col(conv_col).alias("conv")).agg(
        F.md5(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(order_col).alias("o"),
                                F.col(text_col).alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
            )
        ).alias("fingerprint")
    )
    keepers = rolled.groupBy("fingerprint").agg(F.min("conv").alias("keep_conv"))
    return rolled.join(keepers, "fingerprint").select(
        "conv", "fingerprint", (F.col("conv") == F.col("keep_conv")).alias("keeper")
    )


def conversation_dedup_sql(
    table: str,
    conv_col: str,
    order_col: str,
    text_col: str,
    sep: str = "\x1f",
) -> str:
    """DuckDB twin of conversation_dedup (md5 and string semantics are
    bit-identical across both engines for UTF-8 text)."""
    sep_sql = "'" + sep.replace("'", "''") + "'"
    return f"""
rolled AS (
  SELECT {conv_col} AS conv,
         md5(string_agg({text_col}, {sep_sql} ORDER BY {order_col})) AS fingerprint
  FROM {table} GROUP BY {conv_col}
), keepers AS (
  SELECT fingerprint, min(conv) AS keep_conv FROM rolled GROUP BY fingerprint
)
SELECT r.conv, r.fingerprint, (r.conv = k.keep_conv) AS keeper
FROM rolled r JOIN keepers k USING (fingerprint)"""


def conversation_windows(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    text_col: str,
    n_turns: int,
    stride: int | None = None,
    sep: str = "\n",
) -> DataFrame:
    """Sliding context windows over conversation turns — the
    training-example assembly for dialogue models: per conversation,
    windows of `n_turns` consecutive turns starting every `stride`
    turns; the last window is the first reaching the conversation end
    (same rule as chunk_documents, so every turn is covered and no
    window is a subset of an earlier one). Returns (conv, window_idx,
    first_pos, n_window_turns, text): first_pos is the 0-based dense
    POSITION in turn order (robust to turn-index gaps), text the
    window's turn texts joined by `sep` in turn order.

    Scale shape: a per-conversation rank (one hash shuffle; a rank,
    never a whole-conversation collect), then each TURN explodes into
    the <= ceil(n_turns/stride) windows containing it, then ONE
    shuffle keyed by (conv, window_idx) whose groups are bounded by
    n_turns — immune to long-conversation skew end to end."""
    if n_turns <= 0:
        raise ValueError("n_turns must be positive")
    stride = n_turns if stride is None else int(stride)
    if not (0 < stride <= n_turns):
        raise ValueError("stride must be in (0, n_turns]")
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    ranked = df.select(
        F.col(conv_col).alias("conv"),
        F.col(text_col).alias("_t"),
        (F.row_number().over(w) - 1).alias("p"),
        F.count(F.lit(1)).over(Window.partitionBy(conv_col)).alias("n"),
    )
    k_count = F.when(F.col("n") <= n_turns, F.lit(1)).otherwise(
        F.ceil((F.col("n") - F.lit(n_turns)) / F.lit(stride)).cast("long") + 1
    )
    k_lo = F.greatest(
        F.lit(0).cast("long"),
        F.ceil((F.col("p") - F.lit(n_turns) + 1) / F.lit(stride)).cast("long"),
    )
    k_hi = F.least(k_count - 1, F.floor(F.col("p") / stride).cast("long"))
    return (
        ranked.select(
            "conv", "_t", "p",
            F.explode(F.sequence(k_lo, k_hi)).alias("window_idx"),
        )
        .groupBy("conv", "window_idx")
        .agg(
            F.min("p").alias("first_pos"),
            F.count(F.lit(1)).cast("long").alias("n_window_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "_t"))), lambda x: x["_t"]
                ),
                sep,
            ).alias("text"),
        )
        .withColumnRenamed("conv", conv_col)
    )


def conversation_windows_sql(
    table_expr: str,
    conv_col: str,
    turn_col: str,
    text_col: str,
    n_turns: int,
    stride: int | None = None,
    sep: str = "\n",
) -> str:
    """DuckDB twin of conversation_windows (same last-window rule;
    string_agg with an explicit ORDER BY pins turn order)."""
    stride = n_turns if stride is None else int(stride)
    n = int(n_turns)
    return f"""
WITH ranked AS (
  SELECT {conv_col} AS conv, {text_col} AS t,
         (row_number() OVER (PARTITION BY {conv_col} ORDER BY {turn_col}) - 1)::BIGINT AS p,
         count(*) OVER (PARTITION BY {conv_col})::BIGINT AS n
  FROM {table_expr}
), expanded AS (
  SELECT conv, t, p,
         unnest(range(
           greatest(0, ceil((p - {n} + 1)::DOUBLE / {stride})::BIGINT),
           least(CASE WHEN n <= {n} THEN 1
                      ELSE ceil((n - {n})::DOUBLE / {stride})::BIGINT + 1 END,
                 (p // {stride}) + 1)
         )) AS window_idx
  FROM ranked
)
SELECT conv AS {conv_col}, window_idx, min(p)::BIGINT AS first_pos,
       count(*)::BIGINT AS n_window_turns,
       string_agg(t, '{sep}' ORDER BY p) AS text
FROM expanded
GROUP BY conv, window_idx
"""


def response_pairs(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    role_col: str,
    text_col: str,
    prompt_role: str = "user",
    response_role: str = "assistant",
) -> DataFrame:
    """Instruction-tuning pair mining over multi-turn transcripts:
    every (prompt_role turn, IMMEDIATELY-following response_role turn)
    adjacent pair in turn order — the standard SFT extraction (an
    assistant turn answering the user turn right before it; a tool or
    system turn interleaved between them breaks adjacency and drops
    the pair, by design). Returns (conv, pair_idx, prompt_turn,
    response_turn, prompt, response): pair_idx numbers a
    conversation's pairs 0..n-1 in turn order, *_turn carry the
    source turn indexes.

    Adjacency is POSITIONAL (next row in turn order within the
    conversation), robust to turn-index gaps; lead() is partitioned
    by conversation, so the last turn of one conversation never pairs
    with the first of the next.

    Scale shape: ONE hash shuffle partitioned by conversation, then
    two window passes over the same partitioning (lead + the pair
    rank reuse the exchange) — no self-join, no whole-conversation
    collect; a conversation's turns stream through one frame, so
    long-conversation skew is bounded by the longest single
    conversation, same as every per-conv operator here."""
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    led = df.select(
        F.col(conv_col).alias("conv"),
        F.col(turn_col).alias("prompt_turn"),
        F.col(role_col).alias("_r"),
        F.col(text_col).alias("prompt"),
        F.lead(F.col(role_col)).over(w).alias("_nr"),
        F.lead(F.col(turn_col)).over(w).alias("response_turn"),
        F.lead(F.col(text_col)).over(w).alias("response"),
    )
    pairs = led.filter(
        (F.col("_r") == prompt_role) & (F.col("_nr") == response_role)
    )
    wp = Window.partitionBy("conv").orderBy("prompt_turn")
    return pairs.select(
        "conv",
        (F.row_number().over(wp) - 1).cast("long").alias("pair_idx"),
        "prompt_turn",
        "response_turn",
        "prompt",
        "response",
    )


def response_pairs_sql(
    table_expr: str,
    conv_col: str,
    turn_col: str,
    role_col: str,
    text_col: str,
    prompt_role: str = "user",
    response_role: str = "assistant",
) -> str:
    """DuckDB twin of response_pairs (same positional-adjacency and
    per-conversation pair numbering)."""
    return f"""
WITH led AS (
  SELECT {conv_col} AS conv, {turn_col} AS prompt_turn,
         {role_col} AS r, {text_col} AS prompt,
         lead({role_col}) OVER w AS nr,
         lead({turn_col}) OVER w AS response_turn,
         lead({text_col}) OVER w AS response
  FROM {table_expr}
  WINDOW w AS (PARTITION BY {conv_col} ORDER BY {turn_col})
), pairs AS (
  SELECT * FROM led WHERE r = '{prompt_role}' AND nr = '{response_role}'
)
SELECT conv,
       (row_number() OVER (PARTITION BY conv ORDER BY prompt_turn) - 1)::BIGINT AS pair_idx,
       prompt_turn, response_turn, prompt, response
FROM pairs
"""


def sft_examples(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    role_col: str,
    text_col: str,
    response_role: str = "assistant",
    max_context_turns: int = 16,
    sep: str = "\n",
) -> DataFrame:
    """SFT training-example assembly over multi-turn transcripts: one
    example per `response_role` turn — the standard chat-tuning
    extraction where the PRECEDING conversation is the prompt context
    and the assistant turn is the completion (loss is computed on the
    response only; the context/response split IS the loss mask).
    Returns (conv, example_idx, response_turn, n_context_turns,
    context, response): context renders the preceding
    <= max_context_turns turns as 'role: text' joined by `sep` in turn
    order (empty string for a conversation-opening response),
    example_idx numbers a conversation's examples 0..n-1 in turn
    order. A turn whose role or text is NULL contributes nothing to
    context (and is not counted), matching SQL || / string_agg null
    semantics.

    Scale shape: ONE hash shuffle partitioned by conversation, then
    two window passes over the same partitioning (a BOUNDED
    rows-frame collect — state per row is <= max_context_turns
    rendered turns, never the whole conversation — and the example
    rank); no self-join, no whole-conversation collect, so
    long-conversation skew is bounded by max_context_turns, tighter
    than the per-conv operators above."""
    if max_context_turns <= 0:
        raise ValueError("max_context_turns must be positive")
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    ctx_w = w.rowsBetween(-max_context_turns, -1)
    rendered = F.concat(F.col(role_col), F.lit(": "), F.col(text_col))
    led = df.select(
        F.col(conv_col).alias("conv"),
        F.col(turn_col).alias("response_turn"),
        F.col(role_col).alias("_r"),
        F.col(text_col).alias("response"),
        # struct-collect + sort (not bare collect_list order) so the
        # context order is deterministic under any shuffle plan
        F.array_sort(
            F.collect_list(
                F.when(
                    rendered.isNotNull(),
                    F.struct(
                        F.col(turn_col).alias("t"), rendered.alias("s")
                    ),
                )
            ).over(ctx_w)
        ).alias("_ctx"),
    )
    ex = led.filter(F.col("_r") == response_role)
    wp = Window.partitionBy("conv").orderBy("response_turn")
    return ex.select(
        "conv",
        (F.row_number().over(wp) - 1).cast("long").alias("example_idx"),
        "response_turn",
        F.size("_ctx").cast("long").alias("n_context_turns"),
        F.array_join(
            F.transform("_ctx", lambda x: x["s"]), sep
        ).alias("context"),
        "response",
    )


def sft_examples_sql(
    table_expr: str,
    conv_col: str,
    turn_col: str,
    role_col: str,
    text_col: str,
    response_role: str = "assistant",
    max_context_turns: int = 16,
    sep: str = "\n",
) -> str:
    """DuckDB twin of sft_examples (same bounded preceding frame,
    render, null semantics and numbering)."""
    sep_sql = "chr(10)" if sep == "\n" else "'" + sep.replace("'", "''") + "'"
    render = f"{role_col} || ': ' || {text_col}"
    frame = f"ROWS BETWEEN {int(max_context_turns)} PRECEDING AND 1 PRECEDING"
    return f"""
WITH ctx AS (
  SELECT {conv_col} AS conv, {turn_col} AS response_turn,
         {role_col} AS r, {text_col} AS response,
         string_agg({render}, {sep_sql}) OVER (
           PARTITION BY {conv_col} ORDER BY {turn_col} {frame}) AS context,
         count({render}) OVER (
           PARTITION BY {conv_col} ORDER BY {turn_col} {frame}) AS nctx
  FROM {table_expr}
)
SELECT conv,
       (row_number() OVER (PARTITION BY conv ORDER BY response_turn) - 1)::BIGINT AS example_idx,
       response_turn, nctx::BIGINT AS n_context_turns,
       coalesce(context, '') AS context, response
FROM ctx WHERE r = '{response_role}'
"""


# ----------------------------------------------- DSIR data selection
DSIR_SALT = CLF_SALT  # shared hashing-trick domain with the classifier


def _bucket_col(salt: str, n_buckets: int, feat: Column) -> Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.to_binary(F.concat(F.lit(f"{salt}:"), feat), F.lit("utf-8"))),
                1, 8,
            ), 16, 10,
        ).cast("long") % int(n_buckets)
    )


def dsir_bucket_counts(
    df: DataFrame,
    text_col: str,
    n_buckets: int = 4096,
    salt: str = DSIR_SALT,
    bigrams: bool = True,
) -> DataFrame:
    """Hashed bag-of-ngrams corpus model (DSIR, Xie et al. 2023,
    arXiv:2302.03169): (bucket, cnt) over unigram+bigram features
    hashed into n_buckets — the same hashing trick (and salt domain)
    as the quality classifier. One partial+final agg; the model is
    n_buckets rows however large the corpus."""
    feats = df.select(F.explode(classifier_features(text_col, bigrams)).alias("f"))
    return (
        feats.groupBy(_bucket_col(salt, n_buckets, F.col("f")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_weights(
    corpus: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    salt: str = DSIR_SALT,
    bigrams: bool = True,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-doc DSIR log importance weight: log w(x) = sum over hashed
    features of [ln p_target(b) - ln p_raw(b)], with add-alpha
    smoothing p(b) = (cnt_b + alpha) / (total + alpha * n_buckets).
    target_model/raw_model = dsir_bucket_counts outputs (bucket, cnt).
    Returns (id, n_feats, log_w); a doc with zero features gets
    log_w = 0 (weight 1 — no evidence either way).

    Scale shape: the two models join into ONE log-ratio table of
    n_buckets rows that BROADCASTS; the corpus streams through
    feature-hash -> map-side join -> per-doc partial+final sum. The
    corpus is never shuffled except on the doc key."""
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    spark = corpus.sparkSession
    b = int(n_buckets)
    t_total = (target_model.agg(F.sum("cnt")).first()[0]) or 0
    r_total = (raw_model.agg(F.sum("cnt")).first()[0]) or 0
    t = target_model.select("bucket", F.col("cnt").alias("_tc"))
    r = raw_model.select("bucket", F.col("cnt").alias("_rc"))
    ratio = (
        t.join(r, "bucket", "full")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("_tc"), F.lit(0)) + F.lit(float(alpha)))
                    / F.lit(float(t_total) + alpha * b)
                )
                - F.log(
                    (F.coalesce(F.col("_rc"), F.lit(0)) + F.lit(float(alpha)))
                    / F.lit(float(r_total) + alpha * b)
                )
            ).alias("_lr"),
        )
    )
    feats = corpus.select(
        F.col(id_col), F.explode(classifier_features(text_col, bigrams)).alias("f")
    ).select(F.col(id_col), _bucket_col(salt, n_buckets, F.col("f")).alias("bucket"))
    # buckets absent from BOTH models still smooth to a nonzero ratio
    # via the broadcast table's full domain? No — the table only has
    # observed buckets; an unobserved bucket's ratio is
    # ln(alpha/(T_t+aB)) - ln(alpha/(T_r+aB)) = ln((T_r+aB)/(T_t+aB)),
    # a constant — applied via coalesce after the left join.
    import math

    unseen = float(
        math.log(float(r_total) + alpha * b) - math.log(float(t_total) + alpha * b)
    )
    per_doc = (
        feats.join(F.broadcast(ratio), "bucket", "left")
        .select(
            F.col(id_col),
            # float32 quantization before the per-doc float64 sum makes
            # the sum exact and therefore addition-order-independent
            # (Spark partial-agg order vs the SQL twin's order)
            F.coalesce(F.col("_lr"), F.lit(unseen)).cast("float").alias("_lr"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.col("_lr").cast("double")).alias("log_w"),
        )
    )
    return (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce(F.col("log_w"), F.lit(0.0)).alias("log_w"),
        )
    )


def dsir_sample(
    weights: DataFrame,
    id_col: str,
    k: int,
    salt: str = "dsir-g1",
    temperature: float = 1.0,
) -> DataFrame:
    """DSIR's resampling step, deterministic: draw k docs WITHOUT
    replacement with probability proportional to w^(1/temperature)
    via Gumbel top-k (key = log_w/T + Gumbel(u01(salt:id)); the k
    largest keys are exactly a w-weighted sample without replacement).
    The md5-seeded Gumbel makes reruns reproducible — the module's
    deterministic-sampling contract (stratified_sample's md5 pattern).
    One TakeOrdered(k); nothing corpus-sized reaches the driver."""
    if k <= 0:
        raise ValueError("k must be positive")
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    u = _u01(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    # u in [0,1): -ln(-ln(u)) needs u>0; md5 prefix 0 is 2^-32-rare but
    # guard anyway (clamp to the smallest representable step)
    u = F.greatest(u, F.lit(1.0 / float(16 ** 8)))
    key = F.col("log_w") / F.lit(float(temperature)) - F.log(-F.log(u))
    return (
        weights.select(F.col(id_col), "n_feats", "log_w", key.alias("gumbel_key"))
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(int(k))
    )


def dsir_log_weights_sql(
    table: str,
    id_col: str,
    text_col: str,
    target_where: str,
    n_buckets: int = 4096,
    salt: str = DSIR_SALT,
    bigrams: bool = True,
    alpha: float = 1.0,
) -> str:
    """DuckDB twin of dsir_bucket_counts + dsir_log_weights with the
    target corpus defined as `WHERE target_where` over the same table
    (the derived-benchmark pattern) and raw = the whole table."""
    feat_src = f"list_concat(ts, {_shingles_sql(text_col, 2)})" if bigrams else "ts"
    a, b = float(alpha), int(n_buckets)
    toks = (
        f"SELECT {id_col}, list_filter(string_split_regex(lower({text_col}), "
        f"'{_TOKENIZE_SQL}'), t -> t <> '') AS ts FROM {table}"
    )
    return f"""
WITH toks AS ({toks}),
feats AS (
  SELECT {id_col},
         CAST(('0x' || substr(md5('{salt}:' || f), 1, 8)) AS BIGINT) % {b} AS bucket
  FROM (SELECT {id_col}, unnest({feat_src}) AS f FROM toks)
),
tmodel AS (
  SELECT bucket, count(*)::BIGINT AS cnt FROM feats WHERE {target_where} GROUP BY bucket
),
rmodel AS (
  SELECT bucket, count(*)::BIGINT AS cnt FROM feats GROUP BY bucket
),
tot AS (
  SELECT (SELECT coalesce(sum(cnt), 0) FROM tmodel)::DOUBLE AS tt,
         (SELECT coalesce(sum(cnt), 0) FROM rmodel)::DOUBLE AS rt
),
ratio AS (
  SELECT coalesce(t.bucket, r.bucket) AS bucket,
         (ln((coalesce(t.cnt, 0) + {a!r}) / (tot.tt + {a!r} * {b}))
          - ln((coalesce(r.cnt, 0) + {a!r}) / (tot.rt + {a!r} * {b})))::FLOAT AS lr
  FROM tmodel t FULL JOIN rmodel r ON t.bucket = r.bucket CROSS JOIN tot
),
perdoc AS (
  SELECT f.{id_col}, count(*)::BIGINT AS n_feats, sum(ratio.lr::DOUBLE) AS log_w
  FROM feats f JOIN ratio ON ratio.bucket = f.bucket
  GROUP BY f.{id_col}
)
SELECT d.{id_col}, coalesce(p.n_feats, 0)::BIGINT AS n_feats,
       round(coalesce(p.log_w, 0.0), 6) AS log_w
FROM {table} d LEFT JOIN perdoc p USING ({id_col})
"""

def length_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    batch_size: int,
    edges: tuple = (64, 128, 256, 512, 1024, 2048),
    salt: str = "v1",
    num_partitions: int | None = None,
    freeze_dir: str | None = None,
) -> DataFrame:
    """Length-bucketed batching (the dynamic-batching trick every
    large-scale trainer uses to cut padding waste: group sequences of
    similar token length, then batch within the group). Each doc gets

      bucket     = index of the smallest edge >= its analyzer token
                   count (len(edges) = the overflow bucket),
      batch_idx  = its 0-based batch number WITHIN the bucket under a
                   seeded deterministic order (md5(salt||id), id), and
      pos_in_batch = its slot inside that batch,

    so (bucket, batch_idx) enumerates ready-to-pad training batches of
    `batch_size` docs whose lengths differ by at most one edge span.
    Deterministic: partition-invariant, rerun-identical, re-deal the
    batches per epoch by bumping the salt (same contract as
    global_shuffle).

    Scale shape: one dense global rank over the composite key
    (bucket, md5, id) via build.assign_dense_doc_ids — range-partition
    + freeze + footer counts + broadcast offsets, NO per-bucket window
    (a window PARTITION BY bucket would collapse parallelism to
    n_buckets, each a corpus-sized partition). Per-bucket ranks are
    recovered as rank - min(rank within bucket): one tiny n_buckets-row
    aggregate broadcast back. Survives a 100x corpus unchanged.

    Returns (id, n_tokens, bucket, batch_idx, pos_in_batch).
    """
    from .build import assign_dense_doc_ids

    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    if not edges or list(edges) != sorted(set(int(e) for e in edges)):
        raise ValueError("edges must be strictly increasing and non-empty")
    n_tok = F.size(tokens_col(text_col)).cast("long")
    # smallest edge >= n_tokens; past the last edge -> overflow bucket
    bkt = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        bkt = F.when(n_tok <= F.lit(int(edges[i])), F.lit(i)).otherwise(bkt)
    key = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    from ._spread import spread

    # persisted: the rank keys (bucket, md5) derive from the tokenizer,
    # and assign_dense_doc_ids' range SAMPLING pass would otherwise
    # re-run the whole tokenize projection before the freeze write
    # does it again; the cache is released as soon as the freeze is on
    # disk (assign_dense_doc_ids writes it eagerly before returning)
    keyed = spread(df).select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        bkt.cast("int").alias("bucket"),
        key.alias("_lbkey"),
    ).persist()
    try:
        ranked = assign_dense_doc_ids(
            keyed, ["bucket", "_lbkey", id_col],
            num_partitions=num_partitions, freeze_dir=freeze_dir,
        )
    finally:
        keyed.unpersist()
    offsets = ranked.groupBy("bucket").agg(F.min("doc").alias("_off"))
    r = (F.col("doc") - F.col("_off")).cast("long")
    return (
        ranked.join(F.broadcast(offsets), "bucket")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.col("bucket"),
            (r / F.lit(int(batch_size))).cast("long").alias("batch_idx"),
            (r % F.lit(int(batch_size))).cast("long").alias("pos_in_batch"),
        )
    )


def length_buckets_sql(
    table: str,
    id_col: str,
    text_col: str,
    batch_size: int,
    edges: tuple = (64, 128, 256, 512, 1024, 2048),
    salt: str = "v1",
) -> str:
    """DuckDB twin: same bucket edges, ROW_NUMBER per bucket over the
    same (md5, id) order, integer-divided into batches."""
    cases = " ".join(
        f"WHEN n_tokens <= {int(e)} THEN {i}" for i, e in enumerate(edges)
    )
    return f"""
WITH toks AS (
  SELECT {id_col},
         len(list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> ''))::BIGINT
           AS n_tokens
  FROM {table}
),
bkts AS (
  SELECT {id_col}, n_tokens,
         (CASE {cases} ELSE {len(edges)} END)::INT AS bucket
  FROM toks
),
ranked AS (
  SELECT {id_col}, n_tokens, bucket,
         ROW_NUMBER() OVER (
           PARTITION BY bucket
           ORDER BY md5('{salt}:' || {id_col}::VARCHAR) ASC, {id_col} ASC
         ) - 1 AS r
  FROM bkts
)
SELECT {id_col}, n_tokens, bucket,
       (r // {int(batch_size)})::BIGINT AS batch_idx,
       (r % {int(batch_size)})::BIGINT AS pos_in_batch
FROM ranked
"""

def upsample_stratified(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic per-stratum UP/DOWN-sampling with replication —
    the other half of domain mixing (stratified_sample can only drop;
    weighted epochs need rate > 1, e.g. Wikipedia x3.4 in GPT-3's
    mixture table). Each row yields

        n_copies = floor(rate) + (u(id) < frac(rate) ? 1 : 0)

    with u = the module's md5-prefix uniform of (salt || id), so a
    rate of 3.4 gives every row 3 copies and a deterministic 40% of
    rows a 4th — in expectation exactly rate, decided per row as a
    pure function of (id, salt), partition-invariant and
    twin-reproducible. rate <= 1 degenerates to stratified_sample's
    keep rule (0 or 1 copies). Output adds `copy_idx` (0-based) so
    (id, copy_idx) stays a key downstream — feed it through
    global_shuffle on a concatenated key to spread the copies across
    the training order.

    Scale: one map-side explode(sequence(0, n-1)) — no shuffle, no
    RNG state, row expansion bounded by max(rates)."""
    if any(r < 0 for r in rates.values()) or default_rate < 0:
        raise ValueError("rates must be >= 0")
    u = _u01(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    rate = F.lit(float(default_rate))
    for key, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == key, F.lit(float(r))).otherwise(rate)
    n = (F.floor(rate) + F.when(u < rate - F.floor(rate), F.lit(1)).otherwise(F.lit(0))).cast("int")
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )


def upsample_stratified_sql(
    table: str,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "v1",
    select: str = "*",
) -> str:
    """DuckDB twin: same md5 uniform, floor + fractional top-up,
    copies via UNNEST(range(n))."""
    whens = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {float(r)!r}" for k, r in sorted(rates.items())
    )
    return f"""
WITH rated AS (
  SELECT {select},
         (CASE {whens} ELSE {float(default_rate)!r} END) AS __rate,
         (CAST(('0x' || substr(md5('{salt}' || {id_col}::VARCHAR), 1, 8)) AS BIGINT)::DOUBLE
          / {float(16 ** 8)!r}) AS __u
  FROM {table}
),
counted AS (
  SELECT *, (floor(__rate) + CASE WHEN __u < __rate - floor(__rate) THEN 1 ELSE 0 END)::INT AS __n
  FROM rated
)
SELECT * EXCLUDE (__rate, __u, __n, c), c::INT AS copy_idx
FROM counted, UNNEST(range(__n::BIGINT)) AS t(c)
WHERE __n > 0
"""


# ---------------------------------------------------------------------------
# BPE merge training (Sennrich et al. 2016) — the tokenizer-training
# pass of an LLM data pipeline, distributed.
# ---------------------------------------------------------------------------

BPE_EOW = "</w>"  # end-of-word marker symbol (the published convention)


def _bpe_state0(word):
    """Initial BPE state for a word: every character plus the
    end-of-word marker, each wrapped as `[sym]` and concatenated.
    The bracket wrapping makes adjacent-pair rewriting a plain
    string `replace` — `[a][b]` can never match inside another
    symbol because analyzer tokens are [a-z0-9_]+ and the marker
    contains no brackets."""
    chars = F.regexp_extract_all(word, F.lit("."), 0)
    syms = F.concat(chars, F.array(F.lit(BPE_EOW)))
    return F.concat(F.lit("["), F.array_join(syms, "]["), F.lit("]"))


_BPE_TS = r"split(substring(state, 2, length(state) - 2), '\\]\\[')"
# fully-merged words have a single symbol left (no pairs): the
# sequence is floored at one probe and null partners filtered out
_BPE_PAIRS = (
    f"filter(transform(sequence(1, greatest(size({_BPE_TS}) - 1, 1)), "
    f"i -> struct(try_element_at({_BPE_TS}, i) AS a, "
    f"try_element_at({_BPE_TS}, i + 1) AS b)), p -> p.b IS NOT NULL)"
)


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 32,
    min_count: int = 2,
    checkpoint_every: int = 8,
):
    """Learn `n_merges` BPE merges from a corpus (Sennrich et al.
    2016, the byte-pair-encoding tokenizer trainer every modern LLM
    pipeline runs before pre-training).

    Returns `(merges, vocab)`:
    - merges: list of (rank, left, right, freq) in training order —
      the trained tokenizer model (bounded: n_merges rows);
    - vocab: DataFrame (word, cnt, tokens) — every corpus word's
      final segmentation, the apply-side cache.

    Algorithm, distributed shape:
    1. ONE corpus-sized pass: analyzer tokens -> (word, cnt) counts
       (partial+final agg). Everything after runs on the VOCAB table
       (distinct words), orders of magnitude smaller than the corpus —
       the published structure of BPE training at scale.
    2. Per round: adjacent-pair counts (explode + partial+final agg),
       argmax pair via TakeOrdered(1) — ONE driver row per round, the
       bounded-model-state pattern (same class as IVF centroids) with
       a deterministic (freq desc, left asc, right asc) tie-break —
       then ONE whole-stage-codegen string `replace` rewrites every
       word's segmentation. `replace` substitutes non-overlapping
       occurrences left-to-right, exactly greedy BPE pair merging
       (for `aaa` merging (a,a): `[a][a][a]` -> `[aa][a]`).
    3. Lineage is cut every `checkpoint_every` rounds (localCheckpoint)
       so the plan never grows past a bounded depth no matter how many
       merges are requested.

    Early stop: a round whose best pair falls under `min_count` ends
    training (the reference BPE stopping rule). No Python UDFs
    anywhere; every round is two vocab-sized Catalyst jobs."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    from ._spread import spread

    words = (
        spread(df).select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    vocab = words.select("w", "cnt", _bpe_state0(F.col("w")).alias("state"))
    vocab = vocab.persist()
    merges = []
    prev = None
    for r in range(int(n_merges)):
        # this collect materializes `vocab` into its cache; the PARENT
        # round's cache must stay alive until then (unpersisting it
        # before the child materializes forced every round to re-derive
        # the corpus word-count pass — 16 corpus scans for 16 merges)
        top = (
            vocab.select(F.col("cnt"), F.explode(F.expr(_BPE_PAIRS)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").cast("long").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if prev is not None:
            prev.unpersist()
            prev = None
        if not top or int(top[0]["c"]) < int(min_count):
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        merges.append((r, a, b, c))
        nxt = vocab.withColumn(
            "state",
            F.replace(
                F.col("state"),
                F.lit(f"[{a}][{b}]"),
                F.lit(f"[{a}{b}]"),
            ),
        )
        if (r + 1) % int(checkpoint_every) == 0:
            nxt = nxt.localCheckpoint(eager=True)
            vocab.unpersist()
        else:
            nxt = nxt.persist()
            prev = vocab  # unpersist only after nxt materializes
        vocab = nxt
    out_vocab = vocab.select(
        "w", "cnt", F.expr(_BPE_TS).alias("tokens")
    )
    return merges, out_vocab


def apply_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    merges: list | None = None,
) -> DataFrame:
    """Tokenize a corpus with a trained BPE model: (id, tokens) where
    tokens is the document's flattened subword sequence.

    Distributed shape: documents explode to (id, pos, word); words
    join the trained vocab segmentation (the apply-side cache — for a
    corpus the model was trained on this covers every word); unseen
    words fall back to character+marker symbols rewritten by the
    merge list, applied as a chain of the SAME whole-stage-codegen
    `replace` ops training used (merges is bounded — the tokenizer
    model — so the chain depth is the model size, not data size);
    per-doc reassembly is one groupBy(id) with an order-struct
    sort_array — bounded by document length, never corpus-sized."""
    toks = df.select(
        F.col(id_col).alias("id"), F.posexplode(tokens_col(text_col))
    ).withColumnRenamed("col", "w")
    seg = toks.join(vocab.select("w", "tokens"), "w", "left")
    if merges:
        oov = _bpe_state0(F.col("w"))
        for _, a, b, _c in merges:
            oov = F.replace(oov, F.lit(f"[{a}][{b}]"), F.lit(f"[{a}{b}]"))
        seg = seg.withColumn("state", oov).withColumn(
            "tokens", F.coalesce(F.col("tokens"), F.expr(_BPE_TS))
        )
    return (
        seg.groupBy("id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("pos"), F.col("tokens")))
                    ),
                    lambda s: s["tokens"],
                )
            ).alias("tokens")
        )
        .select(F.col("id").alias(id_col), "tokens")
    )


def bpe_merges_sql(table: str, text_col: str, n_merges: int, min_count: int = 2) -> str:
    """DuckDB twin of train_bpe's merge table: rounds unrolled as
    chained CTEs (the perceptron_sql pattern). Each round recomputes
    adjacent-pair counts from the bracket-wrapped state string,
    argmaxes with the same (freq desc, left asc, right asc) tie-break,
    and rewrites via DuckDB's `replace` — which is the same
    non-overlapping left-to-right substitution Spark's replace does,
    so greedy merge semantics match by construction."""
    ts = "string_split(state[2:-2], '][')"
    ctes = [f"""w0 AS (
  SELECT w, count(*)::BIGINT AS cnt
  FROM (
    SELECT unnest(list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '')) AS w
    FROM {table}
  ) GROUP BY w
), seg0 AS MATERIALIZED (
  SELECT cnt, '[' || array_to_string(list_append(regexp_extract_all(w, '.'), '{BPE_EOW}'), '][') || ']' AS state
  FROM w0
)"""]
    for r in range(int(n_merges)):
        ctes.append(f"""p{r} AS MATERIALIZED (
  SELECT ts[i] AS a, ts[i + 1] AS b, sum(cnt)::BIGINT AS c
  FROM (SELECT cnt, {ts} AS ts FROM seg{r}),
       UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
  GROUP BY ts[i], ts[i + 1]
), top{r} AS MATERIALIZED (
  SELECT {r} AS rank, a, b, c FROM p{r}
  WHERE c >= {int(min_count)}
  ORDER BY c DESC, a ASC, b ASC LIMIT 1
), seg{r + 1} AS MATERIALIZED (
  SELECT cnt,
         CASE WHEN t.a IS NOT NULL
              THEN replace(state, '[' || t.a || '][' || t.b || ']', '[' || t.a || t.b || ']')
              ELSE state END AS state
  FROM seg{r} LEFT JOIN top{r} t ON TRUE
)""")
    union = " UNION ALL ".join(f"SELECT * FROM top{r}" for r in range(int(n_merges)))
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT rank::BIGINT AS rank, a AS left_sym, b AS right_sym, c AS freq
FROM ({union}) ORDER BY rank ASC
"""
    )


def clean_c4(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terminal_puncts: tuple[str, ...] = (".", "!", "?", '"'),
    min_words: int = 3,
    min_lines: int = 5,
    banned_line_words: tuple[str, ...] = ("javascript",),
    banned_page_substrings: tuple[str, ...] = ("lorem ipsum", "{"),
) -> DataFrame:
    """C4-style line-level page cleaning (Raffel et al. 2020 §2.2, the
    public `c4_utils.py` rules): keep a LINE iff it ends in a terminal
    punctuation mark, has >= `min_words` whitespace words, and does not
    contain any `banned_line_words` substring (case-insensitive — the
    paper's "Javascript" rule); drop a PAGE entirely iff it contains
    any `banned_page_substrings` (the "lorem ipsum" / curly-brace code
    heuristics) or fewer than `min_lines` lines survive (the >=5
    sentences rule, with kept lines standing in for sentences).
    Returns one row per surviving page:
    (id, clean_text, n_lines_kept, n_lines_total).

    Scale shape: pure Catalyst higher-order array ops (split ->
    per-line filter -> array_join) in whole-stage codegen — zero
    shuffles, zero Python, embarrassingly parallel at any corpus
    size; the oracle twin is clean_c4_sql."""
    if min_words < 1 or min_lines < 1:
        raise ValueError("min_words and min_lines must be >= 1")
    if not terminal_puncts:
        raise ValueError("terminal_puncts must be non-empty")
    puncts = [str(p) for p in terminal_puncts]

    def keep(l: Column) -> Column:
        words = F.filter(F.split(l, r"\s+"), lambda w: w != F.lit(""))
        cond = (F.size(words) >= int(min_words)) & F.substring(l, -1, 1).isin(puncts)
        for bw in banned_line_words:
            cond = cond & ~F.lower(l).contains(bw.lower())
        return cond

    lines = F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l))
    kept = F.filter(lines, keep)
    page_ok = F.size(kept) >= int(min_lines)
    for ps in banned_page_substrings:
        page_ok = page_ok & ~F.lower(F.col(text_col)).contains(ps.lower())
    from ._spread import spread

    return (
        spread(df).select(
            F.col(id_col),
            F.col(text_col),
            kept.alias("_kept"),
            lines.alias("_lines"),
        )
        .where(page_ok)
        .select(
            F.col(id_col),
            F.array_join("_kept", "\n").alias("clean_text"),
            F.size("_kept").cast("long").alias("n_lines_kept"),
            F.size("_lines").cast("long").alias("n_lines_total"),
        )
    )


def clean_c4_sql(
    table: str,
    id_col: str,
    text_col: str,
    terminal_puncts: tuple[str, ...] = (".", "!", "?", '"'),
    min_words: int = 3,
    min_lines: int = 5,
    banned_line_words: tuple[str, ...] = ("javascript",),
    banned_page_substrings: tuple[str, ...] = ("lorem ipsum", "{"),
) -> str:
    """DuckDB twin of clean_c4 — same trim, same word split, same
    terminal-punct set, same substring bans, same page gates."""
    plist = ", ".join("'" + p.replace("'", "''") + "'" for p in terminal_puncts)
    line_bans = "".join(
        f" AND NOT contains(lower(l), '{bw.lower()}')" for bw in banned_line_words
    )
    page_bans = "".join(
        f" AND NOT contains(lower({text_col}), '{ps.lower()}')"
        for ps in banned_page_substrings
    )
    return f"""
WITH L AS (
  SELECT {id_col}, {text_col},
         list_transform(string_split({text_col}, chr(10)), l -> trim(l)) AS ls
  FROM {table}
), K AS (
  SELECT {id_col}, {text_col}, ls,
         list_filter(ls, l ->
           len(list_filter(string_split_regex(l, '\\s+'), w -> w <> '')) >= {int(min_words)}
           AND substr(l, length(l), 1) IN ({plist}){line_bans}) AS ks
  FROM L
)
SELECT {id_col},
       array_to_string(ks, chr(10)) AS clean_text,
       len(ks)::BIGINT AS n_lines_kept,
       len(ls)::BIGINT AS n_lines_total
FROM K
WHERE len(ks) >= {int(min_lines)}{page_bans}
"""


# ------------------------------------------------ fill-in-the-middle
FIM_SALT = "fim-v1"


def fim_transform(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rate: float = 0.9,
    salt: str = FIM_SALT,
    mode: str = "psm",
    sentinels: tuple[str, str, str] = ("<PRE>", "<SUF>", "<MID>"),
) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al. 2022,
    arXiv:2207.14255 — the FIM pass every code/infilling LLM pipeline
    runs): with probability `rate` a document is split at two
    character positions drawn uniformly over [0, len], and re-rendered
    with sentinel tokens so the model learns to infill:

      psm:  <PRE> prefix <SUF> suffix <MID> middle   (the paper's PSM)
      spm:  <SUF> suffix <PRE> prefix <MID> middle   (the SPM variant)

    The paper draws the decision and both split points from an RNG; a
    distributed engine needs partition-invariant, rerun-identical
    draws, so all three come from the module's md5-prefix uniform:
    decide = u(salt:d:id) < rate, and the two cuts are
    floor(u(salt:a:id) * (L+1)) and floor(u(salt:b:id) * (L+1))
    ordered — a pure function of (salt, id), exactly reproducible by
    the SQL twin (fim_sql) and stable across runs, partitionings, and
    cluster sizes. Untransformed rows (decide false, or NULL text)
    keep rendered = text with NULL parts, the paper's joint
    FIM-rate mixture.

    Pure Catalyst map-only pass — md5, substring and concat in
    whole-stage codegen; no shuffle, no RNG state, no UDF. At 100 TB
    this pipelines with the pack_sequences/global_shuffle stages at
    scan speed."""
    if not (0.0 <= float(rate) <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if mode not in ("psm", "spm"):
        raise ValueError(f"mode must be 'psm' or 'spm', got {mode!r}")
    pre_s, suf_s, mid_s = sentinels
    sid = F.col(id_col).cast("string")
    text = F.col(text_col)
    decide = _u01(F.concat(F.lit(salt + ":d:"), sid)) < F.lit(float(rate))
    u1 = _u01(F.concat(F.lit(salt + ":a:"), sid))
    u2 = _u01(F.concat(F.lit(salt + ":b:"), sid))
    length = F.length(text).cast("double")
    p1 = F.floor(F.least(u1, u2) * (length + F.lit(1.0))).cast("int")
    p2 = F.floor(F.greatest(u1, u2) * (length + F.lit(1.0))).cast("int")
    fim = decide & text.isNotNull()
    prefix = F.substring(text, F.lit(1), p1)
    middle = F.substring(text, p1 + F.lit(1), p2 - p1)
    suffix = F.substring(text, p2 + F.lit(1), F.length(text))
    if mode == "psm":
        rendered = F.concat(
            F.lit(pre_s), prefix, F.lit(suf_s), suffix, F.lit(mid_s), middle
        )
    else:  # spm
        rendered = F.concat(
            F.lit(suf_s), suffix, F.lit(pre_s), prefix, F.lit(mid_s), middle
        )
    from ._spread import spread

    return spread(df).select(
        F.col(id_col),
        fim.alias("fim"),
        F.when(fim, prefix).alias("fim_prefix"),
        F.when(fim, middle).alias("fim_middle"),
        F.when(fim, suffix).alias("fim_suffix"),
        F.when(fim, rendered).otherwise(text).alias("rendered"),
    )


def fim_sql(
    table: str,
    id_col: str,
    text_col: str,
    rate: float = 0.9,
    salt: str = FIM_SALT,
    mode: str = "psm",
    sentinels: tuple[str, str, str] = ("<PRE>", "<SUF>", "<MID>"),
) -> str:
    """DuckDB twin of fim_transform — same md5-prefix uniforms, same
    floor((L+1)*u) cut arithmetic, same substring splits, same
    sentinel rendering, byte-identical output."""
    if mode not in ("psm", "spm"):
        raise ValueError(f"mode must be 'psm' or 'spm', got {mode!r}")
    pre_s, suf_s, mid_s = (s.replace("'", "''") for s in sentinels)

    def u(tag: str) -> str:
        return (
            f"(CAST(('0x' || substr(md5('{salt}:{tag}:' || {id_col}::VARCHAR), 1, 8)) AS BIGINT)::DOUBLE"
            f" / {float(16 ** 8)!r})"
        )

    order = (
        f"'{pre_s}' || pfx || '{suf_s}' || sfx || '{mid_s}' || mid"
        if mode == "psm"
        else f"'{suf_s}' || sfx || '{pre_s}' || pfx || '{mid_s}' || mid"
    )
    return f"""
WITH C AS (
  SELECT {id_col}, {text_col} AS t,
         ({u('d')} < {float(rate)!r} AND {text_col} IS NOT NULL) AS fim,
         CAST(floor(least({u('a')}, {u('b')}) * (length({text_col})::DOUBLE + 1.0)) AS INT) AS p1,
         CAST(floor(greatest({u('a')}, {u('b')}) * (length({text_col})::DOUBLE + 1.0)) AS INT) AS p2
  FROM {table}
), S AS (
  SELECT {id_col}, t, fim,
         substr(t, 1, p1) AS pfx,
         substr(t, p1 + 1, p2 - p1) AS mid,
         substr(t, p2 + 1, length(t)) AS sfx
  FROM C
)
SELECT {id_col},
       fim,
       CASE WHEN fim THEN pfx END AS fim_prefix,
       CASE WHEN fim THEN mid END AS fim_middle,
       CASE WHEN fim THEN sfx END AS fim_suffix,
       CASE WHEN fim THEN {order} ELSE t END AS rendered
FROM S
"""


# ------------------------------------------------ T5 span corruption
T5_SALT = "t5-v1"


def _span_params(noise_density: float, mean_span_len: float):
    if not (0.0 < float(noise_density) < 1.0):
        raise ValueError(f"noise_density must be in (0, 1), got {noise_density}")
    if float(mean_span_len) < 1.0:
        raise ValueError(f"mean_span_len must be >= 1, got {mean_span_len}")
    p_start = float(noise_density) / float(mean_span_len)
    max_len = int(2 * float(mean_span_len) - 1)  # uniform 1..2m-1, mean m
    return p_start, max(1, max_len)


def span_corruption(
    df: DataFrame,
    id_col: str,
    text_col: str,
    noise_density: float = 0.15,
    mean_span_len: float = 3.0,
    salt: str = T5_SALT,
) -> DataFrame:
    """T5/UL2 span-corruption denoising objective (Raffel et al. 2020
    §3.1.4): corrupt ~noise_density of the tokens in spans of mean
    length mean_span_len, replace each corrupted span with a sentinel
    ``<extra_id_k>`` in the input, and emit the target as the sentinel-
    prefixed spans plus a final terminator sentinel — the (input,
    target) pair every T5-family model pre-trains on.

    The paper segments tokens with an RNG; the distributed re-shape
    draws everything from md5-prefix uniforms of (salt, id, position):
    token i STARTS a span iff u(salt:s:id:i) < density/mean, its
    length is 1 + floor(u(salt:l:id:i) * (2*mean-1)) (uniform mean
    `mean_span_len`), and overlapping/adjacent spans merge (so
    realized span count can be below the draw count, as in the
    paper's greedy segmentation). Partition-invariant, rerun-
    identical, byte-reproducible by the SQL twin (span_corruption_sql).

    Pure Catalyst map-only pass: tokens + all span logic are
    higher-order array ops (transform/filter/exists) in whole-stage
    codegen — zero shuffles, no UDF, no RNG state. Coverage tests per
    position scan a bounded (2*mean-1) window, so work is ~linear in
    doc length; the sentinel-numbering walk is quadratic in the
    (small) realized span count only. Run after chunk_documents for
    pathologically long docs — the usual pipeline order anyway.

    Returns (id, n_tokens, n_noise, n_spans, input_text, target_text);
    NULL/empty text yields n_tokens=0, empty input, and the bare
    terminator target (``<extra_id_0>``)."""
    p_start, max_len = _span_params(noise_density, mean_span_len)
    sid = F.col(id_col).cast("string")

    def u(tag: str, i):
        return _u01(F.concat(F.lit(salt + ":" + tag + ":"), sid, F.lit(":"), i.cast("string")))

    ts = F.coalesce(tokens_col(text_col), F.array().cast("array<string>"))
    n = F.size(ts)
    pos = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    from ._spread import spread

    df = spread(df)
    df = df.select(F.col(id_col), ts.alias("__ts"), pos.alias("__pos"))
    starts = F.transform(F.col("__pos"), lambda i: u("s", i) < F.lit(p_start))
    lens = F.transform(
        F.col("__pos"),
        lambda i: (F.lit(1) + F.floor(u("l", i) * F.lit(float(max_len)))).cast("int"),
    )
    df = df.withColumn("__st", starts).withColumn("__ln", lens)
    win = max_len - 1
    covered = F.transform(
        F.col("__pos"),
        lambda j: F.exists(
            F.sequence(F.greatest(j - F.lit(win), F.lit(0)), j),
            lambda i: F.element_at(F.col("__st"), i + 1)
            & (i + F.element_at(F.col("__ln"), i + 1) > j),
        ),
    )
    df = df.withColumn("__cov", covered)
    island = F.transform(
        F.col("__pos"),
        lambda j: F.element_at(F.col("__cov"), j + 1)
        & F.when(j == 0, F.lit(True)).otherwise(~F.element_at(F.col("__cov"), j)),
    )
    df = df.withColumn("__isl", island)
    df = df.withColumn(
        "__ipos", F.filter(F.col("__pos"), lambda j: F.element_at(F.col("__isl"), j + 1))
    )

    def sentinel(k):
        return F.concat(F.lit("<extra_id_"), k.cast("string"), F.lit(">"))

    def kof(j):
        return F.array_position(F.col("__ipos"), j) - 1

    inp = F.array_join(
        F.filter(
            F.transform(
                F.col("__pos"),
                lambda j: F.when(
                    F.element_at(F.col("__isl"), j + 1), sentinel(kof(j))
                ).when(
                    ~F.element_at(F.col("__cov"), j + 1),
                    F.element_at(F.col("__ts"), j + 1),
                ),
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    tgt_pieces = F.filter(
        F.transform(
            F.col("__pos"),
            lambda j: F.when(
                F.element_at(F.col("__isl"), j + 1),
                F.concat(sentinel(kof(j)), F.lit(" "), F.element_at(F.col("__ts"), j + 1)),
            ).when(
                F.element_at(F.col("__cov"), j + 1), F.element_at(F.col("__ts"), j + 1)
            ),
        ),
        lambda x: x.isNotNull(),
    )
    n_spans = F.size("__ipos")
    return df.select(
        F.col(id_col),
        F.size("__ts").cast("long").alias("n_tokens"),
        F.size(F.filter(F.col("__cov"), lambda x: x)).cast("long").alias("n_noise"),
        n_spans.cast("long").alias("n_spans"),
        inp.alias("input_text"),
        F.array_join(
            F.concat(tgt_pieces, F.array(sentinel(n_spans))), " "
        ).alias("target_text"),
    )


def span_corruption_sql(
    table: str,
    id_col: str,
    text_col: str,
    noise_density: float = 0.15,
    mean_span_len: float = 3.0,
    salt: str = T5_SALT,
) -> str:
    """DuckDB twin of span_corruption — same tokenizer, same md5
    uniforms, same bounded-window coverage, same island merge and
    sentinel numbering, byte-identical (input_text, target_text)."""
    p_start, max_len = _span_params(noise_density, mean_span_len)
    win = max_len - 1

    def u(tag: str, i: str) -> str:
        return (
            f"(CAST(('0x' || substr(md5('{salt}:{tag}:' || {id_col}::VARCHAR || ':' || {i}::VARCHAR), 1, 8)) AS BIGINT)::DOUBLE"
            f" / {float(16 ** 8)!r})"
        )

    return f"""
WITH sc_t AS (
  SELECT {id_col},
         coalesce(list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> ''), []) AS ts
  FROM {table}
), sc_p AS (
  SELECT {id_col}, ts, range(0, len(ts)) AS pos,
         list_transform(range(0, len(ts)), i -> {u('s', 'i')} < {float(p_start)!r}) AS st,
         list_transform(range(0, len(ts)), i -> CAST(1 + floor({u('l', 'i')} * {float(max_len)!r}) AS INT)) AS ln
  FROM sc_t
), sc_c AS (
  SELECT {id_col}, ts, pos, st, ln,
         list_transform(pos, j -> len(list_filter(range(greatest(j - {win}, 0), j + 1),
                                                  i -> st[i + 1] AND i + ln[i + 1] > j)) > 0) AS cov
  FROM sc_p
), sc_i AS (
  SELECT {id_col}, ts, pos, cov,
         list_transform(pos, j -> cov[j + 1] AND (CASE WHEN j = 0 THEN true ELSE NOT cov[j] END)) AS isl
  FROM sc_c
), sc_k AS (
  SELECT {id_col}, ts, pos, cov, isl,
         list_filter(pos, j -> isl[j + 1]) AS ipos
  FROM sc_i
)
SELECT {id_col},
       len(ts)::BIGINT AS n_tokens,
       len(list_filter(cov, x -> x))::BIGINT AS n_noise,
       len(ipos)::BIGINT AS n_spans,
       coalesce(array_to_string(list_filter(list_transform(pos, j ->
         CASE WHEN isl[j + 1] THEN '<extra_id_' || (list_position(ipos, j) - 1)::VARCHAR || '>'
              WHEN NOT cov[j + 1] THEN ts[j + 1] END), x -> x IS NOT NULL), ' '), '') AS input_text,
       array_to_string(list_concat(
         list_filter(list_transform(pos, j ->
           CASE WHEN isl[j + 1] THEN '<extra_id_' || (list_position(ipos, j) - 1)::VARCHAR || '>' || ' ' || ts[j + 1]
                WHEN cov[j + 1] THEN ts[j + 1] END), x -> x IS NOT NULL),
         ['<extra_id_' || len(ipos)::VARCHAR || '>']), ' ') AS target_text
FROM sc_k
"""


# ------------------------------------------------ BERT-style MLM masking
MLM_SALT = "mlm-v1"


def mlm_mask(
    df: DataFrame,
    id_col: str,
    text_col: str,
    mask_rate: float = 0.15,
    keep_frac: float = 0.1,
    random_frac: float = 0.1,
    salt: str = MLM_SALT,
    mask_token: str = "[MASK]",
) -> DataFrame:
    """BERT masked-LM example assembly (Devlin et al. 2018 §3.1, the
    80/10/10 rule): select ~mask_rate of the tokens; of the selected,
    replace 80% with ``[MASK]``, keep 10% unchanged, and swap 10% for
    a random token — emitting the masked input beside the label
    positions/tokens the loss is computed on.

    BERT draws all of this from an RNG over a WordPiece vocab; the
    distributed re-shape draws from md5-prefix uniforms of (salt, id,
    position) — select iff u(salt:m:·) < mask_rate, branch on
    u(salt:b:·) (< keep_frac keep, < keep+random swap, else mask) —
    and the "random token" is drawn from the document's OWN token
    list (index floor(u(salt:r:·) * n)), keeping the pass map-only
    and byte-reproducible where a vocab draw would need a broadcast
    dictionary; the swap distribution still follows the corpus
    unigram mix in aggregate. Partition-invariant, rerun-identical,
    exactly reproducible by mlm_mask_sql.

    Pure Catalyst higher-order array ops in whole-stage codegen —
    zero shuffles, no UDF, no RNG state. Returns (id, n_tokens,
    n_masked, input_text, label_positions:array<int>,
    label_tokens:array<string>)."""
    if not (0.0 < float(mask_rate) < 1.0):
        raise ValueError(f"mask_rate must be in (0, 1), got {mask_rate}")
    if float(keep_frac) < 0 or float(random_frac) < 0 or float(keep_frac) + float(random_frac) > 1.0:
        raise ValueError("keep_frac/random_frac must be >= 0 and sum <= 1")
    sid = F.col(id_col).cast("string")

    def u(tag: str, i):
        return _u01(
            F.concat(F.lit(salt + ":" + tag + ":"), sid, F.lit(":"), i.cast("string"))
        )

    ts = F.coalesce(tokens_col(text_col), F.array().cast("array<string>"))
    n = F.size(ts)
    pos = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    from ._spread import spread

    df = spread(df)
    df = df.select(F.col(id_col), ts.alias("__ts"), pos.alias("__pos"))
    nn = F.size("__ts")
    sel = F.transform(F.col("__pos"), lambda i: u("m", i) < F.lit(float(mask_rate)))
    df = df.withColumn("__sel", sel)
    kf, rf = float(keep_frac), float(random_frac)
    rendered = F.transform(
        F.col("__pos"),
        lambda i: F.when(
            ~F.element_at(F.col("__sel"), i + 1), F.element_at(F.col("__ts"), i + 1)
        ).otherwise(
            F.when(u("b", i) < F.lit(kf), F.element_at(F.col("__ts"), i + 1))
            .when(
                u("b", i) < F.lit(kf + rf),
                F.element_at(
                    F.col("__ts"), F.floor(u("r", i) * nn.cast("double")).cast("int") + 1
                ),
            )
            .otherwise(F.lit(mask_token))
        ),
    )
    return df.select(
        F.col(id_col),
        nn.cast("long").alias("n_tokens"),
        F.size(F.filter(F.col("__sel"), lambda x: x)).cast("long").alias("n_masked"),
        F.array_join(rendered, " ").alias("input_text"),
        F.filter(
            F.col("__pos"), lambda i: F.element_at(F.col("__sel"), i + 1)
        ).alias("label_positions"),
        F.filter(
            F.transform(
                F.col("__pos"),
                lambda i: F.when(
                    F.element_at(F.col("__sel"), i + 1),
                    F.element_at(F.col("__ts"), i + 1),
                ),
            ),
            lambda x: x.isNotNull(),
        ).alias("label_tokens"),
    )


def mlm_mask_sql(
    table: str,
    id_col: str,
    text_col: str,
    mask_rate: float = 0.15,
    keep_frac: float = 0.1,
    random_frac: float = 0.1,
    salt: str = MLM_SALT,
    mask_token: str = "[MASK]",
) -> str:
    """DuckDB twin of mlm_mask — same md5 uniforms, same 80/10/10
    branch, same self-vocab random draw, byte-identical output."""
    if not (0.0 < float(mask_rate) < 1.0):
        raise ValueError(f"mask_rate must be in (0, 1), got {mask_rate}")
    kf, rf = float(keep_frac), float(random_frac)
    mt = mask_token.replace("'", "''")

    def u(tag: str, i: str) -> str:
        return (
            f"(CAST(('0x' || substr(md5('{salt}:{tag}:' || {id_col}::VARCHAR || ':' || {i}::VARCHAR), 1, 8)) AS BIGINT)::DOUBLE"
            f" / {float(16 ** 8)!r})"
        )

    return f"""
WITH mlm_t AS (
  SELECT {id_col},
         coalesce(list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> ''), []) AS ts
  FROM {table}
), mlm_s AS (
  SELECT {id_col}, ts, range(0, len(ts)) AS pos,
         list_transform(range(0, len(ts)), i -> {u('m', 'i')} < {float(mask_rate)!r}) AS sel
  FROM mlm_t
)
SELECT {id_col},
       len(ts)::BIGINT AS n_tokens,
       len(list_filter(sel, x -> x))::BIGINT AS n_masked,
       coalesce(array_to_string(list_transform(pos, i ->
         CASE WHEN NOT sel[i + 1] THEN ts[i + 1]
              WHEN {u('b', 'i')} < {kf!r} THEN ts[i + 1]
              WHEN {u('b', 'i')} < {kf + rf!r} THEN ts[CAST(floor({u('r', 'i')} * len(ts)::DOUBLE) AS INT) + 1]
              ELSE '{mt}' END), ' '), '') AS input_text,
       list_filter(pos, i -> sel[i + 1]) AS label_positions,
       list_filter(list_transform(pos, i -> CASE WHEN sel[i + 1] THEN ts[i + 1] END),
                   x -> x IS NOT NULL) AS label_tokens
FROM mlm_s
"""


# ------------------------------------------------ RLHF preference pairs
PREF_SALT = "pref-v1"


def preference_pairs(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    role_col: str,
    text_col: str,
    prompt_role: str = "user",
    response_role: str = "assistant",
    salt: str = PREF_SALT,
) -> DataFrame:
    """Reward-model / contrastive training-pair assembly over
    transcripts: every mined (prompt, response) pair becomes
    (prompt, chosen, rejected) where chosen is the conversation's
    real response and rejected is a DETERMINISTICALLY sampled
    response from a different conversation — the mismatched-context
    negative construction used to pretrain reward models and
    response-ranking retrievers before human preference labels
    exist (InstructGPT's comparison-data bootstrap shape).

    Negative sampling is the seeded-permutation successor: pairs are
    ranked by the global_shuffle dense rank under md5(salt || pid)
    (pid = conv:pair_idx), and each pair's rejected response comes
    from the NEXT pair in that order (cyclic — the max-rank pair
    wraps to rank 0 via a one-row broadcast, no count job). Pairs
    whose successor lands in the SAME conversation are dropped (a
    same-dialogue "negative" is not a negative); expected loss is
    ~1/n_convs of pairs. Re-draw with a new salt.

    Scale shape: the pair mining is response_pairs (one
    conv-partitioned shuffle); the rank is the windowless dense-rank
    scan (range-partition + footer counts, no global window); the
    negative hookup is ONE uniform equi-join on rank+1. No self-join
    on conversation, no skew (md5 ranks are uniform by
    construction), rerun/partitioning-invariant end to end."""
    import os as _os
    import uuid as _uuid

    pairs = response_pairs(
        df, conv_col, turn_col, role_col, text_col, prompt_role, response_role
    )
    keyed = pairs.withColumn(
        "_pid",
        F.concat(
            F.col("conv").cast("string"), F.lit(":"), F.col("pair_idx").cast("string")
        ),
    )
    ranks = global_shuffle(keyed.select("_pid"), "_pid", salt=salt)
    # FREEZE the ranked pairs once: the successor join reads this
    # relation from both sides (and the old isNull/wrap split read it
    # five times, re-running the pair mining + shuffle rank pipeline
    # per reference); the pair count for the cyclic wrap comes from
    # the parquet footers — no count job.
    spark = df.sparkSession
    freeze = _os.path.join("/tmp", "sparklucene-pref-" + _uuid.uuid4().hex[:12])
    keyed.join(ranks, "_pid").write.mode("errorifexists").parquet(freeze)
    frozen = spark.read.parquet(freeze)
    import pyarrow.parquet as _pq

    n_pairs = 0
    for name in _os.listdir(freeze):
        if name.endswith(".parquet"):
            n_pairs += _pq.read_metadata(_os.path.join(freeze, name)).num_rows
    cand = frozen.select(
        F.col("shuffle_rank").alias("_nrank"),
        F.col("conv").alias("_nconv"),
        F.col("response").alias("rejected"),
    )
    # successor = (rank + 1) mod n — ONE uniform inner equi-join covers
    # the wrap row too (rank n-1 -> rank 0), replacing the left join +
    # null-split + broadcast-wrap union that evaluated the pair
    # pipeline once per branch
    out = frozen.join(
        cand,
        F.pmod(frozen["shuffle_rank"] + F.lit(1), F.lit(max(n_pairs, 1)))
        == cand["_nrank"],
    )
    return (
        out.filter(F.col("conv") != F.col("_nconv"))
        .select(
            "conv",
            "pair_idx",
            "prompt_turn",
            "prompt",
            F.col("response").alias("chosen"),
            "rejected",
        )
    )


def preference_pairs_sql(
    table_expr: str,
    conv_col: str,
    turn_col: str,
    role_col: str,
    text_col: str,
    prompt_role: str = "user",
    response_role: str = "assistant",
    salt: str = PREF_SALT,
) -> str:
    """DuckDB twin of preference_pairs — same pair mining, same
    md5-rank permutation ((rank+1) mod n successor = the engine's
    cyclic wrap), same same-conversation drop."""
    inner = response_pairs_sql(
        table_expr, conv_col, turn_col, role_col, text_col, prompt_role, response_role
    )
    return f"""
WITH pref_pp AS ({inner}),
pref_k AS (
  SELECT *, conv::VARCHAR || ':' || pair_idx::VARCHAR AS pid FROM pref_pp
),
pref_r AS (
  SELECT *,
         (ROW_NUMBER() OVER (ORDER BY md5('{salt}:' || pid) ASC, pid ASC) - 1)::BIGINT AS rnk,
         count(*) OVER () AS n
  FROM pref_k
)
SELECT a.conv, a.pair_idx, a.prompt_turn, a.prompt,
       a.response AS chosen, b.response AS rejected
FROM pref_r a JOIN pref_r b ON b.rnk = (a.rnk + 1) % a.n
WHERE a.conv <> b.conv
"""


# ------------------------------------------------ UL2 mixture-of-denoisers
UL2_SALT = "ul2-v1"


def ul2_mixture(
    df: DataFrame,
    id_col: str,
    text_col: str,
    r_frac: float = 0.4,
    x_frac: float = 0.4,
    salt: str = UL2_SALT,
) -> DataFrame:
    """UL2 mixture-of-denoisers (Tay et al. 2022): every document is
    routed to ONE denoising objective and re-rendered with its
    paradigm tag —

      [R] regular span corruption  (density .15, mean span 3)
      [X] extreme span corruption  (density .5,  mean span 8)
      [S] sequential / prefix-LM   (one cut; input = prefix,
                                    target = suffix)

    UL2 samples the objective per example with an RNG; the
    distributed re-shape routes by the md5-prefix uniform
    u(salt:o:id) < r_frac -> R, < r_frac+x_frac -> X, else S, so the
    mixture is partition-invariant, rerun-identical, and exactly
    reproducible by the SQL twin. The S cut point reuses the FIM
    draw machinery (u(salt:p:id) over token count). Returns (id,
    denoiser, input_text, target_text) with the paradigm tag
    prepended to input_text, the paper's format.

    Plan shape: three filtered map-only branches (each doc computes
    ONLY its routed objective) unioned — still zero shuffles, no
    UDF; the R/X branches are span_corruption, S is a token-slice
    split, all whole-stage codegen."""
    if not (0.0 <= float(r_frac) and 0.0 <= float(x_frac) and r_frac + x_frac <= 1.0):
        raise ValueError("r_frac/x_frac must be >= 0 and sum <= 1")
    sid = F.col(id_col).cast("string")
    u_route = _u01(F.concat(F.lit(salt + ":o:"), sid))
    from ._spread import spread

    df = spread(df)
    routed = df.withColumn("__route", u_route)
    r_df = routed.filter(F.col("__route") < float(r_frac))
    x_df = routed.filter(
        (F.col("__route") >= float(r_frac)) & (F.col("__route") < float(r_frac) + float(x_frac))
    )
    s_df = routed.filter(F.col("__route") >= float(r_frac) + float(x_frac))

    def tag(branch, d):
        return branch.select(
            F.col(id_col),
            F.lit(d).alias("denoiser"),
            F.concat(F.lit(f"[{d}] "), F.col("input_text")).alias("input_text"),
            F.col("target_text"),
        )

    r_out = tag(
        span_corruption(r_df, id_col, text_col, 0.15, 3.0, salt + ":r"), "R"
    )
    x_out = tag(
        span_corruption(x_df, id_col, text_col, 0.5, 8.0, salt + ":x"), "X"
    )
    ts = F.coalesce(tokens_col(text_col), F.array().cast("array<string>"))
    u_cut = _u01(F.concat(F.lit(salt + ":p:"), sid))
    n = F.size(ts)
    p = F.floor(u_cut * (n.cast("double") + F.lit(1.0))).cast("int")
    s_out = s_df.select(
        F.col(id_col),
        F.lit("S").alias("denoiser"),
        F.concat(
            F.lit("[S] "), F.array_join(F.slice(ts, 1, p), " ")
        ).alias("input_text"),
        F.array_join(
            F.when(p < n, F.slice(ts, p + 1, n - p)).otherwise(
                F.array().cast("array<string>")
            ),
            " ",
        ).alias("target_text"),
    )
    return r_out.unionByName(x_out).unionByName(s_out)


def ul2_mixture_sql(
    table: str,
    id_col: str,
    text_col: str,
    r_frac: float = 0.4,
    x_frac: float = 0.4,
    salt: str = UL2_SALT,
) -> str:
    """DuckDB twin of ul2_mixture — same md5 route, the two
    span_corruption twins on the routed slices, same S-cut slice."""
    if not (0.0 <= float(r_frac) and 0.0 <= float(x_frac) and r_frac + x_frac <= 1.0):
        raise ValueError("r_frac/x_frac must be >= 0 and sum <= 1")

    def u(tag: str) -> str:
        return (
            f"(CAST(('0x' || substr(md5('{salt}:{tag}:' || {id_col}::VARCHAR), 1, 8)) AS BIGINT)::DOUBLE"
            f" / {float(16 ** 8)!r})"
        )

    route = u("o")
    r_src = f"(SELECT * FROM {table} WHERE {route} < {float(r_frac)!r})"
    x_src = (
        f"(SELECT * FROM {table} WHERE {route} >= {float(r_frac)!r}"
        f" AND {route} < {float(r_frac) + float(x_frac)!r})"
    )
    r_sql = span_corruption_sql(r_src, id_col, text_col, 0.15, 3.0, salt + ":r")
    x_sql = span_corruption_sql(x_src, id_col, text_col, 0.5, 8.0, salt + ":x")
    return f"""
SELECT {id_col}, 'R' AS denoiser, '[R] ' || input_text AS input_text, target_text
FROM ({r_sql})
UNION ALL
SELECT {id_col}, 'X' AS denoiser, '[X] ' || input_text AS input_text, target_text
FROM ({x_sql})
UNION ALL
SELECT {id_col}, 'S' AS denoiser,
       '[S] ' || coalesce(array_to_string(ts[1:pcut], ' '), '') AS input_text,
       coalesce(array_to_string(ts[pcut + 1:len(ts)], ' '), '') AS target_text
FROM (
  SELECT {id_col},
         coalesce(list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> ''), []) AS ts,
         CAST(floor({u('p')} * (len(coalesce(list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> ''), []))::DOUBLE + 1.0)) AS INT) AS pcut
  FROM {table} WHERE {route} >= {float(r_frac) + float(x_frac)!r}
)
"""
