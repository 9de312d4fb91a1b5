"""Lucene classification-module analogue: naive Bayes text
classification from corpus term statistics.

Lucene ships `SimpleNaiveBayesClassifier` (lucene/classification):
train = an IndexReader over docs carrying a class field, classify =
for each class c score

    log p(c) + sum over doc tokens w of log p(w|c)
    p(c)   = docs_c / N_docs
    p(w|c) = (tf(w, c) + 1) / (tokens_c + V)      [add-1 smoothing,
             V = corpus vocabulary size; a token unseen in class c —
             or in the whole corpus — still contributes the smoothed
             1 / (tokens_c + V), exactly Lucene's wordProbability]

and picks the argmax (the reference reaches this via stock Lucene on
its FDBDirectory; pom.xml lucene-core). Ours trains the same stats
with two aggs over a (class, text) corpus DataFrame and classifies a
target DataFrame with one term-keyed join — Spark-first, no driver
model state (contrast curation.classifier_scores, whose hash-bucket
model deliberately broadcasts).

Float determinism: per-(token, class) log-probs quantize to float32
BEFORE the per-(doc, class) float64 sum — same-scale float32 addends
sum exactly in float64 for any realistic doc length, so Spark's
partial-agg order and the DuckDB twin's order cannot diverge by an
ulp (the lm_perplexity / BM25-kernel determinism trick).

Scale shape at 100 TB: explode -> one (class, term) partial+final
count agg (the model, distributed), one small-classes cross join,
one term+class-keyed join back, one (doc, class) agg, one per-doc
argmax window. Class count C multiplies the token stream — C is
small by construction (a class field), and the model table is
V x C rows, term-keyed; skew rides the same salting knobs as every
term-keyed agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _TOKENIZE_SQL, tokens_col


def naive_bayes_scores(
    train: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    class_col: str,
) -> DataFrame:
    """Per-(doc, class) naive-Bayes log-scores for every target doc
    against every class seen in `train`. Returns (id, class, score);
    empty target docs score prior-only (Lucene's classifier does the
    same — no tokens, no likelihood terms)."""
    import os as _os
    import uuid as _uuid

    from ._spread import spread

    train = spread(train)
    target = spread(target)
    spark = train.sparkSession
    toks_tr = train.select(
        F.col(class_col).alias("class"), F.explode(tokens_col(text_col)).alias("t")
    )
    # FREEZE the (class, token) count model once: per-class token
    # totals, the vocabulary size and the log-prob table all derive
    # from it, and deriving each from `toks_tr` directly re-ran the
    # tokenize+explode pass over the training corpus once per
    # aggregate (3x). The frozen model is V x C rows.
    counts_dir = _os.path.join("/tmp", "sparklucene-nb-" + _uuid.uuid4().hex[:12])
    toks_tr.groupBy("class", "t").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    ).write.mode("errorifexists").parquet(counts_dir)
    counts = spark.read.parquet(counts_dir)
    # bounded model state (one row per class / one scalar): exact
    # integer stats collected and re-injected as literals — every
    # float expression below stays the SAME Catalyst expression as
    # before, so scores are bit-identical
    docs_c = {
        r["class"]: int(r["n"])
        for r in train.groupBy(F.col(class_col).alias("class"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # per-class token totals AND the global vocab size in ONE rollup
    # job over the frozen model (grouping_id separates the total row
    # from a genuine NULL class)
    model_rows = counts.rollup("class").agg(
        F.sum("tf").cast("long").alias("s"),
        F.countDistinct("t").alias("v"),
        F.grouping_id().alias("g"),
    ).collect()
    tokens_c = {r["class"]: int(r["s"]) for r in model_rows if r["g"] == 0}
    v_size = next(int(r["v"]) for r in model_rows if r["g"] == 1)
    n_docs = sum(docs_c.values())
    from pyspark.sql import types as T

    cls_schema = T.StructType(
        [
            T.StructField("class", train.schema[class_col].dataType),
            T.StructField("docs_c", T.DoubleType()),
            T.StructField("tokens_c", T.DoubleType()),
            T.StructField("v_size", T.DoubleType()),
            T.StructField("n_docs", T.DoubleType()),
        ]
    )
    classes = spark.createDataFrame(
        [
            (c, float(docs_c[c]), float(tokens_c.get(c, 0)), float(v_size), float(n_docs))
            for c in sorted(docs_c, key=lambda x: (x is None, x))
        ],
        cls_schema,
    ).select(
        "class",
        F.log(F.col("docs_c") / F.col("n_docs")).cast("float").alias("prior32"),
        F.col("tokens_c"),
        F.col("v_size"),
        # smoothed floor for tokens unseen in this class
        F.log(F.lit(1.0) / (F.col("tokens_c") + F.col("v_size")))
        .cast("float").alias("floor32"),
    )
    logp = counts.join(
        F.broadcast(classes.select("class", "tokens_c", "v_size")), "class"
    ).select(
        "class", "t",
        F.log((F.col("tf") + F.lit(1.0)) / (F.col("tokens_c") + F.col("v_size")))
        .cast("float").alias("logp32"),
    )
    toks_tgt = target.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("t"))
    # every token x every class; unseen (token, class) pairs fall back
    # to the class floor
    per_tok = (
        toks_tgt.crossJoin(F.broadcast(classes.select("class", "floor32")))
        .join(logp, ["class", "t"], "left")
        .select(
            F.col(id_col), "class",
            F.coalesce(F.col("logp32"), F.col("floor32")).alias("lp32"),
        )
    )
    lik = per_tok.groupBy(id_col, "class").agg(
        F.sum(F.col("lp32").cast("double")).alias("lik")
    )
    return (
        target.select(F.col(id_col))
        .crossJoin(F.broadcast(classes.select("class", "prior32")))
        .join(lik, [id_col, "class"], "left")
        .select(
            F.col(id_col), "class",
            (F.col("prior32").cast("double") + F.coalesce(F.col("lik"), F.lit(0.0)))
            .alias("score"),
        )
    )


def naive_bayes_classify(
    train: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    class_col: str,
) -> DataFrame:
    """Argmax wrapper: (id, pred, score) — deterministic tie-break
    (score desc, class asc), Lucene's assignClass contract of one
    best ClassificationResult."""
    scores = naive_bayes_scores(train, target, id_col, text_col, class_col)
    # argmax via min(struct(-score, class)): struct comparison is
    # lexicographic, so this is EXACTLY (score desc, class asc) — but
    # as one partial+final aggregate (map-side combine) instead of a
    # row_number window shuffling every (doc, class) row
    best = scores.groupBy(id_col).agg(
        F.min(
            F.struct((-F.col("score")).alias("ns"), F.col("class").alias("cls"))
        ).alias("b")
    )
    return best.select(
        F.col(id_col), F.col("b.cls").alias("pred"), (-F.col("b.ns")).alias("score")
    )


def naive_bayes_sql(
    table: str, id_col: str, text_col: str, class_col: str, best_only: bool = True
) -> str:
    """DuckDB twin (self-classification over one table): identical
    count/smooth/float32-quantize/sum chain as the operators above."""
    sel = (
        f"SELECT {id_col}, class AS pred, score FROM ranked WHERE rn = 1"
        if best_only
        else f"SELECT {id_col}, class, score FROM scored"
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, {class_col} AS class,
         list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
), tok AS (
  SELECT {id_col}, class, unnest(ts) AS t FROM toks
), consts AS (
  SELECT count(DISTINCT t)::DOUBLE AS v_size FROM tok
), nd AS (
  SELECT count(*)::DOUBLE AS n_docs FROM {table}
), cls AS (
  SELECT {class_col} AS class, count(*)::DOUBLE AS docs_c FROM {table} GROUP BY 1
), tokc AS (
  SELECT class, count(*)::DOUBLE AS tokens_c FROM tok GROUP BY class
), classes AS (
  SELECT c.class,
         ln(c.docs_c / nd.n_docs)::FLOAT AS prior32,
         COALESCE(tc.tokens_c, 0.0) AS tokens_c,
         consts.v_size,
         ln(1.0 / (COALESCE(tc.tokens_c, 0.0) + consts.v_size))::FLOAT AS floor32
  FROM cls c LEFT JOIN tokc tc USING (class), consts, nd
), counts AS (
  SELECT class, t, count(*)::DOUBLE AS tf FROM tok GROUP BY class, t
), logp AS (
  SELECT cn.class, cn.t,
         ln((cn.tf + 1.0) / (cl.tokens_c + cl.v_size))::FLOAT AS logp32
  FROM counts cn JOIN classes cl USING (class)
), tgt AS (
  SELECT {id_col}, unnest(list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '')) AS t
  FROM {table}
), per_tok AS (
  SELECT g.{id_col}, cl.class, COALESCE(lp.logp32, cl.floor32) AS lp32
  FROM tgt g CROSS JOIN classes cl
  LEFT JOIN logp lp ON lp.class = cl.class AND lp.t = g.t
), lik AS (
  SELECT {id_col}, class, sum(lp32::DOUBLE) AS lik FROM per_tok GROUP BY {id_col}, class
), scored AS (
  SELECT d.{id_col}, cl.class,
         (cl.prior32::DOUBLE + COALESCE(l.lik, 0.0)) AS score
  FROM {table} d CROSS JOIN classes cl
  LEFT JOIN lik l ON l.{id_col} = d.{id_col} AND l.class = cl.class
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY {id_col} ORDER BY score DESC, class ASC) AS rn
  FROM scored
)
{sel}
"""


def perceptron_weights(
    train: DataFrame,
    text_col: str,
    class_col: str,
    epochs: int = 2,
    id_col: str | None = None,
) -> DataFrame:
    """Batch-trained boolean perceptron — the distributed analogue of
    Lucene's `BooleanPerceptronClassifier` (lucene/classification):
    one weight per term, initialized to the term's totalTermFreq,
    threshold auto-assigned as sumDocFreq / 2 (Lucene's constructor
    default), and error-driven tf-weighted updates. Lucene trains
    ONLINE (doc-by-doc, order-dependent — its result depends on index
    doc order); a distributed engine can't serialize the corpus
    through one mutable FST, so this is the classic BATCH perceptron:
    each epoch scores EVERY doc against the frozen epoch weights and
    applies the summed update

        out_d   = sum_t w_e(t) * tf(d, t)
        pred_d  = 2 * out_d >= sumDocFreq      [threshold in integers]
        err_d   = class_d - pred_d             in {-1, 0, +1}
        w_{e+1} = w_e(t) + sum_d err_d * tf(d, t)

    Every quantity is a BIGINT — no float anywhere, so the result is
    bit-exact under any partitioning / aggregation order. Returns
    (term, weight). class_col must be a boolean column.

    Scale shape: tf = one explode + (doc, term) count agg, reused
    every epoch (persist it upstream for big corpora); each epoch is
    one term-keyed join + doc agg + one term-keyed update agg — the
    same bounded iterative shape as dedup.connected_components. The
    epoch count bounds plan depth (unrolled lazily into one plan).

    id_col: a stable per-doc key; when None, falls back to
    monotonically_increasing_id (unique per row, but plan-recompute
    stability then depends on deterministic input splits — pass a
    real key for production corpora)."""
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    pid = (
        F.col(id_col) if id_col is not None else F.monotonically_increasing_id()
    )
    from ._spread import spread

    train = spread(train)
    tf = (
        train.select(
            F.col(class_col).cast("boolean").alias("cls"),
            pid.alias("__pid"),
            F.explode(tokens_col(text_col)).alias("t"),
        )
        .groupBy("__pid", "cls", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    # sumDocFreq = total postings count (sum over terms of df);
    # doubled threshold keeps everything integer
    sdf = tf.agg(F.count(F.lit(1)).cast("long").alias("sdf"))
    w = tf.groupBy("t").agg(F.sum("tf").alias("w"))
    for _ in range(epochs):
        out = (
            tf.join(w, "t")
            .groupBy("__pid", "cls")
            .agg(F.sum(F.col("tf") * F.col("w")).alias("o"))
            .crossJoin(F.broadcast(sdf))
            .select(
                "__pid",
                (
                    F.col("cls").cast("long")
                    - (F.lit(2) * F.col("o") >= F.col("sdf")).cast("long")
                ).alias("err"),
            )
        )
        delta = (
            tf.join(out, "__pid")
            .groupBy("t")
            .agg(F.sum(F.col("err") * F.col("tf")).alias("d"))
        )
        w = (
            w.join(delta, "t", "left")
            .select("t", (F.col("w") + F.coalesce(F.col("d"), F.lit(0))).alias("w"))
        )
    return w.select(F.col("t").alias("term"), F.col("w").alias("weight"))


def perceptron_classify(
    train: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    class_col: str,
    epochs: int = 2,
    train_id_col: str | None = None,
) -> DataFrame:
    """Train on `train`, assign every `target` doc: (id, pred BOOLEAN,
    margin BIGINT) where margin = 2 * out - sumDocFreq (>= 0 means
    true — Lucene's assignClass Boolean with the doubled-integer
    threshold). Terms unseen in training contribute 0, like an FST
    miss; an empty doc scores out = 0."""
    w = perceptron_weights(train, text_col, class_col, epochs, id_col=train_id_col)
    # sumDocFreq the same integer way (count of distinct (doc, term))
    pid = (
        F.col(train_id_col)
        if train_id_col is not None
        else F.monotonically_increasing_id()
    )
    from ._spread import spread

    train = spread(train)
    target = spread(target)
    sdf = (
        train.select(pid.alias("__pid"), F.explode(tokens_col(text_col)).alias("t"))
        .select("__pid", "t")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("sdf"))
    )
    tgt = (
        target.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("t"))
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    out = (
        tgt.join(w, tgt["t"] == w["term"], "left")
        .groupBy(id_col)
        .agg(F.sum(F.col("tf") * F.coalesce(F.col("weight"), F.lit(0))).alias("o"))
    )
    return (
        target.select(F.col(id_col))
        .join(out, id_col, "left")
        .crossJoin(F.broadcast(sdf))
        .select(
            F.col(id_col),
            (F.lit(2) * F.coalesce(F.col("o"), F.lit(0)) >= F.col("sdf")).alias("pred"),
            (F.lit(2) * F.coalesce(F.col("o"), F.lit(0)) - F.col("sdf")).alias("margin"),
        )
    )


def perceptron_sql(
    table: str, id_col: str, text_col: str, class_expr: str, epochs: int = 2
) -> str:
    """DuckDB twin (self-classification): the SAME integer batch
    updates, epochs unrolled as chained CTEs — bit-exact by
    construction (no floats anywhere in the chain)."""
    ctes = [f"""toks AS (
  SELECT {id_col} AS pid, ({class_expr}) AS cls,
         list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
), tf AS (
  SELECT pid, cls, t, count(*)::BIGINT AS tf
  FROM (SELECT pid, cls, unnest(ts) AS t FROM toks) GROUP BY pid, cls, t
), sdf AS (
  SELECT count(*)::BIGINT AS sdf FROM tf
), w0 AS (
  SELECT t, sum(tf)::BIGINT AS w FROM tf GROUP BY t
)"""]
    for e in range(epochs):
        ctes.append(f"""out{e} AS (
  SELECT tf.pid, tf.cls, sum(tf.tf * w{e}.w)::BIGINT AS o
  FROM tf JOIN w{e} ON w{e}.t = tf.t GROUP BY tf.pid, tf.cls
), err{e} AS (
  SELECT o.pid,
         (o.cls::BIGINT - (2 * o.o >= sdf.sdf)::BIGINT) AS err
  FROM out{e} o, sdf
), d{e} AS (
  SELECT tf.t, sum(e.err * tf.tf)::BIGINT AS d
  FROM tf JOIN err{e} e ON e.pid = tf.pid GROUP BY tf.t
), w{e + 1} AS (
  SELECT w{e}.t, (w{e}.w + COALESCE(d.d, 0))::BIGINT AS w
  FROM w{e} LEFT JOIN d{e} d ON d.t = w{e}.t
)""")
    return f"""
WITH {', '.join(ctes)},
tgt AS (
  SELECT pid, t, count(*)::BIGINT AS tf
  FROM (SELECT pid, unnest(ts) AS t FROM toks) GROUP BY pid, t
), outf AS (
  SELECT g.pid, sum(g.tf * COALESCE(w.w, 0))::BIGINT AS o
  FROM tgt g LEFT JOIN w{epochs} w ON w.t = g.t GROUP BY g.pid
)
SELECT toks.pid AS {id_col},
       (2 * COALESCE(outf.o, 0) >= sdf.sdf) AS pred,
       (2 * COALESCE(outf.o, 0) - sdf.sdf)::BIGINT AS margin
FROM toks LEFT JOIN outf ON outf.pid = toks.pid, sdf
ORDER BY {id_col}
"""
