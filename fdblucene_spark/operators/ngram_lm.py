"""FreeTextSuggester — Lucene's n-gram language-model suggester.

Lucene's suggest module ships FreeTextSuggester: build an order-N
token n-gram model over the suggestion corpus, then complete the next
token from the longest matching context with STUPID BACKOFF scoring
(Brants et al. 2007; Lucene hardcodes ALPHA = 0.4) — the "search-box
keeps suggesting after you type a full word" surface the
Analyzing/Fuzzy/Infix suggesters don't cover. The reference reaches
every suggest surface through its Lucene delegation
(/root/reference/README.md:54-57).

Spark-first shape — split build from lookup exactly like the ANN
index (similarity.build_ann_index):

- build_ngram_model: ONE pass over the corpus per order (explode
  n-gram strings → partial+final count agg), each order written as a
  gram-SORTED Parquet table `order=g/` plus a tiny meta.json (total
  token mass, orders, analyzer pin). Token n-grams are space-joined
  analyzer tokens, so gram tables are plain (gram, cnt) — at 10^12
  turns each order is one shuffle, and the sorted layout gives
  row-group min/max pruning on any gram prefix.

- FreeTextSuggester(spark, path).lookup(context, k, prefix=""):
  analyze the context with the model's pinned analyzer, take the last
  order-1 tokens, and for each backoff level L (longest first) scan
  order L+1 for grams startswith("c1 .. cL <prefix>") — ONE
  StringStartsWith predicate that Parquet pushes down, covering both
  the context match and the typed prefix — join the level's context
  count (a 1-row broadcast), score cnt/denom * ALPHA^(skipped
  levels), and keep each token's HIGHEST-level score (Lucene backs
  off only where the longer context has no hit). Returns
  (token, score) ordered score desc, token asc, limit k. Every scan
  is dictionary-of-grams sized, never corpus sized.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analysis import tokenize_text

ALPHA = 0.4  # Lucene FreeTextSuggester.ALPHA


def _grams_col(ts, n: int):
    """Array of space-joined token n-grams; docs shorter than n emit
    none (exact-order grams only — an LM, unlike dedup shingles, must
    not fabricate a short-doc pseudo-gram)."""
    return F.when(
        F.size(ts) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ts) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(ts, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def build_ngram_model(
    spark: SparkSession,
    df: DataFrame,
    text_col: str,
    path: str,
    order: int = 3,
    analyzer: str = "standard_v1",
) -> dict:
    """Train the suggester's n-gram count model: for g in 1..order,
    one explode + partial/final count agg, written gram-sorted (
    sortWithinPartitions after a range repartition — global sort
    order => Parquet row-group min/max prune any startswith probe).
    Returns the meta dict (also persisted as meta.json)."""
    from ..functions.analysis import tokens_udf_for
    from .textstats import tokens_col

    if order < 2:
        raise ValueError("order must be >= 2")
    if analyzer == "standard_v1":
        ts = tokens_col(text_col)  # pure Catalyst, whole-stage codegen
    else:
        ts = tokens_udf_for(analyzer)(F.col(text_col))  # Arrow-vectorized
    toks = df.select(ts.alias("ts"))
    total = 0
    for g in range(1, order + 1):
        grams = (
            toks.select(F.explode(_grams_col(F.col("ts"), g)).alias("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        out = os.path.join(path, f"order={g}")
        (
            grams.repartitionByRange(
                max(2, df.sparkSession.sparkContext.defaultParallelism // 2), "gram"
            )
            .sortWithinPartitions("gram")
            .write.mode("overwrite")
            .parquet(out)
        )
        if g == 1:
            total = (
                spark.read.parquet(out).agg(F.sum("cnt")).collect()[0][0] or 0
            )
    meta = {"order": int(order), "analyzer": analyzer, "total_tokens": int(total)}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


class FreeTextSuggester:
    """Lookup side of the persisted n-gram model."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)

    def _order_df(self, g: int) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, f"order={g}"))

    def lookup(
        self, context: str, k: int = 10, prefix: str = ""
    ) -> DataFrame:
        """Stupid-backoff next-token suggestions after `context`
        (a raw string, analyzed with the model's pinned analyzer;
        its last order-1 tokens are the longest context tried).
        prefix restricts candidates to tokens starting with it
        (the partially-typed final word). Score of a candidate w at
        backoff level L (L context tokens, longest Lmax =
        min(len(ctx), order-1)):

            ALPHA^(Lmax - L) * cnt(ctx_L + w) / cnt(ctx_L)

        and each token keeps its highest-L hit only (max_by over
        level — Lucene consults shorter contexts only for tokens the
        longer context never saw). Level 0 is the unigram fallback
        cnt(w)/total_tokens. Returns (token, score) score desc,
        token asc, limit k."""
        if k < 1:
            raise ValueError("k must be >= 1")
        if " " in prefix:
            raise ValueError("prefix must be a single partial token")
        ctx = tokenize_text(context, self.meta["analyzer"]) if context else []
        lmax = min(len(ctx), self.meta["order"] - 1)
        levels = []
        for lvl in range(lmax, -1, -1):
            weight = float(ALPHA ** (lmax - lvl))
            if lvl == 0:
                denom_df = self.spark.range(1).select(
                    F.lit(float(self.meta["total_tokens"])).alias("_denom")
                )
                cand = self._order_df(1).filter(
                    F.col("gram").startswith(prefix) if prefix else F.lit(True)
                ).select(F.col("gram").alias("token"), "cnt")
            else:
                cpre = " ".join(ctx[-lvl:])
                denom_df = (
                    self._order_df(lvl)
                    .filter(F.col("gram") == cpre)
                    .agg(F.sum("cnt").cast("double").alias("_denom"))
                    .filter(F.col("_denom").isNotNull())
                )
                cand = (
                    self._order_df(lvl + 1)
                    .filter(F.col("gram").startswith(cpre + " " + prefix))
                    .select(
                        F.expr(f"substring(gram, {len(cpre) + 2})").alias("token"),
                        "cnt",
                    )
                )
            levels.append(
                cand.crossJoin(F.broadcast(denom_df)).select(
                    "token",
                    F.lit(lvl).alias("level"),
                    (F.lit(weight) * (F.col("cnt").cast("double") / F.col("_denom"))).alias("score"),
                )
            )
        allc = levels[0]
        for p in levels[1:]:
            allc = allc.unionByName(p)
        best = allc.groupBy("token").agg(
            F.max_by(F.struct("level", "score"), "level").alias("_b")
        )
        return (
            best.select("token", F.col("_b.score").alias("score"))
            .orderBy(F.desc("score"), F.asc("token"))
            .limit(int(k))
        )
