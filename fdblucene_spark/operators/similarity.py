"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (pure Catalyst
higher-order functions — zip_with/aggregate, whole-stage codegen, no
Python), plus a random-hyperplane LSH-bucketed variant as the scale
path (candidates from matching buckets only, exact re-rank inside).

Scale: brute force is a single narrow scan + global top-k (fine as a
one-off, linear in corpus); LSH turns it into a bucket-pruned scan —
the bucket filter pushes down to the signature column, so at 10^9+
vectors only matching buckets are read. IVF would replace the random
planes with k-means centroids — ivf_cosine_topk implements exactly
that (spherical k-means centroids, distributed assignment, nprobe
cell-pruned exact re-rank).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

LSH_SEED = 42


def _fold_dot_rows(x: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Row-wise dot product accumulated LEFT-TO-RIGHT in float64 —
    bit-identical to the Catalyst `F.aggregate(zip_with(...))` fold
    (acc starts at 0.0, adds x_j*q_j in element order). numpy's
    `@`/einsum use pairwise/SIMD summation whose last-ulp result can
    differ, which would flip top-k membership on razor ties — so the
    dim-loop below is deliberate (still vectorized across rows)."""
    acc = np.zeros(x.shape[0], dtype=np.float64)
    for j in range(x.shape[1]):
        acc = acc + x[:, j] * q[j]
    return acc


def _fold_sqnorm_rows(x: np.ndarray) -> np.ndarray:
    """Row-wise sum of squares, same left-to-right fold contract."""
    acc = np.zeros(x.shape[0], dtype=np.float64)
    for j in range(x.shape[1]):
        acc = acc + x[:, j] * x[:, j]
    return acc


def _seq_sqnorm(vec) -> float:
    """Scalar left-to-right sum of squares (the `_norm` fold on one
    vector), for driver-side query norms."""
    s = 0.0
    for v in vec:
        s += float(v) * float(v)
    return float(np.sqrt(s))


def _batch_topk(c: np.ndarray, ids: pd.Series, m: int) -> np.ndarray:
    """Positions of the top-m rows by (c desc, id asc) under Spark's
    double ordering (NaN greatest). Returns an index array into c."""
    n = c.shape[0]
    if n <= m:
        return np.arange(n)
    order = pd.DataFrame({"c": c, "id": ids.to_numpy(), "i": np.arange(n)})
    order = order.sort_values(
        ["c", "id"], ascending=[False, True], kind="mergesort", na_position="first"
    )
    return order["i"].to_numpy()[:m]


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_scores(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float]
) -> DataFrame:
    """(id, cosine) vs one query vector, computed in double precision."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    if qn == 0.0:
        raise ValueError("query vector has zero norm; cosine undefined")
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.select(
        F.col(id_col),
        F.round(_dot(v, q) / (_norm(v) * F.lit(qn)), 3).alias("cosine"),
    )


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int
) -> DataFrame:
    """Exact brute-force top-k by cosine (desc), id asc tie-break."""
    return _topk_by_raw_cosine(df, id_col, vec_col, query_vec, k)


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    positives: DataFrame,
    k: int,
    query_id: str = "query_id",
    qvec_col: str = "qvec",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Hard-negative mining for retrieval training (the DPR /
    Contriever recipe): for EVERY training query, the top-k
    most-cosine-similar corpus docs EXCLUDING its labeled positives —
    the near-misses a contrastive trainer needs as negatives.

    queries: (query_id, qvec_col) — one embedding per query.
    positives: (query_id, id_col) labels, anti-joined out BEFORE the
    top-k cut (a positive never displaces a negative).
    candidates: optional (query_id, id_col) pre-filter — the scale
    path: feed AnnIndex bucket probes here so each query scores only
    its candidate set instead of the corpus. Without it the scoring
    join is the exact |queries| x |corpus| brute-force baseline; the
    QUERY BATCH side broadcasts, so keep it a batch (thousands), not
    a corpus — mirroring cosine_topk's exact-baseline role.

    Returns (query_id, rank, doc_id, cosine): rank 1..k per query in
    (cosine desc, doc asc) order; cosine is the double-precision
    value rounded to 3 decimals for display AFTER the cut (ties at
    the rounding never decide membership, same law as cosine_topk).

    Shape: one corpus scan; the brute-force path scores with an
    Arrow-batched kernel whose float64 folds are bit-identical to the
    Catalyst array expressions (see _fold_dot_rows) and emits only the
    per-batch top-(k + |positives_q|) candidates per query — provably
    a superset of the global post-anti-join top-k — so the anti-join
    and the per-query window cut run over k-bounded rows instead of
    |queries| x |corpus|; positives anti-join keyed by (query, doc);
    the final window is k-bounded per query. The query batch (and its
    per-query positive COUNTS, one row per query) are driver-bounded
    model state, same contract as the broadcast the crossJoin paid."""
    q = queries.select(
        F.col(query_id).alias("_q"),
        F.transform(F.col(qvec_col), lambda x: x.cast("double")).alias("_qv"),
    )
    if candidates is not None:
        cand = candidates.select(
            F.col(query_id).alias("_q"), F.col(id_col).alias("_cd")
        )
        base = (
            corpus.join(cand, F.col(id_col) == F.col("_cd"), "inner")
            .drop("_cd")
            .join(F.broadcast(q), "_q")
        )
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        raw = (_dot(v, F.col("_qv")) / (_norm(v) * _norm(F.col("_qv")))).alias("_c")
        scored = base.select(F.col("_q"), F.col(id_col), raw)
    else:
        scored = _brute_scores_topm(
            queries, corpus, positives, int(k), query_id, qvec_col, id_col, vec_col
        )
    pos = positives.select(
        F.col(query_id).alias("_q"), F.col(id_col).alias(id_col)
    )
    negs = scored.join(pos, ["_q", id_col], "left_anti")
    w = Window.partitionBy("_q").orderBy(F.desc("_c"), F.asc(id_col))
    return (
        negs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_q").alias(query_id),
            F.col("rank").cast("long").alias("rank"),
            id_col,
            F.round(F.col("_c"), 3).alias("cosine"),
        )
    )


def _brute_scores_topm(
    queries: DataFrame,
    corpus: DataFrame,
    positives: DataFrame,
    k: int,
    query_id: str,
    qvec_col: str,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Candidate generator for hard_negatives' exact brute-force path:
    (_q, id, _c) rows containing, for every query, a SUPERSET of the
    global top-k negatives.

    Per Arrow batch of the corpus, an in-kernel gemm-shaped loop
    scores every (row, query) pair with the SAME left-to-right float64
    folds the Catalyst expressions produce (bit-identical _c values),
    then keeps the batch's top-(k + n_positives(q)) rows per query
    under (c desc, id asc). Any row in the global post-anti-join
    top-k ranks at most k + n_positives(q) globally on raw scores, so
    it survives its own batch's cut — the downstream anti-join +
    window see every row they need while the shuffle carries
    O(batches * queries * k) rows instead of |corpus| * |queries|."""
    from ._spread import spread

    q_rows = queries.select(query_id, qvec_col).collect()
    qids = [r[0] for r in q_rows]
    pos_counts = {
        r[0]: int(r[1])
        for r in positives.groupBy(query_id).count().collect()
    }
    qmat = (
        np.asarray([[float(x) for x in r[1]] for r in q_rows], dtype=np.float64)
        if q_rows
        else np.zeros((0, 0), dtype=np.float64)
    )
    qnorms = np.asarray([_seq_sqnorm(r[1]) for r in q_rows], dtype=np.float64)
    cuts = [int(k) + pos_counts.get(qid, 0) for qid in qids]
    out_schema = T.StructType(
        [
            T.StructField("_q", queries.schema[query_id].dataType),
            T.StructField(id_col, corpus.schema[id_col].dataType),
            T.StructField("_c", T.DoubleType()),
        ]
    )
    nq = len(qids)

    def kern(batches):
        for pdf in batches:
            if pdf.empty or nq == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            nv = np.sqrt(_fold_sqnorm_rows(x))
            ids = pdf[id_col]
            frames = []
            for qi in range(nq):
                with np.errstate(divide="ignore", invalid="ignore"):
                    c = _fold_dot_rows(x, qmat[qi]) / (nv * qnorms[qi])
                sel = _batch_topk(c, ids, cuts[qi])
                frames.append(
                    pd.DataFrame(
                        {
                            "_q": qids[qi],
                            id_col: ids.to_numpy()[sel],
                            "_c": c[sel],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    src = spread(corpus.select(id_col, vec_col))
    return src.mapInPandas(kern, schema=out_schema)


def hard_negatives_sql(
    table: str, id_col: str, vec_col: str, query_pred: str, k: int
) -> str:
    """DuckDB twin of hard_negatives for the self-retrieval setup
    (query set = rows matching query_pred, embedded by their own
    vectors; positives = the query doc itself): same double math as
    cosine_topk_sql, per-query ROW_NUMBER cut."""
    return f"""
WITH q AS (
  SELECT {id_col} AS qid, {vec_col} AS qv FROM {table} WHERE {query_pred}
), scored AS (
  SELECT q.qid, e.{id_col},
         list_sum(list_transform(range(1, len(e.{vec_col}) + 1),
                  i -> e.{vec_col}[i]::DOUBLE * q.qv[i]::DOUBLE)) /
         (sqrt(list_sum(list_transform(e.{vec_col}, x -> x::DOUBLE * x::DOUBLE))) *
          sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))) AS c
  FROM {table} e, q
  WHERE e.{id_col} <> q.qid
), ranked AS (
  SELECT qid, {id_col}, c,
         row_number() OVER (PARTITION BY qid ORDER BY c DESC, {id_col} ASC) AS rank
  FROM scored
)
SELECT qid AS query_id, rank::BIGINT AS rank, {id_col}, round(c, 3) AS cosine
FROM ranked WHERE rank <= {k}
"""


def cosine_topk_sql(table: str, id_col: str, vec_col: str, query_id: int, k: int) -> str:
    """DuckDB twin: same double-precision math (manual dot product via
    list_transform over index range — list_cosine_similarity computes
    in float32 and would diverge from Spark's double)."""
    return f"""
WITH q AS (
  SELECT {vec_col} AS qv FROM {table} WHERE {id_col} = {query_id}
), scored AS (
  SELECT e.{id_col},
         list_sum(list_transform(range(1, len(e.{vec_col}) + 1),
                  i -> e.{vec_col}[i]::DOUBLE * q.qv[i]::DOUBLE)) /
         (sqrt(list_sum(list_transform(e.{vec_col}, x -> x::DOUBLE * x::DOUBLE))) *
          sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))) AS c
  FROM {table} e, q
)
SELECT {id_col}, round(c, 3) AS cosine
FROM scored
ORDER BY c DESC, {id_col} ASC
LIMIT {k}
"""


def _quant_expr(v):
    """Symmetric per-vector int8 quantization as pure Catalyst
    expressions: scale = max|v|/127, q_i = floor(v_i/scale + 0.5)
    (explicit floor-half-up — engines disagree on round()'s half
    rule, floor never does). Returns (qvec longs in [-127, 127+1],
    scale)."""
    maxabs = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    s = F.when(maxabs > 0, maxabs / F.lit(127.0)).otherwise(F.lit(1.0))
    q = F.transform(v, lambda x: F.floor(x / s + F.lit(0.5)).cast("long"))
    return q, s


def quantize_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Materialize int8 scalar-quantized vectors (Lucene 9's
    Lucene99ScalarQuantizedVectorsFormat idea): (id, qvec
    array<tinyint>, scale float). At rest this is 4x smaller than
    float32 and 8x smaller than float64 — the scan-bandwidth win is
    the whole point at 100 TB of embeddings. Quantized cosine needs
    NO dequantization: symmetric per-vector scales cancel, so score
    = int-dot / (int-norm * int-norm) — see sq_cosine_topk."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q, s = _quant_expr(v)
    return df.select(
        F.col(id_col),
        F.transform(q, lambda x: x.cast("byte")).alias("qvec"),
        s.cast("float").alias("scale"),
    )


def _quantize_seq(vec) -> list[int]:
    """Driver-side twin of _quant_expr for the query vector —
    floor-half-up on float64, same arithmetic order."""
    import math

    m = 0.0
    for x in vec:
        m = max(m, abs(float(x)))
    s = m / 127.0 if m > 0 else 1.0
    return [int(math.floor(float(x) / s + 0.5)) for x in vec]


def sq_cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int,
    rescore: int = 0,
) -> DataFrame:
    """Approximate top-k by int8 scalar-quantized cosine, optionally
    rescored exactly (Lucene 9 quantized-KNN + re-ranking). The
    quantized score is cos(q(v), q(query)) over the INTEGER vectors —
    per-vector symmetric scales cancel out of the cosine, so scoring
    never dequantizes: one exact int64 dot + two int64 norms per row,
    double division at the end. rescore=C > k: the top-C candidates
    by quantized score re-rank by exact double cosine, cut to k (the
    standard recall-restoring second pass — C bounds the exact work,
    the cheap quantized scan does the heavy cut). rescore=0 returns
    the quantized ranking itself.

    At scale: the scan reads tinyint arrays (4x less IO than f32),
    the candidate cut is TakeOrdered (no global sort), and the exact
    pass touches C rows. Ties break id asc everywhere.

    Execution: the quantize+score scan runs as an Arrow-batched
    kernel. Quantization is the same floor-half-up float64 math as
    _quant_expr; the dot and norm are integer sums (fully associative
    — any order is exact), and the final double division matches the
    Catalyst expression term-for-term, so _qc is bit-identical to the
    former zip_with/aggregate plan while running vectorized instead
    of through interpreted higher-order functions. Each batch emits
    only its top-max(k, rescore) rows by (_qc desc, id asc) — a
    superset of the global cut — so the TakeOrdered sees
    O(batches * C) rows."""
    from ._spread import spread

    qq = _quantize_seq(query_vec)
    qqn = float(np.sqrt(sum(x * x for x in qq)))
    if qqn == 0.0:
        raise ValueError("query vector quantizes to zero; cosine undefined")
    cut = max(int(k), int(rescore) if rescore else 0)
    qarr = np.asarray(qq, dtype=np.int64)
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("_qc", T.DoubleType()),
        ]
    )

    def kern(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if x.ndim != 2 or x.shape[1] == 0:
                qc = np.full(len(pdf), -2.0)
            else:
                maxabs = np.max(np.abs(x), axis=1)
                s = np.where(maxabs > 0, maxabs / 127.0, 1.0)
                qv = np.floor(x / s[:, None] + 0.5).astype(np.int64)
                dot = qv @ qarr
                nrm = np.sqrt((qv * qv).sum(axis=1).astype(np.float64))
                with np.errstate(divide="ignore", invalid="ignore"):
                    qc = np.where(
                        nrm > 0, dot.astype(np.float64) / (nrm * qqn), -2.0
                    )
            ids = pdf[id_col]
            sel = _batch_topk(qc, ids, cut)
            yield pd.DataFrame({id_col: ids.to_numpy()[sel], "_qc": qc[sel]})

    scored = spread(df.select(id_col, vec_col)).mapInPandas(kern, schema=out_schema)
    if rescore and int(rescore) > 0:
        cand_ids = (
            scored.orderBy(F.desc("_qc"), F.asc(id_col))
            .limit(int(rescore))
            .select(id_col)
        )
        cand = df.select(F.col(id_col), F.col(vec_col)).join(
            F.broadcast(cand_ids), id_col
        )
        return _topk_by_raw_cosine(cand, id_col, vec_col, query_vec, int(k))
    return (
        scored.orderBy(F.desc("_qc"), F.asc(id_col))
        .limit(int(k))
        .select(F.col(id_col), F.round(F.col("_qc"), 3).alias("cosine"))
    )


def sq_cosine_topk_sql(
    table: str, id_col: str, vec_col: str, query_id: int, k: int, rescore: int = 0
) -> str:
    """DuckDB twin of sq_cosine_topk: the same floor-half-up int8
    quantization, exact integer dot/norms, identical double division
    and (desc, id asc) ordering; rescore pass mirrors the exact
    cosine over the candidate cut."""
    quant = (
        "list_transform({v}, x -> floor(x::DOUBLE / "
        "(CASE WHEN {m} > 0 THEN {m} / 127.0 ELSE 1.0 END) + 0.5)::BIGINT)"
    )
    maxabs = "list_max(list_transform({v}, x -> abs(x::DOUBLE)))"
    q_quant = quant.format(v="q.qv", m=maxabs.format(v="q.qv"))
    e_quant = quant.format(v=f"e.{vec_col}", m=maxabs.format(v=f"e.{vec_col}"))
    base = f"""
WITH q AS (
  SELECT {vec_col} AS qv FROM {table} WHERE {id_col} = {query_id}
), qq AS (
  SELECT {q_quant} AS qv,
         sqrt(list_sum(list_transform({q_quant}, x -> x * x))::DOUBLE) AS qn
  FROM q
), scored AS (
  SELECT e.{id_col}, e.{vec_col},
    CASE WHEN list_sum(list_transform({e_quant}, x -> x * x)) > 0 THEN
      list_sum(list_transform(range(1, len(e.{vec_col}) + 1),
               i -> ({e_quant})[i] * qq.qv[i]))::DOUBLE /
      (sqrt(list_sum(list_transform({e_quant}, x -> x * x))::DOUBLE) * qq.qn)
    ELSE -2.0 END AS qc
  FROM {table} e, qq
)"""
    if rescore and int(rescore) > 0:
        return f"""{base},
cand AS (
  SELECT {id_col}, {vec_col} FROM scored
  ORDER BY qc DESC, {id_col} ASC LIMIT {int(rescore)}
), exact AS (
  SELECT c.{id_col},
         list_sum(list_transform(range(1, len(c.{vec_col}) + 1),
                  i -> c.{vec_col}[i]::DOUBLE * q.qv[i]::DOUBLE)) /
         (sqrt(list_sum(list_transform(c.{vec_col}, x -> x::DOUBLE * x::DOUBLE))) *
          sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))) AS c
  FROM cand c, q
)
SELECT {id_col}, round(c, 3) AS cosine
FROM exact ORDER BY c DESC, {id_col} ASC LIMIT {int(k)}
"""
    return f"""{base}
SELECT {id_col}, round(qc, 3) AS cosine
FROM scored ORDER BY qc DESC, {id_col} ASC LIMIT {int(k)}
"""


def rrf_fuse(
    inputs: list[tuple[DataFrame, str, str]], k: int = 10, k0: int = 60
) -> DataFrame:
    """Reciprocal-rank fusion over candidate lists — the standard
    hybrid-search combiner (BM25 top-N x embedding-cosine top-N):
    fused(id) = sum_i 1 / (k0 + rank_i(id)), missing-from-list
    contributes 0. inputs = [(hits_df, id_col, score_col), ...]; each
    list ranks by (score desc, id asc) — EXACTLY the ordering its
    producer surface emits — and the fused ranking ties break id asc.

    The rank windows are single-partition BY DESIGN: every input is a
    top-N candidate list (k-bounded), so the window sees N rows, not a
    corpus — same bounded-window justification as search_grouped's
    group-head ranking. Contributions sum left-to-right in float64 in
    input order (mirrored by the SQL twin)."""
    if not inputs:
        raise ValueError("rrf_fuse needs at least one ranking")
    ranked = []
    for i, (df, id_col, score_col) in enumerate(inputs):
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        ranked.append(
            df.select(
                F.col(id_col).cast("long").alias("id"),
                F.row_number().over(w).alias(f"_r{i}"),
            )
        )
    fused = ranked[0]
    for r in ranked[1:]:
        fused = fused.join(r, "id", "full")
    score = None
    for i in range(len(inputs)):
        c = F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"_r{i}")), F.lit(0.0)
        )
        score = c if score is None else score + c
    return (
        fused.select("id", score.alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("id"))
        .limit(int(k))
    )


def lsh_planes(dim: int, n_planes: int = 8, seed: int = LSH_SEED) -> np.ndarray:
    """Deterministic random hyperplanes (normal components)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _seq_dot(a, b) -> float:
    """Sequential left-to-right float64 dot — bit-identical to the
    Catalyst F.aggregate fold and to an explicit SQL `+` chain, so
    driver-side probe-bucket selection agrees with the stored bucket
    column and with the DuckDB oracle at the last ulp (numpy's @ uses
    pairwise/SIMD summation, which can flip the sign of a near-zero
    hyperplane dot)."""
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def _topk_by_raw_cosine(df: DataFrame, id_col: str, vec_col: str, query_vec, k: int) -> DataFrame:
    """Top-k by the UNROUNDED double cosine (ties at the displayed
    3-decimal rounding must not decide top-k membership — the oracle
    orders by the raw value), id asc tie-break; output rounds to 3."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    if qn == 0.0:
        raise ValueError("query vector has zero norm; cosine undefined")
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    raw = (_dot(v, q) / (_norm(v) * F.lit(qn))).alias("_c")
    return (
        df.select(F.col(id_col), raw)
        .orderBy(F.desc("_c"), F.asc(id_col))
        .limit(k)
        .select(F.col(id_col), F.round(F.col("_c"), 3).alias("cosine"))
    )


def with_lsh_bucket(
    df: DataFrame, vec_col: str, planes: np.ndarray, out_col: str = "bucket"
) -> DataFrame:
    """Sign-pattern bucket id from the hyperplanes (JVM expressions)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(_dot(v, p) > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn(out_col, bucket)


def lsh_cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int,
    n_planes: int = 8,
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: candidates from buckets within `probe_hamming` bit
    flips of the query bucket, exact cosine re-rank inside. Recall vs
    brute force is property-tested (tests/test_pipeline_ops.py).

    This inline form recomputes the bucket over the whole corpus per
    query — fine for one-off batch jobs; a query service should build
    the bucket column ONCE with build_ann_index (partition-pruned
    probes)."""
    planes = lsh_planes(len(query_vec), n_planes)
    q = np.asarray(query_vec, dtype=np.float64)
    qbits = int(sum((1 << j) for j, p in enumerate(planes) if _seq_dot(p, q) > 0))
    probe = [qbits]
    if probe_hamming >= 1:
        probe += [qbits ^ (1 << j) for j in range(n_planes)]
    if probe_hamming >= 2:
        probe += [
            qbits ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    bucketed = with_lsh_bucket(df, vec_col, planes)
    cands = bucketed.filter(F.col("bucket").isin(probe))
    return _topk_by_raw_cosine(cands, id_col, vec_col, query_vec, k)


def lloyd_spherical(x: np.ndarray, n_centroids: int, iters: int, seed: int) -> np.ndarray:
    """Spherical k-means Lloyd iterations on a float64 sample matrix —
    the shared numerical core: the engine runs it on a Spark-collected
    sample and the DuckDB oracle generator reruns it on the same rows
    read via pyarrow, producing BIT-IDENTICAL centroid literals."""
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_centroids(
    df: DataFrame,
    vec_col: str,
    n_centroids: int = 16,
    sample: int = 2048,
    iters: int = 8,
    seed: int = LSH_SEED,
    id_col: str | None = None,
) -> np.ndarray:
    """Spherical k-means centroids from a DETERMINISTIC sample: the
    first `sample` rows by id_col (TakeOrdered — cheap at any corpus
    size). Without id_col the sample is whatever limit() returns —
    fine for throwaway jobs, but a persisted index (build_ann_index)
    always passes id_col so rebuilds and SQL oracles reproduce the
    exact model.

    Driver-side Lloyd iterations on <= `sample` unit-normalized
    vectors — the centroid table is tiny model state (exactly what an
    IVF index ships to every executor); assignment of the full corpus
    stays distributed (with_ivf_cluster).
    """
    src = df.orderBy(id_col) if id_col is not None else df
    rows = src.select(vec_col).limit(sample).collect()
    x = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    return lloyd_spherical(x, n_centroids, iters, seed)


def ivf_centroids_distributed(
    df: DataFrame,
    vec_col: str,
    n_centroids: int = 16,
    iters: int = 4,
    seed: int = LSH_SEED,
    sample: int = 2048,
    id_col: str | None = None,
) -> np.ndarray:
    """Distributed spherical k-means over the FULL corpus — the scale
    path when a bounded sample can't represent 10^9 vectors.

    Init = the deterministic-sample centroids (ivf_centroids); each
    Lloyd iteration is ONE narrow Spark pass: an Arrow-batched kernel
    assigns its batch (gemm) and emits per-(batch, cluster) PARTIAL
    unit-vector sums — so the shuffle carries n_batches x n_centroids
    skinny rows, never N x dim exploded rows — then a tiny groupBy
    reduces them and the driver renormalizes the n_centroids x dim
    result (the model state an IVF index ships anyway). Empty clusters
    keep their previous centroid. Deterministic: no RNG after init."""
    cent = ivf_centroids(
        df, vec_col, n_centroids=n_centroids, sample=sample, seed=seed, id_col=id_col
    )
    dim = cent.shape[1]
    spark = df.sparkSession
    sum_schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType(), False),
            T.StructField("n", T.LongType(), False),
            T.StructField("s", T.ArrayType(T.DoubleType()), False),
        ]
    )
    for _ in range(iters):
        c = cent.astype(np.float64)

        def partials(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
                assign = (x @ c.T).argmax(axis=1)
                rows = []
                for j in np.unique(assign):
                    m = assign == j
                    rows.append((int(j), int(m.sum()), x[m].sum(axis=0).tolist()))
                yield pd.DataFrame(rows, columns=["cluster", "n", "s"])

        agg = (
            df.select(vec_col)
            .mapInPandas(partials, schema=sum_schema)
            .groupBy("cluster")
            .agg(
                F.sum("n").alias("n"),
                *[F.sum(F.col("s")[i]).alias(f"d{i}") for i in range(dim)],
            )
            .collect()
        )
        new = cent.copy()
        for r in agg:
            v = np.array([r[f"d{i}"] for i in range(dim)], dtype=np.float64)
            nn = np.linalg.norm(v)
            if nn > 0:
                new[int(r["cluster"])] = v / nn
        cent = new
    return cent


def with_ivf_cluster(
    df: DataFrame, vec_col: str, centroids: np.ndarray, out_col: str = "cluster"
) -> DataFrame:
    """Assign each vector to its nearest centroid (Arrow-batched
    matmul — one gemm per batch, no per-row Python)."""
    cent = centroids.astype(np.float64)

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if x.size == 0:
            return pd.Series([], dtype="int32")
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series((x @ cent.T).argmax(axis=1).astype(np.int32))

    return df.withColumn(out_col, assign(F.col(vec_col)))


def ivf_cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: probe the nprobe closest centroid cells, exact cosine
    re-rank inside. At scale the cluster column is precomputed and the
    table is partitioned/bucketed by it, so the probe is a partition-
    pruned scan; here assignment runs inline."""
    if centroids is None:
        centroids = ivf_centroids(df, vec_col, n_centroids=n_centroids, id_col=id_col)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn == 0:
        raise ValueError("query vector has zero norm; cosine undefined")
    sims = centroids @ (q / qn)
    probe = [int(c) for c in np.argsort(-sims)[:nprobe]]
    cands = with_ivf_cluster(df, vec_col, centroids).filter(F.col("cluster").isin(probe))
    return _topk_by_raw_cosine(cands, id_col, vec_col, query_vec, k)


ANN_LSH_FORMAT = "ann-lsh-v1"
ANN_IVF_FORMAT = "ann-ivf-v1"


def build_ann_index(
    spark,
    df: DataFrame,
    id_col: str,
    vec_col: str,
    root: str,
    kind: str = "ivf",
    n_centroids: int = 16,
    n_planes: int = 8,
    seed: int = LSH_SEED,
    distributed_kmeans: bool = False,
    kmeans_iters: int = 4,
):
    """Persist the ANN partitioning ONCE as a catalog-managed table
    PARTITIONED BY bucket — the index artifact the inline variants
    lack. Reuses the engine's snapshot manifest (atomic CURRENT
    publish + version pinning, sources/manifest.py): the tiny model
    state (IVF centroids / LSH plane seed) rides in
    manifest.properties; the vectors land under
    data/segments/<id>/vectors/bucket=<b>/ so a probe is a
    PARTITION-PRUNED scan (only matching bucket directories are read —
    at 10^9+ vectors the non-probed cells cost zero IO)."""
    import json

    from ..sources.manifest import (
        IndexCatalog, Manifest, SegmentMeta, dir_fingerprint, table_file_lists,
    )

    catalog = IndexCatalog(root)
    dim = len(df.select(vec_col).first()[0])
    if kind == "ivf":
        if distributed_kmeans:
            centroids = ivf_centroids_distributed(
                df, vec_col, n_centroids=n_centroids, iters=kmeans_iters, seed=seed,
                id_col=id_col,
            )
        else:
            centroids = ivf_centroids(
                df, vec_col, n_centroids=n_centroids, seed=seed, id_col=id_col
            )
        assigned = with_ivf_cluster(df, vec_col, centroids, out_col="bucket")
        fmt = ANN_IVF_FORMAT
        model = {"kind": "ivf", "centroids": centroids.tolist(), "dim": dim}
        n_buckets = int(centroids.shape[0])
    elif kind == "lsh":
        planes = lsh_planes(dim, n_planes, seed=seed)
        assigned = with_lsh_bucket(df, vec_col, planes, out_col="bucket")
        fmt = ANN_LSH_FORMAT
        model = {"kind": "lsh", "n_planes": n_planes, "seed": seed, "dim": dim}
        n_buckets = 1 << n_planes
    elif kind == "pq":
        # IVFPQ (the FAISS composite): coarse IVF clusters become the
        # partition key (probe = partition-pruned scan), PQ codes ride
        # each row so the within-bucket candidate cut scores codes via
        # ADC lookups without touching the float vectors
        centroids = ivf_centroids(
            df, vec_col, n_centroids=n_centroids, seed=seed, id_col=id_col
        )
        books = pq_codebooks(
            pq_sample_matrix(df, id_col, vec_col, 2048), seed=seed
        )
        assigned = with_ivf_cluster(df, vec_col, centroids, out_col="bucket").join(
            pq_encode(df, id_col, vec_col, books), id_col
        )
        fmt = ANN_IVF_FORMAT
        model = {
            "kind": "pq", "centroids": centroids.tolist(),
            "books": books.tolist(), "dim": dim,
        }
        n_buckets = int(centroids.shape[0])
    else:
        raise ValueError(f"unknown ANN kind {kind!r}")
    version = catalog.next_version()
    segment_id = f"ann-v{version:06d}-{kind}"
    rel = catalog.new_segment_path(segment_id)
    seg_dir = os.path.join(root, rel)
    cols = [
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.col("bucket").cast("int").alias("bucket"),
    ]
    if kind == "pq":
        cols.insert(2, F.col("codes"))
    (
        assigned.select(*cols)
        .write.mode("errorifexists")
        .partitionBy("bucket")
        .parquet(os.path.join(seg_dir, "vectors"))
    )
    n = spark.read.parquet(os.path.join(seg_dir, "vectors")).count()
    seg_bytes, seg_hash = dir_fingerprint(seg_dir)
    seg = SegmentMeta(
        segment_id=segment_id, path=rel, n_docs=int(n), sum_dl=0, n_terms=0,
        n_postings=int(n), doc_min=0, doc_max=int(n), bytes=seg_bytes,
        lineage=[{"op": f"ann-build-{kind}", "n_vectors": int(n)}],
        content_hash=seg_hash,
        files=table_file_lists(seg_dir),
    )
    manifest = Manifest(
        version=version, analyzer=fmt, block_size=0, n_shards=n_buckets,
        segments=[seg],
        properties={"model": json.loads(json.dumps(model)), "id_col": id_col, "vec_col": vec_col},
    )
    return catalog.commit(manifest)


class AnnIndex:
    """Pinned-snapshot reader over a persisted ANN index: probe-bucket
    selection happens driver-side on the tiny model, the scan reads
    ONLY the matching bucket=<b> partitions (verified by
    tests/test_pipeline_ops.py: input-file pruning), exact cosine
    re-rank inside."""

    def __init__(self, spark, root: str, version: int | None = None):
        from ..sources.manifest import IndexCatalog

        self.spark = spark
        self.root = root
        self.manifest = IndexCatalog(root).load(version)
        self.model = self.manifest.properties["model"]
        seg = self.manifest.segments[0]
        self._vectors = spark.read.parquet(os.path.join(root, seg.path, "vectors"))

    def probe_buckets(self, query_vec: list[float], nprobe: int = 4, probe_hamming: int = 1) -> list[int]:
        q = np.asarray(query_vec, dtype=np.float64)
        if self.model["kind"] in ("ivf", "pq"):
            if np.linalg.norm(q) == 0:
                raise ValueError("query vector has zero norm; cosine undefined")
            cent = np.asarray(self.model["centroids"], dtype=np.float64)
            # sequential dots (no norm division — argsort-invariant):
            # the SQL oracle's ORDER BY sum-chain matches bit-for-bit
            sims = np.array([_seq_dot(c, q) for c in cent])
            return [int(c) for c in np.argsort(-sims, kind="stable")[:nprobe]]
        planes = lsh_planes(self.model["dim"], self.model["n_planes"], self.model["seed"])
        qbits = int(sum((1 << j) for j, p in enumerate(planes) if _seq_dot(p, q) > 0))
        probe = [qbits]
        if probe_hamming >= 1:
            probe += [qbits ^ (1 << j) for j in range(self.model["n_planes"])]
        if probe_hamming >= 2:
            probe += [
                qbits ^ (1 << i) ^ (1 << j)
                for i in range(self.model["n_planes"])
                for j in range(i + 1, self.model["n_planes"])
            ]
        return probe

    def scan(self, query_vec: list[float], nprobe: int = 4, probe_hamming: int = 1) -> DataFrame:
        """Partition-pruned candidate scan (no re-rank)."""
        return self._vectors.filter(
            F.col("bucket").isin(self.probe_buckets(query_vec, nprobe, probe_hamming))
        )

    def topk(
        self,
        query_vec: list[float],
        k: int,
        nprobe: int = 4,
        probe_hamming: int = 1,
        rescore: int = 0,
    ) -> DataFrame:
        """Top-k over the probed buckets. For an IVFPQ index
        (kind='pq') with rescore=C > 0, the within-bucket cut scores
        the at-rest PQ codes via Catalyst-only ADC lookups (the float
        vectors stay unread until the C-row exact re-rank); otherwise
        the probed candidates re-rank by exact cosine directly."""
        cands = self.scan(query_vec, nprobe, probe_hamming)
        if self.model["kind"] == "pq" and rescore and int(rescore) > 0:
            books = np.asarray(self.model["books"], dtype=np.float64)
            adc = cands.select("id", pq_adc_expr(books, query_vec).alias("_adc"))
            cut = adc.orderBy(F.desc("_adc"), F.asc("id")).limit(int(rescore)).select("id")
            cands = cands.select("id", "vec").join(F.broadcast(cut), "id")
        return _topk_by_raw_cosine(cands, "id", "vec", query_vec, k)


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 8,
    max_bucket: int | None = 10_000,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucketed self-join (pairs
    must share a bucket), exact cosine filter >= threshold.

    max_bucket caps the self-join's quadratic hazard: real embedding
    corpora CLUSTER, and one crowded bucket (> max_bucket vectors)
    would make the join O(bucket^2) — such buckets are dropped from
    pair GENERATION (same skew guard as dedup.lsh_candidate_pairs).
    Pass max_bucket=None for the exact uncapped join on corpora known
    to be spread, or pass `candidates` (id_a, id_b) — e.g. from a
    persisted AnnIndex probe — to skip bucket generation entirely;
    the cosine filter stays exact either way."""
    if candidates is not None:
        lv_src = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
        rv_src = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
        pairs = candidates.join(lv_src, "id_a").join(rv_src, "id_b")
        lv = F.transform(F.col("_va"), lambda x: x.cast("double"))
        rv = F.transform(F.col("_vb"), lambda x: x.cast("double"))
        return (
            pairs.select(
                "id_a", "id_b",
                F.round(_dot(lv, rv) / (_norm(lv) * _norm(rv)), 4).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )
    dim = len(df.select(vec_col).first()[0])
    planes = lsh_planes(dim, n_planes)
    b = with_lsh_bucket(df, vec_col, planes).select(id_col, vec_col, "bucket")
    if max_bucket is not None:
        from pyspark.sql import Window

        b = b.withColumn(
            "_bn", F.count(F.lit(1)).over(Window.partitionBy("bucket"))
        ).filter(F.col("_bn") <= max_bucket).drop("_bn")
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    )
    lv = F.transform(F.col(f"l.{vec_col}"), lambda x: x.cast("double"))
    rv = F.transform(F.col(f"r.{vec_col}"), lambda x: x.cast("double"))
    return (
        pairs.select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round(_dot(lv, rv) / (_norm(lv) * _norm(rv)), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    eps: float = 0.05,
    sample: int = 2048,
    iters: int = 8,
    seed: int = LSH_SEED,
    max_cluster: int | None = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication of an embedding corpus — cluster with spherical
    k-means, then within each cluster drop every vector that has a
    near-duplicate (cosine >= 1 - eps) among its cluster-mates.
    Keeper rule here is MIN-ID-deterministic: keep(v) iff no u in the
    same cluster with id(u) < id(v) and cosine(u, v) >= 1 - eps (the
    paper keeps the member closest to the centroid; min-id makes the
    output reproducible and SQL-twinnable — the kept SET differs only
    inside dup groups, which is the paper's own free choice). Returns
    one row per vector: (id, cluster, keep).

    Scale shape: centroids are driver-bounded model state (<= sample
    vectors through lloyd_spherical, deterministic by id order);
    assignment is an Arrow gemm per batch; the only join is the
    WITHIN-CLUSTER self-join, whose quadratic hazard max_cluster caps
    (clusters past the cap keep all members — at real scale raise
    n_centroids so clusters stay bounded, exactly the paper's k
    scaling). No all-pairs join anywhere."""
    if not (0.0 < eps < 1.0):
        raise ValueError("eps must be in (0, 1)")
    cent = ivf_centroids(
        df, vec_col, n_centroids, sample=sample, iters=iters, seed=seed, id_col=id_col
    )
    assigned = with_ivf_cluster(df.select(id_col, vec_col), vec_col, cent)
    pool = assigned
    if max_cluster is not None:
        from pyspark.sql import Window

        pool = assigned.withColumn(
            "_cn", F.count(F.lit(1)).over(Window.partitionBy("cluster"))
        ).filter(F.col("_cn") <= max_cluster).drop("_cn")
    a = pool.select(
        F.col(id_col).alias("_ida"), F.col(vec_col).alias("_va"), F.col("cluster")
    )
    b = pool.select(
        F.col(id_col).alias("_idb"), F.col(vec_col).alias("_vb"), F.col("cluster")
    )
    va = F.transform(F.col("_va"), lambda x: x.cast("double"))
    vb = F.transform(F.col("_vb"), lambda x: x.cast("double"))
    dup = (
        a.join(b, ["cluster"])
        .filter(F.col("_idb") < F.col("_ida"))
        .filter(_dot(va, vb) / (_norm(va) * _norm(vb)) >= 1.0 - eps)
        .select(F.col("_ida").alias(id_col))
        .distinct()
    )
    return (
        assigned.select(id_col, "cluster")
        .join(dup.withColumn("_dup", F.lit(True)), id_col, "left")
        .select(
            F.col(id_col),
            F.col("cluster").cast("long").alias("cluster"),
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the FAISS / Lucene-9-KNN code-compression
# lineage: vectors become m-byte codes, the candidate scan reads codes
# only (8 bytes/row at m=8 vs 256 bytes of f32 at dim=64), and scoring
# is an asymmetric-distance (ADC) table lookup that runs as PURE
# Catalyst expressions — no Python anywhere in the scoring scan.
# Complements the SQ (scalar int8), LSH, and IVF families above; like
# them, an exact double-cosine re-rank over the top-C candidate cut
# restores recall. Reference parity note: the reference delegates all
# scoring to Lucene (README.md:7); PQ is the quantized-KNN analogue of
# Lucene 9's vector codecs, built Spark-first.
# ---------------------------------------------------------------------------


def lloyd_l2(x: np.ndarray, n_centroids: int, iters: int, seed: int) -> np.ndarray:
    """Plain-L2 Lloyd k-means on a float64 sample — the PQ subspace
    trainer. Deterministic end-to-end: seeded init draw, argmin with
    lowest-index ties (numpy argmin), member-MEAN updates, empty
    clusters keep their previous centroid. Run twice on the same rows
    (engine sample vs oracle pyarrow read) it yields BIT-IDENTICAL
    codebooks — the same contract lloyd_spherical gives IVF."""
    x = np.asarray(x, dtype=np.float64)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)].copy()
    for _ in range(iters):
        # expanded form: argmin ||x-c||^2 == argmin (||c||^2 - 2 x.c)
        d = (cent * cent).sum(axis=1)[None, :] - 2.0 * (x @ cent.T)
        assign = d.argmin(axis=1)
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_codebooks(
    x: np.ndarray, m: int = 8, n_centroids: int = 16, iters: int = 8, seed: int = LSH_SEED
) -> np.ndarray:
    """Per-subspace L2 codebooks over UNIT-normalized vectors (PQ for
    cosine = PQ for dot over unit vectors). Input is a raw sample
    matrix so the engine (Spark-collected sample) and the DuckDB
    oracle generator (pyarrow read of the same rows) call this
    identically and get the same model. Returns (m, n_centroids,
    dim/m); dim must divide evenly by m. Seed varies per subspace so
    init draws differ across subspaces."""
    x = np.asarray(x, dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    ds = dim // m
    return np.stack(
        [
            lloyd_l2(x[:, j * ds : (j + 1) * ds], n_centroids, iters, seed + j)
            for j in range(m)
        ]
    )


def pq_sample_matrix(df: DataFrame, id_col: str, vec_col: str, sample: int) -> np.ndarray:
    """Deterministic training sample: the first `sample` rows by id
    (TakeOrdered — cheap at any corpus size), float64 matrix."""
    rows = df.orderBy(id_col).select(vec_col).limit(int(sample)).collect()
    return np.asarray([list(r[0]) for r in rows], dtype=np.float64)


def pq_encode(df: DataFrame, id_col: str, vec_col: str, books: np.ndarray) -> DataFrame:
    """Encode every vector to its m PQ codes: per subspace, argmin L2
    to the codebook over the unit-normalized vector. One Arrow-batched
    pandas_udf pass (per-batch gemm against the tiny (m, k, ds) model
    closure — the exact model state a PQ index ships to executors);
    output (id, codes array<int>) is what a persisted PQ index would
    store at rest: m small ints per vector."""
    m, _, ds = books.shape
    cn2 = (books * books).sum(axis=2)  # (m, k) — centroid norms, precomputed
    b = books

    @F.pandas_udf("array<int>")
    def _codes(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.asarray([np.asarray(e, dtype=np.float64) for e in v])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        out = np.empty((x.shape[0], m), dtype=np.int32)
        for j in range(m):
            xs = x[:, j * ds : (j + 1) * ds]
            d = cn2[j][None, :] - 2.0 * (xs @ b[j].T)
            out[:, j] = d.argmin(axis=1)
        return pd.Series([row for row in out])

    return df.select(F.col(id_col), _codes(F.col(vec_col)).alias("codes"))


def pq_adc_expr(books: np.ndarray, query_vec) -> "F.Column":
    """ADC score as a PURE Catalyst expression over a `codes` column:
    score = sum_j LUT_j[codes[j]], LUT_j[c] = dot(q_hat_sub_j, C_j[c])
    embedded as literal double arrays (m x k doubles — tiny). The
    scoring scan therefore reads ONLY the codes column and runs in
    whole-stage codegen; the float vectors are never touched until
    the exact re-rank. Terms add left-to-right in subspace order —
    mirrored verbatim by the SQL twin so float64 association
    matches."""
    m, _, ds = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    expr = None
    for j in range(m):
        lut = books[j] @ q[j * ds : (j + 1) * ds]  # (k,)
        arr = F.array(*[F.lit(float(v)) for v in lut])
        term = F.element_at(arr, F.element_at(F.col("codes"), j + 1) + F.lit(1))
        expr = term if expr is None else expr + term
    return expr


def pq_cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int,
    m: int = 8,
    n_centroids: int = 16,
    rescore: int = 0,
    sample: int = 2048,
    iters: int = 8,
    seed: int = LSH_SEED,
    books: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k by PQ/ADC, optionally re-ranked exactly.

    Pipeline: deterministic-sample codebooks -> one distributed
    encode pass (codes = m ints/vector) -> Catalyst-only ADC scan ->
    top-C candidate cut (TakeOrdered, no global sort) -> exact double
    cosine re-rank of C rows to k (broadcast the C-row candidate ids
    back onto the vector table). rescore=0 returns the ADC ranking
    itself. Ties break id asc everywhere.

    At 10^12-vector scale the encode pass runs once at index-build
    time and codes persist columnar; the per-query cost is then a
    codes-only scan (m bytes/row) + k-bounded exact work — the same
    shape as the SQ path but with 4x further compression at m=8,
    dim=64."""
    if books is None:
        books = pq_codebooks(
            pq_sample_matrix(df, id_col, vec_col, sample), m, n_centroids, iters, seed
        )
    codes = pq_encode(df, id_col, vec_col, books)
    adc = codes.select(F.col(id_col), pq_adc_expr(books, query_vec).alias("_adc"))
    if rescore and int(rescore) > 0:
        cand = adc.orderBy(F.desc("_adc"), F.asc(id_col)).limit(int(rescore)).select(id_col)
        cvecs = df.select(F.col(id_col), F.col(vec_col)).join(F.broadcast(cand), id_col)
        return _topk_by_raw_cosine(cvecs, id_col, vec_col, query_vec, int(k))
    return (
        adc.orderBy(F.desc("_adc"), F.asc(id_col))
        .limit(int(k))
        .select(F.col(id_col), F.round(F.col("_adc"), 3).alias("cosine"))
    )


def bm25_hard_triples(
    searcher,
    queries: list[tuple[str, list[str]]],
    neg_rank: int = 10,
    mode: str = "or",
) -> DataFrame:
    """DPR-style BM25-negative training triples (Karpukhin et al.
    2020 §4.2 — the "BM25 negatives" every dense-retriever recipe
    mines from a sparse index before a dense model exists): for each
    training query, positive = the top-ranked BM25 document,
    negative = the document at rank `neg_rank` — high-scoring enough
    to be hard, wrong enough to be a negative. This is the
    index-as-data-factory composition: one `search_batch` job (ONE
    termdict seek for the whole query set, per-query top-k kernels
    in the same plan) followed by a per-query window bounded by
    neg_rank rows.

    queries: [(query_id, [terms...])]. Returns (query_id, pos_doc,
    pos_score, neg_doc, neg_score), scores rounded to 3 (the gate
    convention). Queries with fewer than neg_rank hits cannot form a
    triple and drop (the standard mining rule). The embedding-side
    sibling is hard_negatives (cosine space); this one needs no
    vectors at all."""
    if int(neg_rank) < 2:
        raise ValueError(f"neg_rank must be >= 2, got {neg_rank}")
    if not queries:
        raise ValueError("queries must be non-empty")
    hits = searcher.search_batch(
        [
            {"query_id": qid, "terms": list(terms), "k": int(neg_rank), "mode": mode}
            for qid, terms in queries
        ]
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc"))
    ranked = hits.withColumn("_rn", F.row_number().over(w))
    pos = ranked.filter(F.col("_rn") == 1).select(
        "query_id",
        F.col("doc").alias("pos_doc"),
        F.round(F.col("score").cast("double"), 3).alias("pos_score"),
    )
    neg = ranked.filter(F.col("_rn") == int(neg_rank)).select(
        "query_id",
        F.col("doc").alias("neg_doc"),
        F.round(F.col("score").cast("double"), 3).alias("neg_score"),
    )
    return pos.join(neg, "query_id")
