"""Search: term lookup, Boolean evaluation, BM25 block-max top-k.

Spark re-expression of the reference search path (IndexSearcher +
TermQuery + TopDocs over FDB-paged segments; trace in SURVEY.md
section 3.2). Plan shape per query:

  pinned manifest  ->  termdict lookup (tiny, driver)      [S23, L11]
  postings scan: filter(term isin q) — Parquet pushdown,
     row-group min/max pruning on the sorted term column   [L11]
  applyInPandas per shard: numpy kernel — decode blocks,
     block-max prune, score, local top-k heap              [L12-L16]
  global orderBy(score desc, doc asc).limit(k)             [L15]
  optional semi-join back to the base table                [L10]

The kernel implements safe block-max pruning (the WAND bound): block
B of term t is skippable iff ub_t(B) + sum_{t'!=t} max_ub(t') < theta,
where theta is a lower bound on the k-th best score (seeded by solo-
scoring the highest-impact term). A pruned block provably contains no
true top-k doc, and every true top-k doc retains its exact score —
see functions/bm25.max_block_score for the bound's monotonicity
argument. Scores are Lucene-8-exact (rank-identical contract,
BASELINE.json north_rule).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import bm25, codec
from ..sources.manifest import IndexCatalog, Manifest

HIT_SCHEMA = T.StructType(
    [
        T.StructField("doc", T.LongType(), False),
        T.StructField("score", T.FloatType(), False),
    ]
)


def _decode_block_rows(rows: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode docs/tfs/dlqs of a set of block rows -> flat arrays."""
    docs = [codec.decode_doc_block(b) for b in rows["docs"]]
    tfs = [codec.decode_tf_block(b) for b in rows["tfs"]]
    dlqs = [np.frombuffer(b, dtype=np.uint8).astype(np.int64) for b in rows["dlqs"]]
    cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, dtype=np.int64)  # noqa: E731
    return cat(docs), cat(tfs), cat(dlqs)


def _kernel_factory(
    term_df: dict[str, int],
    n_docs: int,
    avgdl: float,
    k: int,
    mode: str,
    q_terms: list[str],
):
    """Build the per-shard scoring kernel (closure ships tiny stats)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame({"doc": pd.Series(dtype="int64"), "score": pd.Series(dtype="float32")})
        groups = {t: g for t, g in pdf.groupby("term", sort=False)}
        present = [t for t in q_terms if t in groups]
        if mode in ("and", "phrase") and len(present) < len(q_terms):
            return pd.DataFrame({"doc": pd.Series(dtype="int64"), "score": pd.Series(dtype="float32")})
        if not present:
            return pd.DataFrame({"doc": pd.Series(dtype="int64"), "score": pd.Series(dtype="float32")})

        weights = {
            t: np.float32(bm25.idf(float(term_df[t]), n_docs)) for t in present
        }
        ubs = {
            t: bm25.max_block_score(
                groups[t]["max_tf"].to_numpy(np.int64),
                groups[t]["min_dlq"].to_numpy(np.int64),
                np.full(len(groups[t]), term_df[t], dtype=np.float64),
                n_docs,
                avgdl,
            )
            for t in present
        }
        mub = {t: float(ubs[t].max()) for t in present}

        decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}  # term -> (docs, score32)

        def decode_and_score(t: str, rows: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
            d, tf, dlq = _decode_block_rows(rows)
            s = (weights[t] * bm25.tf_norm(tf, dlq, avgdl)).astype(np.float32)
            return d, s

        if mode == "or":
            # theta seed: solo-score the term with the highest block bound
            seed = max(present, key=lambda t: mub[t])
            d, s = decode_and_score(seed, groups[seed])
            decoded[seed] = (d, s)
            theta = float(np.partition(s, s.size - k)[s.size - k]) if s.size >= k else 0.0
            for t in present:
                if t == seed:
                    continue
                others = sum(mub[t2] for t2 in present if t2 != t)
                keep = ubs[t].astype(np.float64) + others >= theta
                decoded[t] = decode_and_score(t, groups[t].iloc[np.flatnonzero(keep)])
        else:
            # AND/phrase: decode rarest term first, then range+membership
            # pruning for the rest (sorted-merge intersection, L12)
            order = sorted(present, key=lambda t: term_df[t])
            rare = order[0]
            d0, s0 = decode_and_score(rare, groups[rare])
            decoded[rare] = (d0, s0)
            cand = d0
            for t in order[1:]:
                rows = groups[t]
                if cand.size == 0:
                    decoded[t] = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
                    continue
                keep = (rows["max_doc"].to_numpy() >= cand.min()) & (
                    rows["min_doc"].to_numpy() <= cand.max()
                )
                d, s = decode_and_score(t, rows.iloc[np.flatnonzero(keep)])
                m = np.isin(d, cand, assume_unique=True)
                decoded[t] = (d[m], s[m])
                cand = np.intersect1d(cand, d[m], assume_unique=True)

        # accumulate: float64 sum of float32 per-term scores (Lucene
        # DisjunctionSumScorer), then cast to float32
        all_docs = np.concatenate([decoded[t][0] for t in present])
        if all_docs.size == 0:
            return pd.DataFrame({"doc": pd.Series(dtype="int64"), "score": pd.Series(dtype="float32")})
        uniq, inv = np.unique(all_docs, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        hits = np.zeros(uniq.size, dtype=np.int64)
        off = 0
        for t in present:
            d, s = decoded[t]
            idx = inv[off : off + d.size]
            acc[idx] += s.astype(np.float64)
            hits[idx] += 1
            off += d.size
        if mode in ("and", "phrase"):
            sel = hits == len(present)
            uniq, acc = uniq[sel], acc[sel]
        if mode == "phrase":
            uniq, acc = _phrase_filter(pdf, present, q_terms, uniq, acc)
        score32 = acc.astype(np.float32)
        if uniq.size > k:
            # local heap top-k: keep k best by (score desc, doc asc)
            order_idx = np.lexsort((uniq, -score32))[:k]
            uniq, score32 = uniq[order_idx], score32[order_idx]
        return pd.DataFrame({"doc": uniq.astype(np.int64), "score": score32})

    return kernel


def _phrase_filter(
    pdf: pd.DataFrame,
    present: list[str],
    q_terms: list[str],
    cand: np.ndarray,
    acc: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Keep candidates where q_terms occur at consecutive positions."""
    if cand.size == 0:
        return cand, acc
    # per term: doc -> positions set (only candidate docs decoded)
    pos_maps: list[dict[int, np.ndarray]] = []
    for t in q_terms:
        rows = pdf[pdf["term"] == t]
        mp: dict[int, np.ndarray] = {}
        for _, r in rows.iterrows():
            d = codec.decode_doc_block(r["docs"])
            sel = np.isin(d, cand, assume_unique=True)
            if not sel.any():
                continue
            tf = codec.decode_tf_block(r["tfs"])
            flat, starts = codec.decode_positions_block(r["positions"], tf)
            idxs = np.flatnonzero(sel)
            for i in idxs:
                s = int(starts[i])
                mp[int(d[i])] = flat[s : s + int(tf[i])]
        pos_maps.append(mp)
    keep = np.zeros(cand.size, dtype=bool)
    for j, dc in enumerate(cand):
        dc = int(dc)
        starts = set((pos_maps[0].get(dc, np.empty(0))).tolist())
        for off in range(1, len(q_terms)):
            nxt = pos_maps[off].get(dc)
            if nxt is None:
                starts = set()
                break
            starts &= {int(p) - off for p in nxt}
            if not starts:
                break
        keep[j] = bool(starts)
    return cand[keep], acc[keep]


class Searcher:
    """Pinned-snapshot searcher over one index root."""

    def __init__(self, spark: SparkSession, root: str, version: int | None = None):
        self.spark = spark
        self.catalog = IndexCatalog(root)
        self.manifest: Manifest = self.catalog.load(version)  # snapshot pin (S23)
        self.n_docs = self.manifest.n_docs
        self.avgdl = self.manifest.avgdl
        self._postings = spark.read.parquet(
            *self.manifest.segment_paths(root, "postings")
        )
        self._termdict = spark.read.parquet(
            *self.manifest.segment_paths(root, "termdict")
        )

    def term_stats(self, terms: Iterable[str]) -> dict[str, tuple[int, int]]:
        """term -> (df, ttf) summed across segments (tiny collect)."""
        rows = (
            self._termdict.filter(F.col("term").isin(list(terms)))
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
            .collect()
        )
        return {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}

    def search(self, terms: list[str], k: int, mode: str = "or") -> DataFrame:
        """Top-k hits as a DataFrame (doc, score), globally ordered."""
        q_terms = sorted(set(terms))
        stats = self.term_stats(q_terms)
        present = [t for t in q_terms if t in stats]
        empty = self.spark.createDataFrame([], HIT_SCHEMA)
        if not present:
            return empty
        if mode in ("and", "phrase") and len(present) < len(q_terms):
            return empty  # a missing conjunct can never match
        if mode == "phrase" and not self.manifest.properties.get("store_positions", True):
            raise ValueError("index built without positions; phrase queries unavailable")
        term_df = {t: stats[t][0] for t in present}
        kernel = _kernel_factory(
            term_df, self.n_docs, self.avgdl, k, mode, q_terms if mode == "phrase" else present
        )
        scan = self._postings.filter(F.col("term").isin(present))
        hits = scan.groupBy("shard").applyInPandas(kernel, schema=HIT_SCHEMA)
        return hits.orderBy(F.desc("score"), F.asc("doc")).limit(k)

    def count(self, terms: list[str], mode: str = "or") -> int:
        """totalHits (reference: SimpleFDBDirectoryTest.java:155)."""
        n = max(self.n_docs, 1)
        return self.search(terms, k=n, mode=mode).count()

    def fetch(self, hits: DataFrame, base: DataFrame, doc_col: str) -> DataFrame:
        """Stored-field retrieval: broadcast semi-join of top-k docIDs
        back to the base table (L10; reference reader.document)."""
        return base.join(
            F.broadcast(hits), base[doc_col] == hits["doc"], "inner"
        ).drop("doc")
