"""Federated multi-index search — Lucene MultiReader parity.

Lucene opens several indexes as ONE logical reader
(`new MultiReader(r1, r2, ...)`; the reference app would reach it
through the same Lucene delegation as every read surface,
/root/reference/README.md:54-57) and searches them with COMBINED
collection statistics: docFreq / docCount / sumTotalTermFreq sum
across sub-readers, so BM25 idf and avgdl are corpus-wide even though
no byte of index data is rewritten. This module is that zero-copy
logical union for Searcher indexes — the deployment shape a 10^12-turn
corpus actually wants: build per-partition indexes (per month, per
source, per tenant) independently and in parallel, then search them
federated, no add_indexes rewrite in the hot path.

Semantics:
- scores are computed with summed (df, n_docs, sum_dl) — identical to
  physically merging the indexes with add_indexes and searching the
  result (pinned by tests/test_multireader.py rank+score identity);
- each sub-index keeps its own tombstones (deletes stay sub-index-
  local, like Lucene liveDocs per leaf);
- doc spaces must be disjoint. Indexes built with doc_col carry their
  external ids (disjoint by construction when the corpus key is);
  dense key_cols indexes pass `bases` — the Lucene docBase offsets —
  applied to OUTPUT docIDs only (kernels work sub-index-local).

Scale shape: ONE job; each sub-index contributes its term-pruned,
Parquet-pushdown postings scan, the union cogroups per (src, shard)
so every kernel invocation sees exactly one sub-index shard (block-max
pruning stays valid — theta bounds are per-group), and the global
TakeOrdered merges the per-group top-k. Adding a sub-index adds its
scan sliver, nothing else; no cross-index shuffle of postings ever
happens.

Surface scope: the single-field search family (or/and/phrase) and
count — the reference's own exercised search surface. The composable
BooleanQuery path would federate the same way (combined stats into
_boolean_spec + the (src, shard) cogroup); that seam is deliberate,
not structural.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .query import (
    AUX_DEL,
    HIT_SCHEMA,
    Searcher,
    _score_shard,
    _split_aux,
)

_SCAN_COLS = [
    "shard", "term", "docs", "tfs", "dlqs",
    "min_doc", "max_doc", "max_tf", "min_dlq",
]


class MultiSearcher:
    """Search several Searcher indexes as one (Lucene MultiReader)."""

    def __init__(
        self,
        spark: SparkSession,
        roots: list[str],
        bases: list[int] | None = None,
    ):
        if not roots:
            raise ValueError("MultiSearcher needs at least one index root")
        self.spark = spark
        self.searchers = [Searcher(spark, r) for r in roots]
        if bases is not None and len(bases) != len(roots):
            raise ValueError("bases must align with roots")
        self.bases = bases
        pins = {s.manifest.analyzer for s in self.searchers}
        if len(pins) > 1:
            # S2 analogue: Lucene MultiReader trusts you to have used
            # one analysis chain; we enforce the pin like append does
            raise ValueError(f"analyzer pins differ across indexes: {sorted(pins)}")

    # ------------------------------------------------------- combined stats
    def _combined(self, terms: list[str], field: str):
        df: dict[str, int] = {}
        for s in self.searchers:
            for (f, t), (d, _ttf) in s.term_stats_multi({field: terms}).items():
                df[t] = df.get(t, 0) + int(d)
        n_docs = sum(s.manifest.n_docs_for(field) for s in self.searchers)
        sum_dl = sum(s.manifest.sum_dl_for(field) for s in self.searchers)
        avgdl = (sum_dl / n_docs) if n_docs else 0.0
        return df, n_docs, avgdl

    def _union_scan(self, terms: list[str], field: str, mode: str) -> DataFrame:
        cols = list(_SCAN_COLS) + (["positions"] if mode == "phrase" else [])
        parts = []
        for i, s in enumerate(self.searchers):
            parts.append(
                s._postings.filter(
                    (F.col("field") == field) & F.col("term").isin(terms)
                )
                .select(*cols)
                .withColumn("src", F.lit(i))
            )
        scan = parts[0]
        for p in parts[1:]:
            scan = scan.unionByName(p)
        return scan

    def _union_aux(self) -> DataFrame | None:
        parts = []
        for i, s in enumerate(self.searchers):
            aux, _ = s._aux_frames(None, None)
            if aux is not None:
                parts.append(aux.withColumn("src", F.lit(i)))
        if not parts:
            return None
        aux = parts[0]
        for p in parts[1:]:
            aux = aux.unionByName(p)
        return aux

    # ---------------------------------------------------------------- search
    def search(
        self,
        terms: list[str],
        k: int,
        mode: str = "or",
        field: str = "text",
    ) -> DataFrame:
        """Top-k (doc, score) across all sub-indexes, BM25 with
        MultiReader-combined stats; ties doc asc. mode: or/and/phrase
        (phrase keeps the user token order, as Searcher.search)."""
        if mode not in ("or", "and", "phrase"):
            raise ValueError("mode must be 'or', 'and', or 'phrase'")
        uniq = sorted(set(terms))
        term_df, n_docs, avgdl = self._combined(uniq, field)
        # AND/phrase semantics hold corpus-wide: a term present in ANY
        # sub-index is present in the union
        if not term_df or (mode in ("and", "phrase") and len(term_df) < len(uniq)):
            return self.spark.createDataFrame([], HIT_SCHEMA)
        if mode == "phrase":
            for s in self.searchers:
                if not s.manifest.properties.get("store_positions", True):
                    raise ValueError(
                        "a sub-index was built without positions; "
                        "phrase queries unavailable"
                    )
        kt = list(terms) if mode == "phrase" else list(term_df)
        bases = self.bases
        kk = int(k)

        def kernel(key, pdf: pd.DataFrame, aux_pdf: pd.DataFrame) -> pd.DataFrame:
            groups = {t: g for t, g in pdf.groupby("term", sort=False)}
            dels, _ = _split_aux(
                aux_pdf if aux_pdf is not None and len(aux_pdf) else None, []
            )
            hits = _score_shard(
                groups, term_df, n_docs, avgdl, kk, mode, kt, dels, None
            )
            if bases is not None and len(hits):
                hits = hits.assign(doc=hits["doc"] + int(bases[int(key[0])]))
            return hits

        scan = self._union_scan(list(term_df) + (kt if mode == "phrase" else []),
                                field, mode)
        aux = self._union_aux()
        if aux is None:
            hits = scan.groupBy("src", "shard").applyInPandas(
                lambda key, pdf: kernel(key, pdf, None), schema=HIT_SCHEMA
            )
        else:
            hits = (
                scan.groupBy("src", "shard")
                .cogroup(aux.groupBy("src", "shard"))
                .applyInPandas(kernel, schema=HIT_SCHEMA)
            )
        return hits.orderBy(F.desc("score"), F.asc("doc")).limit(kk)

    def count(self, terms: list[str], mode: str = "or", field: str = "text") -> int:
        """Union totalHits: sub-index counts sum (doc spaces are
        disjoint) — one count job per sub-index, each kernel-side."""
        return sum(s.count(terms, mode=mode, field=field) for s in self.searchers)
