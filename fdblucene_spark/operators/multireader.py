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

Surface scope: the single-field search family (or/and/phrase),
count, and the full composable BooleanQuery surface (search_boolean:
mixed occurs, min_should_match, boosts, phrases, arbitrary-depth
nested sub-queries, dismax, numeric doc-values ranges, external
allow-lists, searchAfter) — the same clause dicts as Searcher, scored
with combined stats via a stats facade into the shared _boolean_spec
compiler, so results are (doc, score)-identical to the union index.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .query import (
    HIT_SCHEMA,
    Searcher,
    _score_shard,
    _score_shard_boolean,
    _split_aux,
)


class _CombinedManifest:
    """MultiReader's merged leaf statistics: docCount / avgdl come
    from SUMS across sub-indexes; store_positions holds only if every
    leaf stored positions (a phrase needs them everywhere)."""

    def __init__(self, searchers):
        self._s = searchers
        self.properties = {
            "store_positions": all(
                s.manifest.properties.get("store_positions", True)
                for s in searchers
            )
        }

    def n_docs_for(self, field: str) -> int:
        return sum(s.manifest.n_docs_for(field) for s in self._s)

    def avgdl_for(self, field: str) -> float:
        nd = self.n_docs_for(field)
        if not nd:
            return 0.0
        return sum(s.manifest.sum_dl_for(field) for s in self._s) / nd


class _StatsFacade:
    """Duck-typed stand-in for a Searcher inside _boolean_spec: the
    clause compiler only touches term_stats_multi and three manifest
    reads, all of which combine across leaves by summation."""

    def __init__(self, searchers):
        self._s = searchers
        self.manifest = _CombinedManifest(searchers)

    def term_stats_multi(self, fields_terms):
        out: dict[tuple[str, str], tuple[int, int]] = {}
        for s in self._s:
            for key, (d, t) in s.term_stats_multi(fields_terms).items():
                pd_, pt = out.get(key, (0, 0))
                out[key] = (pd_ + int(d), pt + int(t))
        return out

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

    # -------------------------------------------------------------- boolean
    def search_boolean(
        self,
        clauses: list[dict],
        k: int,
        min_should_match: int | None = None,
        numeric: list[dict] | None = None,
        allowed_docs: DataFrame | None = None,
        after: tuple[float, int] | None = None,
        dismax_tie: float | None = None,
    ) -> DataFrame:
        """Federated composable BooleanQuery — Searcher.search_boolean's
        full clause surface (mixed occurs, msm, boosts, phrases,
        arbitrary-depth nesting, dismax, numeric doc-values ranges,
        external allow-lists, searchAfter) over all sub-indexes with
        MultiReader-combined stats. The clause compiler
        (Searcher._boolean_spec) runs against a stats facade whose
        term_stats_multi / docCount / avgdl sum across leaves, so the
        kernel spec — idf weights, norms, msm thresholds — is exactly
        the union index's; evaluation cogroups per (src, shard) like
        search(). numeric ranges evaluate against EACH leaf's own
        stored table (leaf-local docs); external allowed_docs carry
        global ids (bases subtracted per leaf when set)."""
        facade = _StatsFacade(self.searchers)
        res = Searcher._boolean_spec(
            facade, clauses, k, min_should_match,
            extra_constraint=bool(numeric or allowed_docs is not None),
            after=after, dismax_tie=dismax_tie, allow_delegate=False,
        )
        if res["spec"] is None:
            return self.spark.createDataFrame([], HIT_SCHEMA)
        spec, by_field_terms, stats = res["spec"], res["by_field_terms"], res["stats"]
        bases = self.bases
        kk = int(k)

        aux_parts, allow_kinds = [], None
        for i, s in enumerate(self.searchers):
            allowed_i = allowed_docs
            if allowed_docs is not None and bases is not None:
                b = int(bases[i])
                allowed_i = allowed_docs.select(
                    (F.col("doc") - F.lit(b)).alias("doc")
                ).filter(F.col("doc") >= 0)
            aux_i, kinds_i = s._aux_frames(numeric, allowed_i)
            if allow_kinds is None:
                allow_kinds = kinds_i
            if aux_i is not None:
                aux_parts.append(aux_i.withColumn("src", F.lit(i)))
        aux = None
        if aux_parts:
            aux = aux_parts[0]
            for p in aux_parts[1:]:
                aux = aux.unionByName(p)
        kinds = allow_kinds or []

        def kernel(key, pdf: pd.DataFrame, aux_pdf: pd.DataFrame) -> pd.DataFrame:
            by_field = {
                f: {t: g for t, g in sub.groupby("term", sort=False)}
                for f, sub in pdf.groupby("field", sort=False)
            }
            dels, allowed = _split_aux(
                aux_pdf if aux_pdf is not None and len(aux_pdf) else None, kinds
            )
            hits = _score_shard_boolean(by_field, spec, dels, allowed)
            if bases is not None and len(hits):
                hits = hits.assign(doc=hits["doc"] + int(bases[int(key[0])]))
            return hits

        pred = F.lit(False)
        for f, ts in by_field_terms.items():
            if any((f, t) in stats for t in ts):
                pred = pred | (
                    (F.col("field") == f)
                    & F.col("term").isin([t for t in ts if (f, t) in stats])
                )
        cols = self.searchers[0]._postings.columns
        parts = [
            s._postings.filter(pred).select(*cols).withColumn("src", F.lit(i))
            for i, s in enumerate(self.searchers)
        ]
        scan = parts[0]
        for p in parts[1:]:
            scan = scan.unionByName(p)
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
