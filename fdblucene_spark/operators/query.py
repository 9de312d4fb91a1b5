"""Search: term lookup, Boolean evaluation, BM25 block-max top-k.

Spark re-expression of the reference search path (IndexSearcher +
TermQuery + TopDocs over FDB-paged segments; trace in SURVEY.md
section 3.2). Plan shape per query:

  pinned manifest  ->  termdict lookup — driver-side pyarrow scan
     with pushdown, the analogue of Lucene's term-dictionary seek
     (tiny IO; no Spark job)                               [S23, L11]
  postings scan: filter(term isin q) — Parquet pushdown,
     row-group min/max pruning on the term-sorted files    [L11]
  applyInPandas per shard: numpy kernel — decode blocks,
     block-max prune, score, local top-k heap              [L12-L16]
  global orderBy(score desc, doc asc).limit(k)             [L15]
  optional semi-join back to the base table                [L10]

`search_batch` evaluates a whole query SET in one Spark job (the
shard kernel loops queries over the already-grouped blocks), which
amortizes scheduling overhead — the shape a real query service uses.

The kernel implements safe block-max pruning (the WAND bound),
LOCALIZED per block: block B of term t is skippable iff
ub_t(B) + sum_{t'!=t} (max_ub(t') if t' has any block whose docID
range overlaps B's, else 0) < theta, where theta is a lower bound on
the k-th best score (seeded by solo-scoring the highest-impact term).
The locality is what makes pruning fire: with a global other-term
bound, theta (which comes from single-term scores) can never exceed
it. A pruned block provably contains no true top-k doc — a doc in B
can only receive t' contributions if t' overlaps B's range — and
every surviving top-k doc keeps its exact score (bound monotonicity:
functions/bm25.max_block_score). Scores are Lucene-8-exact — the
rank-identical contract (BASELINE.json north_rule).
"""

from __future__ import annotations

import os
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
from pyspark.sql import DataFrame, SparkSession, Window
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

BATCH_HIT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType(), False),
        T.StructField("doc", T.LongType(), False),
        T.StructField("score", T.FloatType(), False),
    ]
)

_EMPTY = pd.DataFrame({"doc": pd.Series(dtype="int64"), "score": pd.Series(dtype="float32")})


def _decode_block_rows(rows: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    docs = [codec.decode_doc_block(b) for b in rows["docs"]]
    tfs = [codec.decode_tf_block(b) for b in rows["tfs"]]
    dlqs = [np.frombuffer(b, dtype=np.uint8).astype(np.int64) for b in rows["dlqs"]]
    cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, dtype=np.int64)  # noqa: E731
    return cat(docs), cat(tfs), cat(dlqs)


def _score_shard(
    groups: dict[str, pd.DataFrame],
    term_df: dict[str, int],
    n_docs: int,
    avgdl: float,
    k: int,
    mode: str,
    q_terms: list[str],
    deleted: np.ndarray | None = None,
    not_terms: list[str] | None = None,
    stats_out: dict | None = None,
) -> pd.DataFrame:
    """Score one query against one shard's blocks. Pure numpy.

    q_terms: scoring terms, or for mode='phrase' the phrase token
    sequence in user order (duplicates allowed — scoring always uses
    the deduplicated set, matching BooleanQuery-of-unique-terms).
    not_terms: MUST_NOT clauses — matching docs are excluded and never
    scored (Lucene BooleanClause.Occur.MUST_NOT; the docID-set EXCEPT
    of SURVEY.md section 2.7). Exclusion happens inside decode (like
    liveDocs) so theta seeding and top-k bounds stay safe."""
    uniq_terms = list(dict.fromkeys(q_terms))
    present = [t for t in uniq_terms if t in groups]
    if not present or (mode in ("and", "phrase") and len(present) < len(uniq_terms)):
        return _EMPTY
    weights = {t: np.float32(bm25.idf(float(term_df[t]), n_docs)) for t in present}
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
    if stats_out is not None:
        stats_out["blocks_total"] = stats_out.get("blocks_total", 0) + sum(
            len(groups[t]) for t in present
        )
    decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    excluded = deleted
    if not_terms:
        ex_parts = [] if excluded is None or not excluded.size else [excluded]
        for nt in not_terms:
            rows = groups.get(nt)
            if rows is not None:
                ex_parts.append(_decode_block_rows(rows)[0])
        if ex_parts:
            excluded = np.unique(np.concatenate(ex_parts))

    def decode_and_score(t: str, rows: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        if stats_out is not None:
            stats_out["blocks_decoded"] = stats_out.get("blocks_decoded", 0) + len(rows)
        d, tf, dlq = _decode_block_rows(rows)
        if excluded is not None and excluded.size and d.size:
            # liveDocs/MUST_NOT mask BEFORE theta seeding / top-k: an
            # excluded doc must neither rank nor inflate the bound
            live = ~np.isin(d, excluded)
            d, tf, dlq = d[live], tf[live], dlq[live]
        s = (weights[t] * bm25.tf_norm(tf, dlq, avgdl)).astype(np.float32)
        return d, s

    if mode == "or":
        seed = max(present, key=lambda t: mub[t])
        d, s = decode_and_score(seed, groups[seed])
        decoded[seed] = (d, s)
        theta = float(np.partition(s, s.size - k)[s.size - k]) if s.size >= k else 0.0
        # block-max WAND bound, localized per block: another term can
        # contribute to docs in block b ONLY if it has a block whose
        # docID range overlaps b's. UB(b) = ub_t(b) + sum over other
        # terms of (their max block ub if they overlap b's range else
        # 0). A global other-term bound can never prune (theta is
        # seeded from single-term scores <= that bound); the localized
        # one prunes every head-term block outside the rare terms'
        # ranges. Overlap test: blocks sorted by min_doc + running max
        # of max_doc (ranges may interleave across shards/segments).
        ranges = {}
        for t in present:
            lo = groups[t]["min_doc"].to_numpy(np.int64)
            hi = groups[t]["max_doc"].to_numpy(np.int64)
            o = np.argsort(lo, kind="mergesort")
            ranges[t] = (lo[o], np.maximum.accumulate(hi[o]))
        for t in present:
            if t == seed:
                continue
            lo_b = groups[t]["min_doc"].to_numpy(np.int64)
            hi_b = groups[t]["max_doc"].to_numpy(np.int64)
            add = np.zeros(len(lo_b), dtype=np.float64)
            for t2 in present:
                if t2 == t:
                    continue
                lo2, cummax_hi2 = ranges[t2]
                i1 = np.searchsorted(lo2, hi_b, side="right")
                overlaps = (i1 > 0) & (cummax_hi2[np.maximum(i1 - 1, 0)] >= lo_b)
                add = add + np.where(overlaps, mub[t2], 0.0)
            keep = ubs[t].astype(np.float64) + add >= theta
            decoded[t] = decode_and_score(t, groups[t].iloc[np.flatnonzero(keep)])
    else:
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

    all_docs = np.concatenate([decoded[t][0] for t in present])
    if all_docs.size == 0:
        return _EMPTY
    uniq, inv = np.unique(all_docs, return_inverse=True)
    acc = np.zeros(uniq.size, dtype=np.float64)
    hits = np.zeros(uniq.size, dtype=np.int64)
    off = 0
    for t in present:
        d, s = decoded[t]
        idx = inv[off : off + d.size]
        acc[idx] += s.astype(np.float64)  # float64 sum of float32 addends
        hits[idx] += 1
        off += d.size
    if mode in ("and", "phrase"):
        sel = hits == len(present)
        uniq, acc = uniq[sel], acc[sel]
    if mode == "phrase":
        uniq, acc = _phrase_filter(groups, q_terms, uniq, acc)
    score32 = acc.astype(np.float32)
    if uniq.size > k:
        idx = np.lexsort((uniq, -score32))[:k]  # local heap top-k
        uniq, score32 = uniq[idx], score32[idx]
    return pd.DataFrame({"doc": uniq.astype(np.int64), "score": score32})


def _phrase_filter(
    groups: dict[str, pd.DataFrame],
    q_terms: list[str],
    cand: np.ndarray,
    acc: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Keep candidates where q_terms occur at consecutive positions (L17)."""
    if cand.size == 0:
        return cand, acc
    pos_maps: list[dict[int, np.ndarray]] = []
    for t in q_terms:
        mp: dict[int, np.ndarray] = {}
        rows = groups.get(t)
        if rows is not None:
            for _, r in rows.iterrows():
                d = codec.decode_doc_block(r["docs"])
                sel = np.isin(d, cand, assume_unique=True)
                if not sel.any():
                    continue
                tf = codec.decode_tf_block(r["tfs"])
                flat, starts = codec.decode_positions_block(r["positions"], tf)
                for i in np.flatnonzero(sel):
                    s = int(starts[i])
                    mp[int(d[i])] = flat[s : s + int(tf[i])]
        pos_maps.append(mp)
    keep = np.zeros(cand.size, dtype=bool)
    for j, dc in enumerate(cand):
        dc = int(dc)
        starts = set(pos_maps[0].get(dc, np.empty(0)).tolist())
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
    """Pinned-snapshot searcher over one index root (S23 analogue)."""

    def __init__(self, spark: SparkSession, root: str, version: int | None = None):
        self.spark = spark
        self.root = root
        self.catalog = IndexCatalog(root)
        self.manifest: Manifest = self.catalog.load(version)  # snapshot pin
        self.n_docs = self.manifest.n_docs
        self.avgdl = self.manifest.avgdl
        self._postings = spark.read.parquet(
            *self.manifest.segment_paths(root, "postings")
        )
        self._td_files: list[str] = []
        for p in self.manifest.segment_paths(root, "termdict"):
            self._td_files.extend(
                os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
            )
        # liveDocs: the snapshot's delete list, shipped to kernels so
        # deleted docs neither rank nor affect pruning bounds (L21).
        # Stats (df/ttf/avgdl) still include deleted docs until a
        # repack merge applies them physically — Lucene semantics.
        self.deleted: "np.ndarray | None" = None
        rel = self.manifest.properties.get("deletes_path")
        if rel:
            import pyarrow.parquet as pq

            self.deleted = (
                pq.read_table(os.path.join(root, rel), columns=["doc"])["doc"]
                .to_numpy()
                .astype(np.int64)
            )

    def term_stats(self, terms: Iterable[str], field: str = "text") -> dict[str, tuple[int, int]]:
        """(field, term) -> (df, ttf) across segments. Driver-side
        pyarrow scan with predicate pushdown — the term-dictionary seek
        (L11); the termdict is orders of magnitude smaller than
        postings and this avoids a Spark job per query. (On a cluster
        the same files are on shared storage; pyarrow reads them
        equally well.)"""
        terms = list(terms)
        if not terms:
            return {}
        dset = pads.dataset(self._td_files, format="parquet")
        flt = pads.field("term").isin(terms) & (pads.field("field") == field)
        tbl = dset.to_table(filter=flt)
        if tbl.num_rows == 0:
            return {}
        pdf = tbl.to_pandas().groupby("term", sort=False)[["df", "ttf"]].sum()
        return {t: (int(r["df"]), int(r["ttf"])) for t, r in pdf.iterrows()}

    def _prep(self, terms: list[str], mode: str, field: str = "text"):
        uniq = sorted(set(terms))
        stats = self.term_stats(uniq, field=field)
        present = [t for t in uniq if t in stats]
        if not present or (mode in ("and", "phrase") and len(present) < len(uniq)):
            return None
        if mode == "phrase" and not self.manifest.properties.get("store_positions", True):
            raise ValueError("index built without positions; phrase queries unavailable")
        return uniq, {t: stats[t][0] for t in present}

    def search(
        self,
        terms: list[str],
        k: int,
        mode: str = "or",
        field: str = "text",
        not_terms: list[str] | None = None,
    ) -> DataFrame:
        """Top-k hits as a DataFrame (doc, score), globally ordered.

        not_terms: MUST_NOT clauses (same field) — matching docs are
        excluded without contributing score."""
        prep = self._prep(terms, mode, field)
        if prep is None:
            return self.spark.createDataFrame([], HIT_SCHEMA)
        _, term_df = prep
        n_docs = self.manifest.n_docs_for(field)
        avgdl = self.manifest.avgdl_for(field)
        deleted = self.deleted
        nts = sorted(set(not_terms)) if not_terms else []
        # phrase keeps the user-given token sequence (order + repeats
        # define the phrase); other modes use the deduplicated set
        kt = list(terms) if mode == "phrase" else list(term_df)

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            groups = {t: g for t, g in pdf.groupby("term", sort=False)}
            return _score_shard(groups, term_df, n_docs, avgdl, k, mode, kt, deleted, nts)

        scan = self._postings.filter(
            (F.col("field") == field) & F.col("term").isin(list(term_df) + nts)
        )
        hits = scan.groupBy("shard").applyInPandas(kernel, schema=HIT_SCHEMA)
        return hits.orderBy(F.desc("score"), F.asc("doc")).limit(k)

    def search_batch(self, queries: list[dict]) -> DataFrame:
        """Evaluate many queries in one job. queries: [{query_id, terms,
        k, mode}]. Returns (query_id, doc, score) with per-query top-k,
        ordered within each query by (score desc, doc asc)."""
        specs = []
        all_terms: set[str] = set()
        all_fields: set[str] = set()
        for q in queries:
            mode = q.get("mode", "or")
            field = q.get("field", "text")
            prep = self._prep(list(q["terms"]), mode, field)
            if prep is None:
                continue
            _, term_df = prep
            nts = sorted(set(q.get("not_terms") or []))
            specs.append(
                {
                    "query_id": q["query_id"],
                    "k": int(q["k"]),
                    "mode": mode,
                    "field": field,
                    "q_terms": list(q["terms"]) if mode == "phrase" else list(term_df),
                    "term_df": term_df,
                    "n_docs": self.manifest.n_docs_for(field),
                    "avgdl": self.manifest.avgdl_for(field),
                    "not_terms": nts,
                }
            )
            all_terms.update(term_df)
            all_terms.update(nts)
            all_fields.add(field)
        if not specs:
            return self.spark.createDataFrame([], BATCH_HIT_SCHEMA)
        deleted = self.deleted

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            by_field = {
                f: {t: g for t, g in sub.groupby("term", sort=False)}
                for f, sub in pdf.groupby("field", sort=False)
            }
            outs = []
            for sp in specs:
                groups = by_field.get(sp["field"], {})
                r = _score_shard(
                    groups, sp["term_df"], sp["n_docs"], sp["avgdl"], sp["k"], sp["mode"],
                    sp["q_terms"], deleted, sp["not_terms"],
                )
                if len(r):
                    r = r.copy()
                    r.insert(0, "query_id", sp["query_id"])
                    outs.append(r)
            if not outs:
                return pd.DataFrame(
                    {"query_id": pd.Series(dtype="str"), "doc": pd.Series(dtype="int64"),
                     "score": pd.Series(dtype="float32")}
                )
            return pd.concat(outs, ignore_index=True)

        scan = self._postings.filter(
            F.col("field").isin(sorted(all_fields)) & F.col("term").isin(sorted(all_terms))
        )
        hits = scan.groupBy("shard").applyInPandas(kernel, schema=BATCH_HIT_SCHEMA)
        ks = {sp["query_id"]: sp["k"] for sp in specs}
        k_df = F.create_map(*[F.lit(x) for kv in ks.items() for x in kv])
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc"))
        return (
            hits.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k_df[F.col("query_id")])
            .drop("rn")
            .orderBy("query_id", F.desc("score"), F.asc("doc"))
        )

    def postings(self, terms: list[str], field: str = "text") -> DataFrame:
        """Decode stored posting blocks for `terms` -> (term, doc, tf).

        The inspection/export surface of the logical postings relation
        (reference: ("pm", field, term, docID) -> freq, DATA.md:53) —
        also the correctness probe that exercises codec + storage
        round-trip end-to-end."""
        scan = self._postings.filter(
            (F.col("field") == field) & F.col("term").isin(list(set(terms)))
        )

        def dec(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                outs = []
                for _, r in pdf.iterrows():
                    d = codec.decode_doc_block(r["docs"])
                    tf = codec.decode_tf_block(r["tfs"])
                    outs.append(pd.DataFrame({"term": r["term"], "doc": d, "tf": tf}))
                yield pd.concat(outs, ignore_index=True)

        schema = T.StructType(
            [
                T.StructField("term", T.StringType(), False),
                T.StructField("doc", T.LongType(), False),
                T.StructField("tf", T.LongType(), False),
            ]
        )
        return scan.mapInPandas(dec, schema=schema)

    def search_local(
        self,
        terms: list[str],
        k: int,
        mode: str = "or",
        field: str = "text",
        not_terms: list[str] | None = None,
    ) -> pd.DataFrame:
        """Low-latency single-query path: same segment files, same
        scoring kernel, but the (pushdown-pruned) block scan and the
        numpy kernel run in the driver process — no Spark job at all.

        This is the shape of a query-service node (the reference's
        single-process IndexSearcher): a query touches O(query terms)
        blocks, so the data volume is tiny even when the index is not.
        Results are identical to search() (same _score_shard kernel,
        shard grouping is irrelevant when all blocks are in one frame).
        """
        prep = self._prep(terms, mode, field)
        if prep is None:
            return pd.DataFrame({"doc": pd.Series(dtype="int64"), "score": pd.Series(dtype="float32")})
        _, term_df = prep
        nts = sorted(set(not_terms)) if not_terms else []
        files = []
        for p in self.manifest.segment_paths(self.root, "postings"):
            files.extend(os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet"))
        dset = pads.dataset(files, format="parquet")
        flt = (pads.field("field") == field) & pads.field("term").isin(list(term_df) + nts)
        pdf = dset.to_table(filter=flt).to_pandas()
        groups = {t: g for t, g in pdf.groupby("term", sort=False)}
        kt = list(terms) if mode == "phrase" else list(term_df)
        hits = _score_shard(
            groups, term_df, self.manifest.n_docs_for(field),
            self.manifest.avgdl_for(field), k, mode, kt, self.deleted, nts,
        )
        hits = hits.sort_values(["score", "doc"], ascending=[False, True], kind="mergesort")
        return hits.head(k).reset_index(drop=True)

    def profile_local(
        self, terms: list[str], k: int, mode: str = "or", field: str = "text"
    ) -> dict:
        """Run the driver-local query and report block-max pruning
        effectiveness: candidate blocks vs blocks actually decoded
        (the observable footprint of the WAND bound)."""
        prep = self._prep(terms, mode, field)
        if prep is None:
            return {"blocks_total": 0, "blocks_decoded": 0, "hits": 0}
        _, term_df = prep
        files = []
        for p in self.manifest.segment_paths(self.root, "postings"):
            files.extend(os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet"))
        dset = pads.dataset(files, format="parquet")
        flt = (pads.field("field") == field) & pads.field("term").isin(list(term_df))
        pdf = dset.to_table(filter=flt).to_pandas()
        stats: dict = {}
        kt = list(terms) if mode == "phrase" else list(term_df)
        # per-shard like the distributed kernel, so theta/pruning match
        hits_n = 0
        for _, sub in pdf.groupby("shard", sort=False):
            groups = {t: g for t, g in sub.groupby("term", sort=False)}
            r = _score_shard(
                groups, term_df, self.manifest.n_docs_for(field),
                self.manifest.avgdl_for(field), k, mode, kt, self.deleted,
                None, stats,
            )
            hits_n += len(r)
        stats.setdefault("blocks_total", 0)
        stats.setdefault("blocks_decoded", 0)
        stats["blocks_pruned"] = stats["blocks_total"] - stats["blocks_decoded"]
        stats["hits"] = hits_n
        return stats

    def count(self, terms: list[str], mode: str = "or", field: str = "text") -> int:
        """totalHits (reference: SimpleFDBDirectoryTest.java:155)."""
        n = max(self.n_docs, 1)
        return self.search(terms, k=n, mode=mode, field=field).count()

    def fetch(self, hits: DataFrame, base: DataFrame, doc_col: str) -> DataFrame:
        """Stored-field retrieval: broadcast semi-join of top-k docIDs
        back to the base table (L10; reference reader.document)."""
        return base.join(F.broadcast(hits), base[doc_col] == hits["doc"], "inner").drop("doc")
