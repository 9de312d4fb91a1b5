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

Deletes and doc-set filters (numeric doc-values ranges, external
allow-lists) flow into the kernels as a COGROUPED per-shard side
input (shard = doc % n_shards, so each kernel sees exactly its docs'
tombstones/allow rows) — never as a driver-pickled array, so a
billion tombstones at 100 TB stream through the same shuffle
machinery as the postings themselves. In-kernel membership tests are
sorted-array searchsorted probes, O(n log m).

`search_batch` evaluates a whole query SET in one Spark job (the
shard kernel loops queries over the already-grouped blocks), which
amortizes scheduling overhead — the shape a real query service uses.

`search_boolean` is the composable surface (Lucene BooleanQuery
semantics): per-clause occur = must | should | filter | must_not
across any indexed field, plus minimum_should_match and numeric
doc-values range predicates applied BEFORE scoring — the reference's
own combined query shape (README.md:54-57 numeric range + sort next
to text search; SimpleFDBDirectoryTest.java:153,202-207 keyword
TermQuery beside text fields).

The single-field kernel implements safe block-max pruning (the WAND
bound), LOCALIZED per block: block B of term t is skippable iff
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

COUNT_SCHEMA = T.StructType([T.StructField("n", T.LongType(), False)])

AUX_DEL = "del"

_EMPTY = pd.DataFrame({"doc": pd.Series(dtype="int64"), "score": pd.Series(dtype="float32")})


def _sorted_probe(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Boolean mask: vals[i] in sorted_arr (searchsorted, O(n log m))."""
    idx = np.searchsorted(sorted_arr, vals)
    ok = idx < sorted_arr.size
    hit = np.zeros(vals.size, dtype=bool)
    if ok.any():
        hit[ok] = sorted_arr[idx[ok]] == vals[ok]
    return hit


def _split_aux(
    aux: pd.DataFrame | None, allow_kinds: list[str]
) -> tuple[np.ndarray | None, np.ndarray | None]:
    """Per-shard aux rows (doc, kind) -> (deleted_sorted, allowed_sorted).

    allowed semantics: None = unconstrained; empty = nothing allowed in
    this shard (each expected allow kind intersects — a kind with zero
    rows in the shard genuinely allows nothing here, because allow
    rows are co-sharded with the docs they reference)."""
    dels: np.ndarray | None = None
    if aux is not None and len(aux):
        d = aux.loc[aux["kind"] == AUX_DEL, "doc"].to_numpy(np.int64)
        if d.size:
            dels = np.unique(d)
    allowed: np.ndarray | None = None
    for kind in allow_kinds:
        if aux is not None and len(aux):
            a = np.unique(aux.loc[aux["kind"] == kind, "doc"].to_numpy(np.int64))
        else:
            a = np.empty(0, dtype=np.int64)
        allowed = a if allowed is None else np.intersect1d(allowed, a, assume_unique=True)
    return dels, allowed


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
    allowed: np.ndarray | None = None,
    after: tuple[float, int] | None = None,
    dismax_tie: float | None = None,
) -> pd.DataFrame:
    """Score one query against one shard's blocks. Pure numpy.

    q_terms: scoring terms, or for mode='phrase' the phrase token
    sequence in user order (duplicates allowed — scoring always uses
    the deduplicated set, matching BooleanQuery-of-unique-terms).
    not_terms: MUST_NOT clauses — matching docs are excluded and never
    scored (Lucene BooleanClause.Occur.MUST_NOT; the docID-set EXCEPT
    of SURVEY.md section 2.7). Exclusion happens inside decode (like
    liveDocs) so theta seeding and top-k bounds stay safe.
    deleted: SORTED unique docIDs to exclude (liveDocs complement).
    allowed: SORTED unique docIDs a hit must belong to (None = all);
    applied inside decode, before theta seeding, like deletes.
    after: (score, doc) searchAfter cursor — keep only hits STRICTLY
    after it in (score desc, doc asc) order. Block-max pruning is
    disabled for cursor queries: theta would have to be seeded from
    docs whose FINAL score passes the cut, which single-term scores
    cannot witness, so no safe non-trivial bound exists pre-summation.
    dismax_tie: DisjunctionMaxQuery scoring — per-doc score becomes
    max + tie * (sum - max) instead of the disjunction sum (or mode
    only). The WAND bound stays SAFE: a solo term score lower-bounds
    the dismax total (>= max >= solo) for theta seeding, and the sum
    upper-bound dominates dismax for tie <= 1."""
    if allowed is not None and allowed.size == 0:
        return _EMPTY
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
            live = ~_sorted_probe(excluded, d)
            d, tf, dlq = d[live], tf[live], dlq[live]
        if allowed is not None and d.size:
            m = _sorted_probe(allowed, d)
            d, tf, dlq = d[m], tf[m], dlq[m]
        s = (weights[t] * bm25.tf_norm(tf, dlq, avgdl)).astype(np.float32)
        return d, s

    if mode == "or":
        seed = max(present, key=lambda t: mub[t])
        d, s = decode_and_score(seed, groups[seed])
        decoded[seed] = (d, s)
        theta = (
            float(np.partition(s, s.size - k)[s.size - k])
            if (s.size >= k and after is None)
            else 0.0
        )
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
    mx = np.zeros(uniq.size, dtype=np.float64)
    hits = np.zeros(uniq.size, dtype=np.int64)
    off = 0
    for t in present:
        d, s = decoded[t]
        idx = inv[off : off + d.size]
        s64 = s.astype(np.float64)
        acc[idx] += s64  # float64 sum of float32 addends
        if dismax_tie is not None:
            np.maximum.at(mx, idx, s64)
        hits[idx] += 1
        off += d.size
    if dismax_tie is not None:
        acc = mx + float(dismax_tie) * (acc - mx)
    if mode in ("and", "phrase"):
        sel = hits == len(present)
        uniq, acc = uniq[sel], acc[sel]
    if mode == "phrase":
        uniq, acc = _phrase_filter(groups, q_terms, uniq, acc)
    score32 = acc.astype(np.float32)
    if after is not None:
        a_s, a_d = np.float32(after[0]), int(after[1])
        keep = (score32 < a_s) | ((score32 == a_s) & (uniq > a_d))
        uniq, score32 = uniq[keep], score32[keep]
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
    """Keep candidates where q_terms occur at consecutive positions (L17).

    Vectorized position-adjacency: per phrase slot, every candidate
    (doc, position) pair is packed into one int64 key (doc << shift |
    pos) and sorted; slot i+1 survival is a single searchsorted probe
    of `starts + 1` — no per-document Python loop, so a high-df phrase
    costs O(P log P) numpy, not O(docs) interpreter time."""
    if cand.size == 0:
        return cand, acc
    # pass 1: gather (doc, pos) arrays per phrase slot, candidates only
    slot_docs: list[np.ndarray] = []
    slot_pos: list[np.ndarray] = []
    max_pos = 0
    for t in q_terms:
        dparts: list[np.ndarray] = []
        pparts: list[np.ndarray] = []
        rows = groups.get(t)
        if rows is not None:
            for _, r in rows.iterrows():  # per block; heavy work vectorized
                d = codec.decode_doc_block(r["docs"])
                sel_mask = np.isin(d, cand, assume_unique=True)
                if not sel_mask.any():
                    continue
                tf = codec.decode_tf_block(r["tfs"])
                flat, starts_arr = codec.decode_positions_block(r["positions"], tf)
                sel = np.flatnonzero(sel_mask)
                lens = tf[sel]
                total = int(lens.sum())
                csum = np.cumsum(lens) - lens
                gather = np.repeat(starts_arr[sel], lens) + (
                    np.arange(total, dtype=np.int64) - np.repeat(csum, lens)
                )
                dparts.append(np.repeat(d[sel], lens))
                pparts.append(flat[gather])
        dd = np.concatenate(dparts) if dparts else np.empty(0, dtype=np.int64)
        pp = np.concatenate(pparts) if pparts else np.empty(0, dtype=np.int64)
        if pp.size:
            max_pos = max(max_pos, int(pp.max()))
        slot_docs.append(dd)
        slot_pos.append(pp)
    # pass 2: pack keys with a shift wide enough for max_pos + phrase len
    shift = max(21, int(max_pos + len(q_terms)).bit_length() + 1)
    keys = []
    for dd, pp in zip(slot_docs, slot_pos):
        kk = (dd << shift) | pp
        kk.sort()
        keys.append(kk)
    starts = keys[0]
    for off in range(1, len(q_terms)):
        if starts.size == 0:
            break
        starts = starts[_sorted_probe(keys[off], starts + off)]
    docs_hit = np.unique(starts >> shift) if starts.size else np.empty(0, dtype=np.int64)
    keep = np.isin(cand, docs_hit, assume_unique=True)
    return cand[keep], acc[keep]


def _match_shard(
    groups: dict[str, pd.DataFrame],
    mode: str,
    q_terms: list[str],
    deleted: np.ndarray | None,
) -> np.ndarray:
    """Matched docIDs for one shard — no scores (L22/L19 helper)."""
    empty = np.empty(0, dtype=np.int64)
    uniq_terms = list(dict.fromkeys(q_terms))
    present = [t for t in uniq_terms if t in groups]
    if not present or (mode in ("and", "phrase") and len(present) < len(uniq_terms)):
        return empty

    def docs_of(t: str) -> np.ndarray:
        return np.unique(_decode_block_rows(groups[t])[0])

    if mode == "or":
        cand = np.unique(np.concatenate([docs_of(t) for t in present]))
    else:
        order = sorted(present, key=lambda t: len(groups[t]))
        cand = docs_of(order[0])
        for t in order[1:]:
            if cand.size == 0:
                return empty
            cand = np.intersect1d(cand, docs_of(t), assume_unique=True)
    if deleted is not None and deleted.size and cand.size:
        cand = cand[~_sorted_probe(deleted, cand)]
    if mode == "phrase" and cand.size:
        cand, _ = _phrase_filter(groups, q_terms, cand, np.zeros(cand.size))
    return cand


def _count_shard(
    groups: dict[str, pd.DataFrame],
    mode: str,
    q_terms: list[str],
    deleted: np.ndarray | None,
) -> int:
    """totalHits for one shard: matched-doc set cardinality, no scores,
    no hit materialization (L22)."""
    return int(_match_shard(groups, mode, q_terms, deleted).size)


OCCURS = ("must", "should", "filter", "must_not")


def _score_shard_boolean(
    by_field: dict[str, dict[str, pd.DataFrame]],
    spec: dict,
    deleted: np.ndarray | None,
    allowed: np.ndarray | None,
) -> pd.DataFrame:
    """Mixed-occur Boolean evaluation for one shard (BooleanQuery).

    spec: {"must"/"should"/"filter"/"must_not": [(field, term, w32,
    avgdl)], "k": int, "msm": int}. Scoring clauses are must+should;
    filter/must_not gate membership without contributing score.
    A doc's postings for every field live in ONE shard (shard =
    doc % n_shards), so per-shard evaluation is exact."""
    if allowed is not None and allowed.size == 0:
        return _EMPTY
    k, msm = spec["k"], spec["msm"]

    def rows_of(f: str, t: str) -> pd.DataFrame | None:
        return by_field.get(f, {}).get(t)

    # excluded = deletes U must_not matches
    ex_parts = [deleted] if deleted is not None and deleted.size else []
    for f, t, _, _ in spec["must_not"]:
        rows = rows_of(f, t)
        if rows is not None:
            ex_parts.append(_decode_block_rows(rows)[0])
    excluded = np.unique(np.concatenate(ex_parts)) if ex_parts else None

    def live_docs(f: str, t: str) -> np.ndarray:
        rows = rows_of(f, t)
        if rows is None:
            return np.empty(0, dtype=np.int64)
        d = np.unique(_decode_block_rows(rows)[0])
        if excluded is not None and d.size:
            d = d[~_sorted_probe(excluded, d)]
        return d

    # candidate narrowing: allowed ∩ filters ∩ musts (rare-first)
    cand = allowed  # sorted unique or None
    for f, t, _, _ in spec["filter"]:
        d = live_docs(f, t)
        cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
        if cand.size == 0:
            return _EMPTY

    def decode_scored(f, t, w, avgdl, restrict):
        rows = rows_of(f, t)
        if rows is None:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        if restrict is not None and restrict.size:
            keep = (rows["max_doc"].to_numpy() >= restrict[0]) & (
                rows["min_doc"].to_numpy() <= restrict[-1]
            )
            rows = rows.iloc[np.flatnonzero(keep)]
        d, tf, dlq = _decode_block_rows(rows)
        if excluded is not None and excluded.size and d.size:
            live = ~_sorted_probe(excluded, d)
            d, tf, dlq = d[live], tf[live], dlq[live]
        if restrict is not None and d.size:
            m = _sorted_probe(restrict, d)
            d, tf, dlq = d[m], tf[m], dlq[m]
        s = (w * bm25.tf_norm(tf, dlq, avgdl)).astype(np.float32)
        return d, s

    must_data = []
    for f, t, w, avgdl in spec["must"]:
        d, s = decode_scored(f, t, w, avgdl, cand)
        must_data.append((d, s))
        du = np.sort(d)
        cand = du if cand is None else np.intersect1d(cand, du, assume_unique=True)
        if cand.size == 0:
            return _EMPTY

    should_data = [
        decode_scored(f, t, w, avgdl, cand) for f, t, w, avgdl in spec["should"]
    ]

    if cand is not None:
        acc = np.zeros(cand.size, dtype=np.float64)
        should_hits = np.zeros(cand.size, dtype=np.int64)
        for d, s in must_data:
            m = _sorted_probe(cand, d)
            pos = np.searchsorted(cand, d[m])
            acc[pos] += s[m].astype(np.float64)
        for d, s in should_data:
            pos = np.searchsorted(cand, d)  # already restricted to cand
            acc[pos] += s.astype(np.float64)
            should_hits[pos] += 1
        sel = should_hits >= msm
        uniq, total = cand[sel], acc[sel]
    else:
        # pure-should disjunction (+ minimum_should_match)
        if not should_data:
            return _EMPTY
        all_docs = np.concatenate([d for d, _ in should_data])
        if all_docs.size == 0:
            return _EMPTY
        uniq, inv = np.unique(all_docs, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        hits = np.zeros(uniq.size, dtype=np.int64)
        off = 0
        for d, s in should_data:
            idx = inv[off : off + d.size]
            acc[idx] += s.astype(np.float64)
            hits[idx] += 1
            off += d.size
        sel = hits >= max(msm, 1)
        uniq, total = uniq[sel], acc[sel]
    score32 = total.astype(np.float32)
    if uniq.size > k:
        idx = np.lexsort((uniq, -score32))[:k]
        uniq, score32 = uniq[idx], score32[idx]
    return pd.DataFrame({"doc": uniq.astype(np.int64), "score": score32})


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
        self._deleted_cache: np.ndarray | None = None

    # ---------------------------------------------------------- side inputs
    @property
    def deleted(self) -> np.ndarray | None:
        """SORTED delete list for the DRIVER-LOCAL paths only
        (search_local / profile_local — a query-service node holds its
        tombstones in memory like Lucene's liveDocs). The distributed
        kernels never touch this: deletes reach them per-shard via
        _aux_frames, so nothing index-sized is driver-materialized."""
        rel = self.manifest.properties.get("deletes_path")
        if not rel:
            return None
        if self._deleted_cache is None:
            import pyarrow.parquet as pq

            arr = (
                pq.read_table(os.path.join(self.root, rel), columns=["doc"])["doc"]
                .to_numpy()
                .astype(np.int64)
            )
            arr.sort()
            self._deleted_cache = arr
        return self._deleted_cache

    def _stored_df(self) -> DataFrame:
        paths = [
            p
            for p in self.manifest.segment_paths(self.root, "stored")
            if os.path.isdir(p)
        ]
        if not paths:
            raise ValueError(
                "index has no stored/doc-values table; build with stored_fields=..."
            )
        return self.spark.read.parquet(*paths)

    def _aux_frames(
        self,
        numeric: list[dict] | None = None,
        allowed_docs: DataFrame | None = None,
    ) -> tuple[DataFrame | None, list[str]]:
        """Per-shard side input for the kernels: (shard, doc, kind).

        kind='del' rows are the snapshot's tombstones; each allow kind
        is one doc-set constraint a hit must satisfy (numeric
        doc-values conjunction, external allow-list). Everything stays
        a DataFrame — the shuffle co-locates aux rows with the
        postings shard that owns those docs."""
        ns = self.manifest.n_shards
        parts: list[DataFrame] = []
        kinds: list[str] = []
        rel = self.manifest.properties.get("deletes_path")
        if rel:
            dels = self.spark.read.parquet(os.path.join(self.root, rel))
            parts.append(
                dels.select(
                    F.pmod(F.col("doc"), F.lit(ns)).cast("int").alias("shard"),
                    F.col("doc").cast("long").alias("doc"),
                    F.lit(AUX_DEL).alias("kind"),
                )
            )
        if numeric:
            dv = self._stored_df()
            pred = F.lit(True)
            for cl in numeric:
                c = F.col(cl["field"])
                if cl.get("lo") is not None:
                    pred = pred & (c >= F.lit(cl["lo"]))
                if cl.get("hi") is not None:
                    pred = pred & (c <= F.lit(cl["hi"]))
            parts.append(
                dv.filter(pred).select(
                    "shard", F.col("doc").cast("long").alias("doc"), F.lit("allow_dv").alias("kind")
                )
            )
            kinds.append("allow_dv")
        if allowed_docs is not None:
            parts.append(
                allowed_docs.select(
                    F.pmod(F.col("doc"), F.lit(ns)).cast("int").alias("shard"),
                    F.col("doc").cast("long").alias("doc"),
                    F.lit("allow_ext").alias("kind"),
                )
            )
            kinds.append("allow_ext")
        if not parts:
            return None, []
        aux = parts[0]
        for p in parts[1:]:
            aux = aux.unionByName(p)
        return aux, kinds

    def _apply_kernel(self, scan: DataFrame, kernel_fn, schema, aux: DataFrame | None):
        """groupBy(shard).applyInPandas, cogrouping the aux side input
        when one exists. kernel_fn(postings_pdf, aux_pdf_or_None)."""
        if aux is None:
            return scan.groupBy("shard").applyInPandas(
                lambda pdf: kernel_fn(pdf, None), schema=schema
            )
        return (
            scan.groupBy("shard")
            .cogroup(aux.groupBy("shard"))
            .applyInPandas(lambda left, right: kernel_fn(left, right), schema=schema)
        )

    # ------------------------------------------------------------- term seek
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

    # ----------------------------------------------------------------- search
    def search(
        self,
        terms: list[str],
        k: int,
        mode: str = "or",
        field: str = "text",
        not_terms: list[str] | None = None,
        numeric: list[dict] | None = None,
        allowed_docs: DataFrame | None = None,
        after: tuple[float, int] | None = None,
        dismax_tie: float | None = None,
    ) -> DataFrame:
        """Top-k hits as a DataFrame (doc, score), globally ordered.

        not_terms: MUST_NOT clauses (same field) — matching docs are
        excluded without contributing score.
        numeric: doc-values range predicates applied before scoring,
        [{field, lo, hi}] over the index's stored table (L18 inside
        the same query — reference README.md:54-57).
        allowed_docs: external allow-list DataFrame with a `doc`
        column; hits must belong to it.
        after: searchAfter cursor (score, doc) of the previous page's
        last hit — returns the next k strictly after it (Lucene
        IndexSearcher.searchAfter). Disables block-max pruning (no
        safe pre-summation bound exists for a final-score cut).
        dismax_tie: score hits as DisjunctionMaxQuery with this
        tie-breaker (max + tie * (sum - max)); mode must be 'or'."""
        if dismax_tie is not None and mode != "or":
            raise ValueError("dismax_tie requires mode='or'")
        prep = self._prep(terms, mode, field)
        if prep is None:
            return self.spark.createDataFrame([], HIT_SCHEMA)
        _, term_df = prep
        n_docs = self.manifest.n_docs_for(field)
        avgdl = self.manifest.avgdl_for(field)
        nts = sorted(set(not_terms)) if not_terms else []
        # phrase keeps the user-given token sequence (order + repeats
        # define the phrase); other modes use the deduplicated set
        kt = list(terms) if mode == "phrase" else list(term_df)
        aux, allow_kinds = self._aux_frames(numeric, allowed_docs)

        def kernel(pdf: pd.DataFrame, aux_pdf: pd.DataFrame | None) -> pd.DataFrame:
            groups = {t: g for t, g in pdf.groupby("term", sort=False)}
            dels, allowed = _split_aux(aux_pdf, allow_kinds)
            return _score_shard(
                groups, term_df, n_docs, avgdl, k, mode, kt, dels, nts,
                allowed=allowed, after=after, dismax_tie=dismax_tie,
            )

        scan = self._postings.filter(
            (F.col("field") == field) & F.col("term").isin(list(term_df) + nts)
        )
        hits = self._apply_kernel(scan, kernel, HIT_SCHEMA, aux)
        return hits.orderBy(F.desc("score"), F.asc("doc")).limit(k)

    def expand_terms(
        self,
        field: str = "text",
        prefix: str | None = None,
        fuzzy: str | None = None,
        max_edits: int = 2,
        max_expansions: int = 50,
    ) -> list[str]:
        """MultiTermQuery expansion (Lucene PrefixQuery / FuzzyQuery
        term enumeration) as a DISTRIBUTED termdict job: startsWith
        pushes down to the Parquet scan; levenshtein is JVM codegen —
        no driver-side vocabulary materialization, so a 10^8-term
        dictionary expands fine. Selection = top `max_expansions` by
        (df desc, term asc), Lucene's top-terms rewrite cap.

        Note: edit distance is classic Levenshtein (Spark/DuckDB
        built-in), NOT Lucene's Damerau variant — transpositions count
        as 2 edits here; documented divergence."""
        td = self.spark.read.parquet(
            *self.manifest.segment_paths(self.root, "termdict")
        ).filter(F.col("field") == field)
        if prefix is not None:
            td = td.filter(F.col("term").startswith(prefix))
        if fuzzy is not None:
            td = td.filter(
                F.length("term").between(len(fuzzy) - max_edits, len(fuzzy) + max_edits)
                & (F.levenshtein(F.col("term"), F.lit(fuzzy)) <= max_edits)
            )
        rows = (
            td.groupBy("term")
            .agg(F.sum("df").alias("df"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .collect()
        )
        return [r["term"] for r in rows]

    def search_prefix(
        self, prefix: str, k: int, field: str = "text", max_expansions: int = 50, **kw
    ) -> DataFrame:
        """PrefixQuery under SCORING_BOOLEAN_REWRITE: expand against
        the term dictionary, then one BM25 disjunction over the
        expansions (WAND-pruned or-path)."""
        terms = self.expand_terms(field, prefix=prefix, max_expansions=max_expansions)
        if not terms:
            return self.spark.createDataFrame([], HIT_SCHEMA)
        return self.search(terms, k, mode="or", field=field, **kw)

    def search_fuzzy(
        self,
        term: str,
        k: int,
        field: str = "text",
        max_edits: int = 2,
        max_expansions: int = 50,
        **kw,
    ) -> DataFrame:
        """FuzzyQuery under SCORING_BOOLEAN_REWRITE (edit distance
        <= max_edits, exact term included at distance 0)."""
        terms = self.expand_terms(
            field, fuzzy=term, max_edits=max_edits, max_expansions=max_expansions
        )
        if not terms:
            return self.spark.createDataFrame([], HIT_SCHEMA)
        return self.search(terms, k, mode="or", field=field, **kw)

    def search_boolean(
        self,
        clauses: list[dict],
        k: int,
        min_should_match: int | None = None,
        numeric: list[dict] | None = None,
        allowed_docs: DataFrame | None = None,
    ) -> DataFrame:
        """Composable BooleanQuery (the reference's combined surface):
        clauses = [{field, term, occur}] with occur in must | should |
        filter | must_not, mixed freely across text and keyword fields,
        plus numeric doc-values ranges — all evaluated in ONE query,
        scores = float64 sum of the float32 per-clause BM25 scores of
        matched must+should clauses (filter/must_not score nothing).

        min_should_match: default Lucene semantics — 0 when any
        must/filter/numeric constraint exists, else 1."""
        norm: dict[str, list] = {o: [] for o in OCCURS}
        for c in clauses:
            occ = c.get("occur", "should")
            if occ not in OCCURS:
                raise ValueError(f"unknown occur {occ!r}")
            norm[occ].append((c.get("field", "text"), c["term"]))
        has_constraint = bool(
            norm["must"] or norm["filter"] or numeric or allowed_docs is not None
        )
        msm = min_should_match if min_should_match is not None else (0 if has_constraint else 1)

        # pure-disjunction special case: a SHOULD-only single-field
        # query with msm<=1 IS the or-mode query — route it through the
        # block-max WAND kernel (the boolean kernel cannot prune, the
        # or kernel prunes ~97% of head-term blocks)
        if not has_constraint and msm <= 1 and norm["should"]:
            fields = {f for f, _ in norm["should"]}
            if len(fields) == 1:
                fld = next(iter(fields))
                nts = [t for f, t in norm["must_not"] if f == fld]
                if len(nts) == len(norm["must_not"]):
                    return self.search(
                        [t for _, t in norm["should"]], k, mode="or", field=fld,
                        not_terms=nts or None,
                    )

        # per-field term stats (driver-side termdict seeks)
        by_field_terms: dict[str, set[str]] = {}
        for occ in OCCURS:
            for f, t in norm[occ]:
                by_field_terms.setdefault(f, set()).add(t)
        stats: dict[tuple[str, str], tuple[int, int]] = {}
        for f, ts in by_field_terms.items():
            for t, st in self.term_stats(sorted(ts), field=f).items():
                stats[(f, t)] = st

        def scored(entries):
            out = []
            for f, t in entries:
                st = stats.get((f, t))
                if st is None:
                    out.append(None)
                    continue
                w = np.float32(bm25.idf(float(st[0]), self.manifest.n_docs_for(f)))
                out.append((f, t, w, self.manifest.avgdl_for(f)))
            return out

        must = scored(norm["must"])
        if any(m is None for m in must):  # a must term absent from the corpus
            return self.spark.createDataFrame([], HIT_SCHEMA)
        filters = [s for s in scored(norm["filter"]) if s is not None]
        if len(filters) < len(norm["filter"]):  # a filter term absent
            return self.spark.createDataFrame([], HIT_SCHEMA)
        should = [s for s in scored(norm["should"]) if s is not None]
        mnot = [(f, t, np.float32(0.0), 1.0) for f, t in norm["must_not"] if (f, t) in stats]
        if msm > len(should):
            return self.spark.createDataFrame([], HIT_SCHEMA)
        if not must and not filters and not should and numeric is None and allowed_docs is None:
            return self.spark.createDataFrame([], HIT_SCHEMA)
        spec = {"must": must, "should": should, "filter": filters, "must_not": mnot,
                "k": int(k), "msm": int(msm)}
        aux, allow_kinds = self._aux_frames(numeric, allowed_docs)

        def kernel(pdf: pd.DataFrame, aux_pdf: pd.DataFrame | None) -> pd.DataFrame:
            by_field = {
                f: {t: g for t, g in sub.groupby("term", sort=False)}
                for f, sub in pdf.groupby("field", sort=False)
            }
            dels, allowed = _split_aux(aux_pdf, allow_kinds)
            return _score_shard_boolean(by_field, spec, dels, allowed)

        pred = F.lit(False)
        for f, ts in by_field_terms.items():
            if any((f, t) in stats for t in ts):
                pred = pred | (
                    (F.col("field") == f)
                    & F.col("term").isin([t for t in ts if (f, t) in stats])
                )
        scan = self._postings.filter(pred)
        hits = self._apply_kernel(scan, kernel, HIT_SCHEMA, aux)
        return hits.orderBy(F.desc("score"), F.asc("doc")).limit(k)

    def search_boolean_batch(self, queries: list[dict]) -> DataFrame:
        """Batched composable queries in ONE Spark job (the boolean
        analogue of search_batch): queries = [{query_id, clauses, k,
        min_should_match?}]. Numeric/allowed_docs filters are
        per-snapshot, not per-query — use search_boolean for those.
        Returns (query_id, doc, score), per-query top-k ordered."""
        specs = []
        fields_terms: dict[str, set[str]] = {}
        for q in queries:
            norm: dict[str, list] = {o: [] for o in OCCURS}
            for c in q["clauses"]:
                occ = c.get("occur", "should")
                if occ not in OCCURS:
                    raise ValueError(f"unknown occur {occ!r}")
                norm[occ].append((c.get("field", "text"), c["term"]))
            has_constraint = bool(norm["must"] or norm["filter"])
            msm = q.get("min_should_match")
            msm = msm if msm is not None else (0 if has_constraint else 1)
            need: dict[str, set[str]] = {}
            for occ in OCCURS:
                for f, t in norm[occ]:
                    need.setdefault(f, set()).add(t)
            stats: dict[tuple[str, str], tuple[int, int]] = {}
            for f, ts in need.items():
                for t, st in self.term_stats(sorted(ts), field=f).items():
                    stats[(f, t)] = st

            def scored(entries):
                out = []
                for f, t in entries:
                    st = stats.get((f, t))
                    if st is None:
                        out.append(None)
                        continue
                    w = np.float32(bm25.idf(float(st[0]), self.manifest.n_docs_for(f)))
                    out.append((f, t, w, self.manifest.avgdl_for(f)))
                return out

            must = scored(norm["must"])
            filters = [s for s in scored(norm["filter"]) if s is not None]
            should = [s for s in scored(norm["should"]) if s is not None]
            mnot = [(f, t, np.float32(0.0), 1.0) for f, t in norm["must_not"] if (f, t) in stats]
            if (
                any(m is None for m in must)
                or len(filters) < len(norm["filter"])
                or msm > len(should)
                or (not must and not filters and not should)
            ):
                continue  # provably-empty query: skip entirely
            specs.append(
                {"query_id": q["query_id"], "must": must, "should": should,
                 "filter": filters, "must_not": mnot, "k": int(q["k"]), "msm": int(msm)}
            )
            for (f, t), _ in stats.items():
                fields_terms.setdefault(f, set()).add(t)
        if not specs:
            return self.spark.createDataFrame([], BATCH_HIT_SCHEMA)
        aux, _ = self._aux_frames()

        def kernel(pdf: pd.DataFrame, aux_pdf: pd.DataFrame | None) -> pd.DataFrame:
            by_field = {
                f: {t: g for t, g in sub.groupby("term", sort=False)}
                for f, sub in pdf.groupby("field", sort=False)
            }
            dels, _ = _split_aux(aux_pdf, [])
            outs = []
            for sp in specs:
                r = _score_shard_boolean(by_field, sp, dels, None)
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

        pred = F.lit(False)
        for f, ts in fields_terms.items():
            pred = pred | ((F.col("field") == f) & F.col("term").isin(sorted(ts)))
        hits = self._apply_kernel(self._postings.filter(pred), kernel, BATCH_HIT_SCHEMA, aux)
        ks = {sp["query_id"]: sp["k"] for sp in specs}
        k_map = F.create_map(*[F.lit(x) for kv in ks.items() for x in kv])
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc"))
        return (
            hits.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k_map[F.col("query_id")])
            .drop("rn")
            .orderBy("query_id", F.desc("score"), F.asc("doc"))
        )

    def search_batch(self, queries: list[dict]) -> DataFrame:
        """Evaluate many queries in one job. queries: [{query_id, terms,
        k, mode}]. Returns (query_id, doc, score) with per-query top-k,
        ordered within each query by (score desc, doc asc)."""
        specs = []
        fields_terms: dict[str, set[str]] = {}
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
            fields_terms.setdefault(field, set()).update(term_df)
            fields_terms.setdefault(field, set()).update(nts)
        if not specs:
            return self.spark.createDataFrame([], BATCH_HIT_SCHEMA)
        aux, allow_kinds = self._aux_frames()

        def kernel(pdf: pd.DataFrame, aux_pdf: pd.DataFrame | None) -> pd.DataFrame:
            by_field = {
                f: {t: g for t, g in sub.groupby("term", sort=False)}
                for f, sub in pdf.groupby("field", sort=False)
            }
            dels, _ = _split_aux(aux_pdf, allow_kinds)
            outs = []
            for sp in specs:
                groups = by_field.get(sp["field"], {})
                r = _score_shard(
                    groups, sp["term_df"], sp["n_docs"], sp["avgdl"], sp["k"], sp["mode"],
                    sp["q_terms"], dels, sp["not_terms"],
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

        # per-field term predicate: a term queried only in field A is
        # not scanned for field B (tighter pushdown than the
        # cross-product fields x terms filter)
        pred = F.lit(False)
        for f, ts in fields_terms.items():
            pred = pred | ((F.col("field") == f) & F.col("term").isin(sorted(ts)))
        scan = self._postings.filter(pred)
        hits = self._apply_kernel(scan, kernel, BATCH_HIT_SCHEMA, aux)
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

    def offsets(self, terms: list[str], field: str = "text") -> DataFrame:
        """Per-occurrence character offsets -> (term, doc, pos, start,
        end) — the highlight surface (reference: ("pp", field, term,
        docID, pos) -> (startOffset, endOffset), DATA.md:54). Requires
        an index built with store_offsets=True; offsets are measured on
        the LOWERCASED text (identical to the original for ASCII)."""
        if not self.manifest.properties.get("store_offsets", False):
            raise ValueError("index built without store_offsets; rebuild with store_offsets=True")
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
                    pos, _ = codec.decode_positions_block(r["positions"], tf)
                    st, en, _ = codec.decode_offsets_block(r["offsets"], tf)
                    outs.append(
                        pd.DataFrame(
                            {
                                "term": r["term"],
                                "doc": np.repeat(d, tf),
                                "pos": pos,
                                "start": st,
                                "end": en,
                            }
                        )
                    )
                yield pd.concat(outs, ignore_index=True)

        schema = T.StructType(
            [
                T.StructField("term", T.StringType(), False),
                T.StructField("doc", T.LongType(), False),
                T.StructField("pos", T.LongType(), False),
                T.StructField("start", T.LongType(), False),
                T.StructField("end", T.LongType(), False),
            ]
        )
        return scan.mapInPandas(dec, schema=schema)

    def _local_blocks(self, fields_terms: dict[str, list[str]]) -> pd.DataFrame:
        files = []
        for p in self.manifest.segment_paths(self.root, "postings"):
            files.extend(os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet"))
        dset = pads.dataset(files, format="parquet")
        flt = None
        for f, ts in fields_terms.items():
            leg = (pads.field("field") == f) & pads.field("term").isin(ts)
            flt = leg if flt is None else (flt | leg)
        return dset.to_table(filter=flt).to_pandas()

    def search_local(
        self,
        terms: list[str],
        k: int,
        mode: str = "or",
        field: str = "text",
        not_terms: list[str] | None = None,
        after: tuple[float, int] | None = None,
        dismax_tie: float | None = None,
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
        pdf = self._local_blocks({field: list(term_df) + nts})
        groups = {t: g for t, g in pdf.groupby("term", sort=False)}
        kt = list(terms) if mode == "phrase" else list(term_df)
        hits = _score_shard(
            groups, term_df, self.manifest.n_docs_for(field),
            self.manifest.avgdl_for(field), k, mode, kt, self.deleted, nts,
            after=after, dismax_tie=dismax_tie,
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
        pdf = self._local_blocks({field: list(term_df)})
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
        """totalHits (reference: SimpleFDBDirectoryTest.java:155).

        Kernel-side: each shard counts its matched docIDs (no scores,
        no global sort, no hit materialization) and the counts sum —
        shards partition the doc space, so the sum is exact. No k
        bound, so fields whose docCount exceeds the primary field's
        are counted fully."""
        prep = self._prep(terms, mode, field)
        if prep is None:
            return 0
        _, term_df = prep
        kt = list(terms) if mode == "phrase" else list(term_df)
        aux, _ = self._aux_frames()

        def kernel(pdf: pd.DataFrame, aux_pdf: pd.DataFrame | None) -> pd.DataFrame:
            groups = {t: g for t, g in pdf.groupby("term", sort=False)}
            dels, _ = _split_aux(aux_pdf, [])
            return pd.DataFrame({"n": [_count_shard(groups, mode, kt, dels)]})

        scan = self._postings.filter(
            (F.col("field") == field) & F.col("term").isin(list(term_df))
        )
        per_shard = self._apply_kernel(scan, kernel, COUNT_SCHEMA, aux)
        row = per_shard.agg(F.sum("n")).first()[0]
        return int(row or 0)

    def search_sorted(
        self,
        terms: list[str],
        k: int,
        sort_field: str,
        ascending: bool = False,
        mode: str = "or",
        field: str = "text",
    ) -> DataFrame:
        """Top-k matches ordered by a STORED numeric field instead of
        relevance — Lucene's Sort over NumericDocValues inside the
        same index (reference: NumericDocValuesField sorting,
        README.md:56-57). Plan: per-shard matched-docID kernel (no
        scores), join to the index's stored table (column-pruned to
        the sort field), global TakeOrdered(k). Returns
        (doc, <sort_field>); ties break docID ascending."""
        prep = self._prep(terms, mode, field)
        if prep is None:
            return self.spark.createDataFrame(
                [], T.StructType([T.StructField("doc", T.LongType(), False)])
            ).withColumn(sort_field, F.lit(None))
        _, term_df = prep
        kt = list(terms) if mode == "phrase" else list(term_df)
        aux, _ = self._aux_frames()

        def kernel(pdf: pd.DataFrame, aux_pdf: pd.DataFrame | None) -> pd.DataFrame:
            groups = {t: g for t, g in pdf.groupby("term", sort=False)}
            dels, _ = _split_aux(aux_pdf, [])
            return pd.DataFrame({"doc": _match_shard(groups, mode, kt, dels)})

        scan = self._postings.filter(
            (F.col("field") == field) & F.col("term").isin(list(term_df))
        )
        matched = self._apply_kernel(
            scan, kernel,
            T.StructType([T.StructField("doc", T.LongType(), False)]), aux,
        )
        stored = self._stored_df().select("doc", sort_field)
        order = F.asc(sort_field) if ascending else F.desc(sort_field)
        return matched.join(stored, "doc").orderBy(order, F.asc("doc")).limit(k)

    def fetch(self, hits: DataFrame, base: DataFrame, doc_col: str) -> DataFrame:
        """Stored-field retrieval from a caller-supplied base table:
        broadcast semi-join of top-k docIDs (L10)."""
        return base.join(F.broadcast(hits), base[doc_col] == hits["doc"], "inner").drop("doc")

    def fetch_stored(self, hits: DataFrame, fields: list[str] | None = None) -> DataFrame:
        """Index-OWNED stored-field retrieval (reference:
        reader.document, SimpleFDBDirectoryTest.java:156-157; the
        ("s", docID, field) keyspace of DATA.md:27-28): materialize
        hits from the index's own stored table — no base table needed.
        Broadcast join (top-k is small) against the columnar stored
        files; column pruning keeps the scan to the requested fields."""
        stored = self._stored_df()
        avail = [c for c in stored.columns if c not in ("shard", "doc")]
        cols = fields if fields is not None else avail
        missing = sorted(set(cols) - set(avail))
        if missing:
            raise ValueError(f"fields not stored in this index: {missing} (stored: {avail})")
        return stored.select("doc", *cols).join(F.broadcast(hits), "doc", "inner")
