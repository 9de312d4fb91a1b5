"""Index build: corpus DataFrame -> block-compressed posting segment.

The Spark re-expression of the reference's indexing path
(IndexWriter.addDocument -> Lucene80Codec -> FDB pages; trace in
SURVEY.md section 3.1). Pipeline shape — exactly one wide shuffle:

1. dense docID assignment — range-partition + in-partition sort + two-
   pass offset add (scales: no global window; the reference's docID
   allocator is a transactional counter, DATA.md:17-22);
2. INVERT kernel (mapInPandas): tokenize + per-document inversion in
   one Arrow batch — the batch plays the role of Lucene's in-memory
   segment buffer. Emits one row per (doc, term): tf, positions
   already delta+varbyte encoded, doc length + SmallFloat norm byte
   (DATA.md:37). Because (doc, term) aggregation is doc-local, no
   explode/groupBy/window shuffle is needed at all;
3. salted shuffle: repartition by (term, shard) where
   shard = doc % n_shards — keeps every doc's postings co-located per
   shard (AND/phrase intersect locally) while splitting hot Zipf terms
   across shards (north_rule skew handling);
4. PACK kernel (mapInPandas): whole-partition vectorized block
   packing — one varbyte pass for all doc gaps / tfs, per-block work
   is a byte slice. Emits delta+varbyte blocks with (min_doc, max_doc,
   max_tf, min_dlq) block-max metadata;
5. termdict/doclen: cheap Catalyst aggs over the persisted inverted
   relation (partial+final, DATA.md:33-35,47-48 stats);
6. Parquet segment at an invisible task-unique path; manifest commit
   publishes atomically (FDBDirectory.java:350-365 rename analogue).

Idempotence/resume: pass a build `fingerprint`; if the current
manifest already carries a segment with that fingerprint the build is
a no-op (reference analogue: applyIfExists write-after-delete
tolerance, FDBIndexOutput.java:182-189).
"""

from __future__ import annotations

import os
import re
import time
import uuid
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import bm25, codec
from ..functions.analysis import (
    ANALYZER_VERSION, _TOKEN_RE, ascii_fold, cjk, edge_expand, edge_grams, folds,
    min_stem, shingles, stems,
    stop_set,
)
from ..sources.manifest import (
    CommitConflict, IndexCatalog, Manifest, SegmentMeta, dir_fingerprint,
    table_file_lists,
)

DEFAULT_N_SHARDS = 16
DEFAULT_BLOCK_SIZE = codec.BLOCK_SIZE
# Above this shard count, per-shard lineage switches from unrolled
# Observation aggregates (3 expressions/shard in one CollectMetrics
# node — a Catalyst analyzer/codegen blowup at 4096 shards) to a tiny
# groupBy('shard') read-back over the written postings parquet.
LINEAGE_UNROLL_MAX_SHARDS = 256

INVERTED_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("doc", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.LongType(), False),
        T.StructField("dl", T.LongType(), False),
        T.StructField("dlq", T.IntegerType(), False),
        T.StructField("positions", T.BinaryType(), True),
        T.StructField("offsets", T.BinaryType(), True),
        T.StructField("payloads", T.BinaryType(), True),
        # True on exactly ONE row per (field, doc): the inverter emits
        # docs contiguously, so doclen is a map-only filter on this
        # flag instead of a corpus-sized groupBy(field, doc) shuffle
        T.StructField("lead", T.BooleanType(), False),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("min_doc", T.LongType(), False),
        T.StructField("max_doc", T.LongType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("min_dlq", T.IntegerType(), False),
        T.StructField("docs", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dlqs", T.BinaryType(), False),
        T.StructField("positions", T.BinaryType(), True),
        T.StructField("offsets", T.BinaryType(), True),
        T.StructField("payloads", T.BinaryType(), True),
    ]
)


def _pid_counts_from_footers(freeze_dir: str) -> dict[int, int] | None:
    """Per-partition row counts of the frozen ids relation from Parquet
    FOOTER METADATA alone — no Spark job. Every file a task writes
    holds rows of exactly one shuffle partition, so the partition id
    (the high 31 bits of `_mid`) is constant per file and recoverable
    from the column's min statistic; the row count is in the footer.
    A driver-side footer read is O(files), independent of row count —
    this scales to any corpus (footers are KBs each) and removes one
    whole Spark job (~1-2 s fixed cost) from every build. Returns None
    if any footer lacks `_mid` statistics (fallback: the Spark job)."""
    import pyarrow.parquet as pq

    counts: dict[int, int] = {}
    try:
        names = [n for n in os.listdir(freeze_dir) if n.endswith(".parquet")]
        for name in names:
            meta = pq.read_metadata(os.path.join(freeze_dir, name))
            if meta.num_rows == 0:
                continue
            idx = {meta.schema.column(i).name: i for i in range(len(meta.schema))}
            if "_mid" not in idx:
                return None
            st = meta.row_group(0).column(idx["_mid"]).statistics
            if st is None or not st.has_min_max:
                return None
            p = int(st.min) >> 33
            counts[p] = counts.get(p, 0) + meta.num_rows
    except OSError:
        return None
    return counts


def assign_dense_doc_ids(
    df: DataFrame,
    key_cols: list[str],
    doc_base: int = 0,
    num_partitions: int | None = None,
    freeze_dir: str | None = None,
    order_exprs: list | None = None,
) -> DataFrame:
    """Add a dense deterministic int64 `doc` column, ordered by key_cols.

    order_exprs: optional Column-expression ordering overriding the
    plain key_cols order (index-time sorting — docID rank follows
    e.g. [desc(ts), conv_id, turn_idx]); key_cols still define
    uniqueness, order_exprs define rank.

    Scalable dense-ID assignment without a global single-partition
    window and without Spark's (expensive) columnar cache:

    1. range-partition by key + sort within partitions, stamp each row
       with monotonically_increasing_id (pid in the high 31 bits,
       in-partition ordinal in the low 33 — all JVM, zero Python);
    2. FREEZE that result to Parquet once (cheap columnar write; also
       pins the sampled range boundaries so every consumer sees one
       consistent partitioning — the snapshot-pinning idea again);
    3. per-pid counts from the frozen copy -> cumulative offsets
       (one tiny collect of num_partitions rows);
    4. doc = offset[pid] + ordinal via a broadcast join on pid.

    Because range partitions are non-overlapping and rows are sorted
    within each, the key->id mapping equals the global sort rank —
    independent of where the sampled boundaries fell.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    if freeze_dir is None:
        freeze_dir = os.path.join(
            "/tmp", "sparklucene-ids-" + uuid.uuid4().hex[:12]
        )
    order = order_exprs if order_exprs is not None else list(key_cols)
    keyed = (
        df.repartitionByRange(num_partitions, *order)
        .sortWithinPartitions(*order)
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    keyed.write.mode("errorifexists").parquet(freeze_dir)
    frozen = spark.read.parquet(freeze_dir)
    counts = _pid_counts_from_footers(freeze_dir)
    if counts is None:  # stats missing (non-default writer config): Spark job
        pid = F.shiftright(F.col("_mid"), 33).alias("pid")
        counts = dict(frozen.groupBy(pid).count().collect())
    offsets = []
    acc = doc_base
    for p in sorted(counts):
        offsets.append((int(p), int(acc)))
        acc += counts[p]
    off_df = spark.createDataFrame(offsets, "pid long, _off long")
    return (
        frozen.withColumn("pid", F.shiftright(F.col("_mid"), 33))
        .join(F.broadcast(off_df), "pid")
        .withColumn("doc", F.col("_off") + (F.col("_mid") % F.lit(1 << 33)))
        .drop("pid", "_off", "_mid")
    )


DEFAULT_FIELDS = ({"field": "text", "col": "text", "analyzer": "standard"},)

# Sentinel term for doc-roster rows: a doc whose primary text analyzes
# to ZERO tokens (empty / null / all-stopword under standard_v2) still
# exists in the index (Lucene liveDocs / MatchAllDocsQuery domain), so
# the inverter emits one (field, doc, ROSTER_TERM, tf=0, dl=0) row for
# it — the doclen table then carries every added doc, with no extra
# distinct+anti-join pass over the corpus. \x00 cannot be produced by
# any analyzer (\w+ never matches it), so it can't collide with a real
# term; build_postings filters it out of termdict and postings.
ROSTER_TERM = "\x00__doc__"


def _invert_text(
    fld: str,
    docs: np.ndarray,
    texts: pd.Series,
    store_positions: bool,
    token_re: re.Pattern,
    store_offsets: bool = False,
    store_payloads: bool = False,
    stops: frozenset[str] = frozenset(),
    emit_roster: bool = False,
    stem: bool = False,
    shingle: bool = False,
    payload_delim: str | None = None,
    fold: bool = False,
    edge: bool = False,
    cjk: bool = False,
) -> pd.DataFrame | None:
    """Per-batch inversion of one tokenized field.

    emit_roster (set for the PRIMARY field only): docs whose text
    analyzes to zero tokens emit one ROSTER_TERM/dl=0 row so the
    doclen table is a complete live-doc roster (MatchAllDocsQuery).

    stops: the pinned analyzer's stopword set (standard_v2's Lucene
    StopFilter analogue); dropped tokens vanish from postings AND from
    dl, and on the offsets path their character spans are dropped with
    them — positions stay the SURVIVING-token ordinals, matching the
    query-side analyzer so phrase/span adjacency keeps working.

    store_offsets (opt-in; requires positions): also records per-
    occurrence character (start, length) on the LOWERCASED text (the
    ("pp",...) -> (startOffset, endOffset) payload of DATA.md:54).
    The offsets path tokenizes with finditer per doc — slower than the
    vectorized findall, which is why the hot default path is untouched.

    store_payloads (opt-in; requires positions): one unsigned varint
    payload per occurrence in positions order — the payload slot of the
    reference's ("pp", field, term, docID, pos) keyspace (DATA.md:55).
    Built-in producer: the token's character length (the classic
    payload demo); swap the producer HERE, where a Lucene TokenFilter
    would run — the storage slot, codec, merge carry-through and query
    surface are payload-agnostic.

    payload_delim: DelimitedPayloadTokenFilter (Lucene analysis-common)
    with the IntegerEncoder — a token 'word<delim>N' (N decimal digits)
    indexes as term 'word' carrying payload N; tokens without the
    suffix keep their whole surface and the default length payload.
    Lucene's default delimiter '|' would be split away by the \\w+
    tokenizer, so '_' (a \\w character) is the natural choice here —
    the filter runs where Lucene runs it, straight after tokenization,
    before any stem/stop stage (which payload_delim therefore refuses
    to compose with)."""
    if shingle and store_offsets:
        raise ValueError("store_offsets is not supported with a shingle analyzer")
    if edge and (store_offsets or shingle):
        raise ValueError("edge n-grams compose with neither store_offsets "
                         "nor a shingle chain")
    if cjk and (store_offsets or shingle or edge):
        raise ValueError("CJK bigrams compose with none of store_offsets, "
                         "shingle or edge-gram chains")
    if store_offsets:
        lowered = texts.fillna("").str.lower()
        toks_l: list[list[str]] = []
        st_l: list[list[int]] = []
        ln_l: list[list[int]] = []
        for txt in lowered:
            tt, ss, ll = [], [], []
            for m in token_re.finditer(txt):
                if m.group(0) in stops:
                    continue
                tt.append(m.group(0))
                ss.append(m.start())
                ll.append(m.end() - m.start())
            toks_l.append(tt)
            st_l.append(ss)
            ln_l.append(ll)
        tok_lists = pd.Series(toks_l, index=texts.index)
    else:
        tok_lists = texts.fillna("").str.lower().str.findall(token_re)
        if stops:
            tok_lists = tok_lists.apply(lambda ts: [t for t in ts if t not in stops])
    if cjk:
        # CJKBigramFilter: bigrams REPLACE the stream (each advances a
        # position; dl counts emitted tokens — the Lucene norm over
        # the bigram stream), so plain sequential ordinals stay right
        from ..functions.analysis import cjk_bigrams

        tok_lists = tok_lists.apply(
            lambda ts: [g for t in ts for g in cjk_bigrams(t)]
        )
    uni_lens = tok_lists.str.len().to_numpy(np.int64)
    pos_lists = None
    if shingle:
        # ShingleFilter (maxShingleSize=2): bigrams appended after the
        # unigram stream; a shingle carries its FIRST member's ordinal
        # (Lucene posinc 0) and dl counts unigrams only
        # (discountOverlaps=true norm semantics)
        pos_lists = tok_lists.apply(
            lambda ts: list(range(len(ts))) + list(range(max(len(ts) - 1, 0)))
        )
        tok_lists = tok_lists.apply(
            lambda ts: ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]
        )
    if edge:
        # EdgeNGramTokenFilter(EDGE_MIN..EDGE_MAX, preserveOriginal)
        # (standard_v6): every gram of a token carries the token's
        # ordinal (posinc 0) and dl counts original tokens only
        # (discountOverlaps norm semantics, like the shingle chain)
        pos_lists = tok_lists.apply(
            lambda ts: [i for i, t in enumerate(ts) for _ in edge_expand(t)]
        )
        tok_lists = tok_lists.apply(
            lambda ts: [g for t in ts for g in edge_expand(t)]
        )
    lens = tok_lists.str.len().to_numpy(np.int64)
    total = int(lens.sum())
    if total == 0:
        return _roster_frame(fld, docs) if emit_roster and len(docs) else None
    keep = lens > 0  # docs with no tokens produce no postings
    keep_idx = np.flatnonzero(keep)
    flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists[keep]])
    pay_vals: np.ndarray | None = None
    if payload_delim is not None:
        # DelimitedPayloadTokenFilter(IntegerEncoder): split each token
        # at the LAST delimiter; a non-empty head + all-digit tail
        # means term=head, payload=int(tail); anything else keeps the
        # whole token with the default length payload. Vectorized
        # pandas str ops — no per-token Python in the hot loop.
        s = pd.Series(flat_terms, dtype=object)
        parts = s.str.rpartition(payload_delim)
        has = (
            (parts[1] == payload_delim)
            & (parts[0] != "")
            & parts[2].str.fullmatch("[0-9]+").fillna(False)
        ).to_numpy(bool)
        pay_vals = np.fromiter(
            (len(t) for t in flat_terms), dtype=np.int64, count=total
        )
        if has.any():
            pay_vals[has] = (
                pd.to_numeric(parts[2][has]).to_numpy(np.int64)
            )
            flat_terms = np.where(has, parts[0].to_numpy(object), flat_terms)
    if fold:
        # ASCIIFoldingFilter (standard_v5): fold straight after
        # tokenization; no fold analyzer carries stops/stems today, so
        # the list-level stop filter above never sees accented
        # surfaces. Offsets keep the original char spans, like stem.
        flat_terms = np.array(
            [t if t.isascii() else ascii_fold(t) for t in flat_terms], dtype=object
        )
    if stem:
        # minimal-stem filter AFTER stop removal (standard_v3 chain);
        # offsets keep the ORIGINAL surface-form char spans, exactly
        # like a Lucene stem TokenFilter downstream of the tokenizer
        flat_terms = np.array([min_stem(t) for t in flat_terms], dtype=object)
    row_rep = np.repeat(keep_idx, lens[keep])
    starts = np.cumsum(lens[keep]) - lens[keep]
    if pos_lists is not None:  # shingle / edge overlap positions
        pos = np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in pos_lists[keep]]
        )
    else:
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens[keep])
    codes, uniques = pd.factorize(flat_terms, sort=False)
    order = np.lexsort((pos, codes, row_rep))
    r, c, p = row_rep[order], codes[order], pos[order]
    bound = np.flatnonzero((r[1:] != r[:-1]) | (c[1:] != c[:-1])) + 1
    pstarts = np.concatenate(([0], bound))
    pends = np.append(bound, total)
    tf = pends - pstarts
    out = pd.DataFrame(
        {
            "field": fld,
            "doc": docs[r[pstarts]],
            "term": uniques[c[pstarts]],
            "tf": tf.astype(np.int64),
            "dl": uni_lens[r[pstarts]].astype(np.int64),
            "dlq": bm25.int_to_byte4(uni_lens[r[pstarts]]).astype(np.int32),
        }
    )
    if store_positions:
        gaps = np.empty(total, dtype=np.int64)
        gaps[0] = p[0]
        np.subtract(p[1:], p[:-1], out=gaps[1:])
        gaps[pstarts] = p[pstarts]  # delta restarts at each posting
        out["positions"] = codec.varbyte_encode_split(gaps, pstarts)
    else:
        out["positions"] = None
    if store_offsets:
        flat_st = np.concatenate([np.asarray(st_l[i], dtype=np.int64) for i in keep_idx])
        flat_ln = np.concatenate([np.asarray(ln_l[i], dtype=np.int64) for i in keep_idx])
        out["offsets"] = codec.encode_offsets_interleaved(
            flat_st[order], flat_ln[order], pstarts
        )
    else:
        out["offsets"] = None
    if store_payloads:
        if pay_vals is None:
            pay_vals = np.fromiter(
                (len(t) for t in flat_terms), dtype=np.int64, count=total
            )
        out["payloads"] = codec.varbyte_encode_split(
            pay_vals[order].astype(np.uint64), pstarts
        )
    else:
        out["payloads"] = None
    group_docs = docs[r[pstarts]]
    lead = np.empty(group_docs.size, dtype=bool)
    lead[0] = True
    np.not_equal(group_docs[1:], group_docs[:-1], out=lead[1:])
    out["lead"] = lead
    if emit_roster and not keep.all():
        out = pd.concat([out, _roster_frame(fld, docs[~keep])], ignore_index=True)
    return out


def _roster_frame(fld: str, docs: np.ndarray) -> pd.DataFrame:
    """One ROSTER_TERM row per token-free doc (dl=0, no postings)."""
    n = len(docs)
    out = pd.DataFrame(
        {
            "field": fld,
            "doc": docs,
            "term": ROSTER_TERM,
            "tf": np.zeros(n, dtype=np.int64),
            "dl": np.zeros(n, dtype=np.int64),
            "dlq": np.zeros(n, dtype=np.int32),
        }
    )
    out["positions"] = None
    out["offsets"] = None
    out["payloads"] = None
    out["lead"] = True  # roster docs have no other row for this field
    return out


def _invert_keyword(fld: str, docs: np.ndarray, values: pd.Series, store_positions: bool) -> pd.DataFrame | None:
    """Keyword field: whole value = one term, no lowercasing, dl = 1
    (reference: StringField("_id", ...), SimpleFDBDirectoryTest.java:205)."""
    mask = values.notna().to_numpy()
    if not mask.any():
        return None
    n = int(mask.sum())
    out = pd.DataFrame(
        {
            "field": fld,
            "doc": docs[mask],
            "term": values.to_numpy()[mask],
            "tf": np.ones(n, dtype=np.int64),
            "dl": np.ones(n, dtype=np.int64),
            "dlq": np.ones(n, dtype=np.int32),
        }
    )
    out["positions"] = b"\x00" if store_positions else None  # single position 0
    out["offsets"] = None  # keyword fields carry no character offsets
    out["payloads"] = None  # ... and no payloads
    out["lead"] = True  # one row per doc by construction
    return out


def _invert_factory(
    store_positions: bool,
    fields_spec: tuple[dict, ...] = DEFAULT_FIELDS,
    token_re: re.Pattern = _TOKEN_RE,
    store_offsets: bool = False,
    store_payloads: bool = False,
    chains: dict[str, tuple[frozenset, bool, bool]] | None = None,
    payload_delim: str | None = None,
):
    """Tokenize + per-doc inversion kernel (the in-memory segment),
    one output row per (field, doc, term). chains: per-text-field
    (stop set, stem flag) — Lucene PerFieldAnalyzerWrapper; a field
    absent from the map gets the bare standard_v1 chain."""
    primary = next(
        (s["field"] for s in fields_spec if s["analyzer"] != "keyword"), None
    )
    chains = dict(chains or {})

    def invert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            docs = pdf["doc"].to_numpy(np.int64)
            outs = []
            for spec in fields_spec:
                if spec["analyzer"] == "keyword":
                    sub = _invert_keyword(spec["field"], docs, pdf[spec["col"]], store_positions)
                else:
                    stops, stem, shingle, fold, edge, cjk_f = chains.get(
                        spec["field"],
                        (frozenset(), False, False, False, False, False),
                    )
                    sub = _invert_text(
                        spec["field"], docs, pdf[spec["col"]], store_positions, token_re,
                        store_offsets, store_payloads, stops,
                        emit_roster=spec["field"] == primary, stem=stem,
                        shingle=shingle, payload_delim=payload_delim, fold=fold,
                        edge=edge, cjk=cjk_f,
                    )
                if sub is not None:
                    outs.append(sub)
            if outs:
                yield pd.concat(outs, ignore_index=True) if len(outs) > 1 else outs[0]

    return invert


def _analyzer_spec(
    analyzer: str | dict, text_field_names: list[str]
) -> tuple[str, dict[str, str]]:
    """Normalize an analyzer argument (one version string, or a
    PerFieldAnalyzerWrapper-style {text_field: version} map) to
    (manifest pin, per-field map). The pin is a canonical string so
    the existing string-equality config checks (append, addIndexes,
    CAS retry) cover per-field setups unchanged: uniform maps pin as
    the bare version, mixed maps as 'perfield:f1=v1,f2=v2' (sorted).
    Every version is validated against the analyzer registry; map
    keys must be declared text fields; absent fields default to
    standard_v1 (Lucene's wrapper default)."""
    from ..functions.analysis import canonical_analyzer

    if isinstance(analyzer, str):
        analyzer = canonical_analyzer(analyzer)  # validate + canonicalize
        return analyzer, {f: analyzer for f in text_field_names}
    unknown = set(analyzer) - set(text_field_names)
    if unknown:
        raise ValueError(
            f"field_analyzers for undeclared text fields: {sorted(unknown)}"
        )
    amap = {
        f: canonical_analyzer(analyzer.get(f, ANALYZER_VERSION))
        for f in text_field_names
    }
    if len(set(amap.values())) == 1:
        return next(iter(amap.values())), amap
    if any(v.startswith("stop:") for v in amap.values()):
        # a custom stop name contains commas — the perfield pin's own
        # separator — so mixed maps would pin ambiguously; uniform
        # maps collapse to the bare name above and are fine
        raise ValueError(
            "custom 'stop:' analyzers are supported uniformly or as the "
            "single analyzer, not inside a mixed per-field map"
        )
    pin = "perfield:" + ",".join(f"{f}={amap[f]}" for f in sorted(amap))
    return pin, amap


def _pack_factory(block_size: int, store_positions: bool, store_offsets: bool = False,
                  store_payloads: bool = False):
    """Whole-partition vectorized block packer: one varbyte pass for
    all doc-gaps/tfs in the partition, per-block cost = byte slices."""

    def _slice_cells(col: np.ndarray, n: int, bstarts, bends) -> list[bytes]:
        # concatenate per-posting binary cells into per-block binaries
        lens = np.fromiter((len(x) for x in col), dtype=np.int64, count=n)
        buf = b"".join(col.tolist())
        offs = np.concatenate(([0], np.cumsum(lens)))
        return [buf[offs[a]: offs[b]] for a, b in zip(bstarts.tolist(), bends.tolist())]

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        n = len(pdf)
        # composite (field, term) group key; sort=True keeps the output
        # (and the Parquet row groups) field- then term-sorted — that is
        # what makes row-group min/max stats prune term lookups
        fields_arr = pdf["field"].to_numpy()
        terms_arr = pdf["term"].to_numpy()
        tcodes, kuniq = pd.factorize(
            pd.Series(fields_arr).str.cat(pd.Series(terms_arr), sep="\x1f").to_numpy(),
            sort=True,
        )
        shards = pdf["shard"].to_numpy(np.int64)
        order = np.lexsort((pdf["doc"].to_numpy(np.int64), shards, tcodes))
        tcodes, shards = tcodes[order], shards[order]
        fields_arr, terms_arr = fields_arr[order], terms_arr[order]
        docs = pdf["doc"].to_numpy(np.int64)[order]
        tfs = pdf["tf"].to_numpy(np.int64)[order]
        dlqs = pdf["dlq"].to_numpy(np.int64)[order]
        # group boundaries (term, shard); block boundaries every block_size
        gchange = np.flatnonzero((tcodes[1:] != tcodes[:-1]) | (shards[1:] != shards[:-1])) + 1
        gstarts = np.concatenate(([0], gchange))
        gsizes = np.diff(np.append(gstarts, n))
        in_group_idx = np.arange(n) - np.repeat(gstarts, gsizes)
        block_ord = in_group_idx // block_size
        group_of_row = np.repeat(np.arange(gstarts.size), gsizes)
        bchange = np.flatnonzero(
            (group_of_row[1:] != group_of_row[:-1]) | (block_ord[1:] != block_ord[:-1])
        ) + 1
        bstarts = np.concatenate(([0], bchange))
        bends = np.append(bchange, n)
        # per-block stats
        min_doc = docs[bstarts]
        max_doc = docs[bends - 1]
        max_tf = np.maximum.reduceat(tfs, bstarts)
        min_dlq = np.minimum.reduceat(dlqs, bstarts)
        # doc gaps with per-block absolute restart -> bulk varbyte
        gaps = np.empty(n, dtype=np.int64)
        if n:
            gaps[0] = docs[0]
            np.subtract(docs[1:], docs[:-1], out=gaps[1:])
            gaps[bstarts] = docs[bstarts]
        doc_bytes = codec.varbyte_encode_split(gaps, bstarts)
        tf_bytes = codec.varbyte_encode_split(tfs - 1, bstarts)
        dlq_buf = dlqs.astype(np.uint8).tobytes()
        dlq_bytes = [dlq_buf[a:b] for a, b in zip(bstarts.tolist(), bends.tolist())]
        if store_positions:
            pos_bytes = _slice_cells(pdf["positions"].to_numpy()[order], n, bstarts, bends)
        else:
            pos_bytes = None
        if store_offsets:
            off_col = pdf["offsets"].to_numpy()[order]
            # keyword-field postings carry no offsets cell (None)
            off_col = np.array([x if x is not None else b"" for x in off_col], dtype=object)
            off_bytes = _slice_cells(off_col, n, bstarts, bends)
        else:
            off_bytes = None
        if store_payloads:
            pay_col = pdf["payloads"].to_numpy()[order]
            pay_col = np.array([x if x is not None else b"" for x in pay_col], dtype=object)
            pay_bytes = _slice_cells(pay_col, n, bstarts, bends)
        else:
            pay_bytes = None
        yield pd.DataFrame(
            {
                "field": fields_arr[bstarts],
                "term": terms_arr[bstarts],
                "shard": shards[bstarts].astype(np.int32),
                "block_id": block_ord[bstarts].astype(np.int32),
                "n": (bends - bstarts).astype(np.int32),
                "min_doc": min_doc,
                "max_doc": max_doc,
                "max_tf": max_tf.astype(np.int32),
                "min_dlq": min_dlq.astype(np.int32),
                "docs": doc_bytes,
                "tfs": tf_bytes,
                "dlqs": dlq_bytes,
                "positions": pos_bytes,
                "offsets": off_bytes,
                "payloads": pay_bytes,
            }
        )

    return pack


def build_postings(
    docs_df: DataFrame,
    n_shards: int = DEFAULT_N_SHARDS,
    block_size: int = DEFAULT_BLOCK_SIZE,
    store_positions: bool = True,
    pack_partitions: int | None = None,
    freeze_dir: str | None = None,
    fields_spec: list[dict] | tuple[dict, ...] | None = None,
    store_offsets: bool = False,
    store_payloads: bool = False,
    analyzer: str | dict[str, str] = ANALYZER_VERSION,
    payload_delim: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(doc, field cols...) -> (blocks, termdict, doclen, inverted).

    blocks, termdict and doclen all branch from `inverted`. With
    freeze_dir set, the inverted relation is written to Parquet once
    and all three consumers read the frozen columnar copy — measured
    ~10x cheaper than Spark's in-memory columnar cache for this shape
    (millions of tiny rows with binary cells), and it doubles as the
    resumable intermediate of the build.

    doclen carries one row per ADDED doc for the primary field — docs
    whose primary text analyzes to zero tokens get a dl=0 row. That
    makes the doclen table a complete live-doc roster (Lucene's
    maxDoc / MatchAllDocsQuery domain) while per-field stats still
    count only dl>0 docs (Lucene's per-field docCount).
    """
    if fields_spec is None:
        fields_spec = DEFAULT_FIELDS
    if store_offsets and not store_positions:
        raise ValueError("store_offsets requires store_positions")
    if store_payloads and not store_positions:
        raise ValueError("store_payloads requires store_positions")
    if isinstance(analyzer, str):
        chains = {
            s["field"]: (stop_set(analyzer), stems(analyzer), shingles(analyzer),
                         folds(analyzer), edge_grams(analyzer), cjk(analyzer))
            for s in fields_spec if s["analyzer"] != "keyword"
        }
    else:
        chains = {
            f: (stop_set(v), stems(v), shingles(v), folds(v), edge_grams(v), cjk(v))
            for f, v in analyzer.items()
        }
    if store_offsets and any(c[2] or c[4] or c[5] for c in chains.values()):
        raise ValueError("store_offsets is not supported with a shingle, "
                         "edge-gram or CJK-bigram analyzer")
    if payload_delim is not None:
        if not store_payloads:
            raise ValueError("payload_delim requires store_payloads=True")
        if any(c[0] or c[1] or c[2] or c[3] or c[4] for c in chains.values()):
            # the delimiter filter runs straight after tokenization;
            # a stop/stem/shingle/fold/edge stage would see the raw
            # 'word<delim>N' surfaces and silently misfire
            raise ValueError(
                "payload_delim composes only with the bare standard_v1 chain"
            )
    src_cols = ["doc"] + sorted({s["col"] for s in fields_spec})
    inverted = docs_df.select(*src_cols).mapInPandas(
        _invert_factory(store_positions, tuple(fields_spec), store_offsets=store_offsets,
                        store_payloads=store_payloads, chains=chains,
                        payload_delim=payload_delim),
        schema=INVERTED_SCHEMA,
    )
    if freeze_dir is not None:
        inverted.write.mode("errorifexists").parquet(freeze_dir)
        inverted = docs_df.sparkSession.read.parquet(freeze_dir)
    # ROSTER_TERM sentinel rows (one per token-free doc, emitted by the
    # inverter — no extra corpus pass) reach ONLY doclen: a dl=0 doc
    # has no postings and no dictionary entry, but search_all
    # (MatchAllDocsQuery) must still see it, like Lucene's liveDocs
    posted = inverted.filter(F.col("term") != ROSTER_TERM)
    withshard = posted.withColumn(
        "shard", F.pmod(F.col("doc"), F.lit(n_shards)).cast("int")
    )
    termdict = posted.groupBy("field", "term").agg(
        F.count(F.lit(1)).cast("long").alias("df"), F.sum("tf").cast("long").alias("ttf")
    )
    # map-only doclen: the inverter marks exactly one row per
    # (field, doc) — the old groupBy(field, doc).first() shuffled the
    # whole inverted relation to produce the same rows
    doclen = inverted.filter(F.col("lead")).select("field", "doc", "dl", "dlq")
    if pack_partitions is None:
        pack_partitions = docs_df.sparkSession.sparkContext.defaultParallelism
    blocks = (
        withshard.select("field", "term", "shard", "doc", "tf", "dlq", "positions",
                         "offsets", "payloads")
        .repartition(pack_partitions, "field", "term", "shard")
        .mapInPandas(
            _pack_factory(block_size, store_positions, store_offsets, store_payloads),
            schema=POSTINGS_SCHEMA,
        )
    )
    return blocks, termdict, doclen, inverted


def _dir_bytes(path: str) -> int:
    total = 0
    for base, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(base, f))
    return total


def normalize_index_sort(index_sort) -> list[list] | None:
    """Canonical SortField chain: accepts None, (field, asc), a legacy
    flat manifest pin [field, asc], or a chain [(f1, a1), (f2, a2),
    ...]; returns [[field, asc], ...] (JSON-stable — the manifest pin,
    its append comparison, and the query-side early-termination check
    all compare this form)."""
    if index_sort is None:
        return None
    if (
        isinstance(index_sort, (tuple, list))
        and len(index_sort) == 2
        and isinstance(index_sort[0], str)
    ):
        return [[str(index_sort[0]), bool(index_sort[1])]]
    return [[str(f), bool(a)] for f, a in index_sort]


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    root: str,
    *,
    doc_col: str | None = None,
    key_cols: list[str] | None = None,
    text_col: str = "text",
    text_fields: dict[str, str] | None = None,
    keyword_fields: dict[str, str] | None = None,
    n_shards: int = DEFAULT_N_SHARDS,
    block_size: int = DEFAULT_BLOCK_SIZE,
    store_positions: bool = True,
    append: bool = False,
    fingerprint: str | None = None,
    stored_fields: dict[str, str] | None = None,
    store_offsets: bool = False,
    store_payloads: bool = False,
    payload_delim: str | None = None,
    analyzer: str | dict[str, str] = ANALYZER_VERSION,
    index_sort: tuple[str, bool] | list[tuple[str, bool]] | None = None,
    commit_user_data: dict[str, str] | None = None,
) -> Manifest:
    """Build (or append) one segment and commit a new snapshot.

    commit_user_data: Lucene IndexWriter.setLiveCommitData — an
    opaque str->str map published atomically WITH the snapshot (the
    checkpoint-bookkeeping hook: an ingestion pipeline records the
    last consumed sequence/offset next to the docs it indexed, and a
    resume reads it back via Searcher.user_data). None inherits the
    previous snapshot's map (live commit data persists until
    replaced); a dict REPLACES it wholesale, like Lucene. For a
    data-free checkpoint commit use IndexCatalog.commit_user_data.

    index_sort: (stored_field, ascending) or a SortField CHAIN
    [(f1, asc1), (f2, asc2), ...] — Lucene
    IndexWriterConfig.setIndexSort: docIDs within each segment are
    assigned in the lexicographic order of those stored fields (then
    key_cols for ties), so a search sorted by the same field/chain can
    EARLY-TERMINATE per segment (Searcher.search_sorted stops
    decoding posting blocks once k matches per shard are decided —
    the layout optimization that makes "latest k by ts" cheap on a
    100 TB index). Requires key_cols mode (doc_col hands the caller
    control of the rank) and the field in stored_fields. Pinned in
    the manifest like the analyzer; appends must declare the same
    sort (each appended segment is internally sorted, as in Lucene).
    Concat-style merges drop the pin (they would interleave sorted
    runs; Lucene's sorted merge re-sorts — ours refuses to claim it).

    analyzer: versioned text analyzer name from analysis.ANALYZERS
    (standard_v1 = lowercase \\w+; standard_v2 = v1 + English stopword
    removal). Pinned in the manifest at creation — appends built with
    a different analyzer are refused, and Searcher analyzes query
    strings with the pinned version (reference: FDBDirectory pins
    pageSize the same way, FDBDirectory.java:416-428).

    doc_col: existing int64 unique doc key; OR key_cols for dense-ID
    assignment (e.g. ["conv_id", "turn_idx"] per BASELINE.json docID).

    Fields (reference: TextField + StringField per document,
    SimpleFDBDirectoryTest.java:202-207): text_fields maps index field
    -> tokenized source column (default {"text": text_col});
    keyword_fields maps index field -> keyword source column (whole
    value = one term, no analysis — id/enum lookup fields). The first
    text field is the primary field whose stats fill the legacy
    top-level SegmentMeta numbers.

    stored_fields maps stored name -> source column: written as the
    segment's `stored` table (shard, doc, cols...) — the index-owned
    stored-field / doc-values store (reference: StoredField round-trip
    via reader.document, SimpleFDBDirectoryTest.java:156-157, and
    NumericDocValuesField range+sort, README.md:54-57). Numeric range
    predicates in Searcher.search/search_boolean scan it with Parquet
    column pruning + predicate pushdown.
    """
    analyzer_pin, field_analyzers = _analyzer_spec(
        analyzer, list(text_fields) if text_fields is not None else ["text"]
    )
    catalog = IndexCatalog(root)
    parent: Manifest | None = None
    if catalog.exists():
        parent = catalog.load()
        if not append:
            raise ValueError(f"index exists at {root}; pass append=True")
        if parent.analyzer != analyzer_pin or parent.block_size != block_size or parent.n_shards != n_shards:
            raise ValueError("index config mismatch (analyzer/block_size/n_shards pinned at creation)")
        if bool(parent.properties.get("store_positions", True)) != bool(store_positions):
            raise ValueError(
                "index config mismatch: store_positions pinned at creation "
                f"({parent.properties.get('store_positions', True)}); segments must agree "
                "or phrase queries would miss/crash on mixed blocks"
            )
        if bool(parent.properties.get("store_offsets", False)) != bool(store_offsets):
            raise ValueError(
                "index config mismatch: store_offsets pinned at creation "
                f"({parent.properties.get('store_offsets', False)})"
            )
        if bool(parent.properties.get("store_payloads", False)) != bool(store_payloads):
            raise ValueError(
                "index config mismatch: store_payloads pinned at creation "
                f"({parent.properties.get('store_payloads', False)})"
            )
        if (parent.properties.get("payload_delim") or None) != (payload_delim or None):
            raise ValueError(
                "index config mismatch: payload_delim pinned at creation "
                f"({parent.properties.get('payload_delim')}); mixed-producer "
                "segments would make payload checks meaningless"
            )
        if sorted(parent.properties.get("stored_fields", [])) != sorted(stored_fields or {}):
            raise ValueError(
                "index config mismatch: stored_fields pinned at creation "
                f"({sorted(parent.properties.get('stored_fields', []))}); an append must "
                "store the same fields or fetch/doc-values queries would miss docs"
            )
        parent_sort = parent.properties.get("index_sort")
        if normalize_index_sort(index_sort) != normalize_index_sort(parent_sort):
            raise ValueError(
                "index config mismatch: index_sort pinned at creation "
                f"({parent_sort}); every appended segment must be sorted the "
                "same way or early-terminated sorted queries would misorder"
            )
        if fingerprint and any(
            s.lineage and s.lineage[0].get("fingerprint") == fingerprint for s in parent.segments
        ):
            return parent  # idempotent re-run: already committed

    version = catalog.next_version()
    fp_slug = (
        re.sub(r"[^A-Za-z0-9_.-]+", "-", fingerprint).strip("-")[:40]
        if fingerprint else uuid.uuid4().hex[:12]
    )
    segment_id = f"seg-v{version:06d}-{fp_slug}"
    rel = catalog.new_segment_path(segment_id)
    seg_dir = os.path.join(root, rel)
    os.makedirs(seg_dir, exist_ok=True)

    if text_fields is None:
        text_fields = {"text": text_col}
    keyword_fields = keyword_fields or {}
    if set(text_fields) & set(keyword_fields):
        raise ValueError("a field cannot be both text and keyword")
    fields_spec = [
        {"field": f, "col": c, "analyzer": "standard"} for f, c in text_fields.items()
    ] + [{"field": f, "col": c, "analyzer": "keyword"} for f, c in keyword_fields.items()]
    primary = next(iter(text_fields))
    if parent is not None and sorted(parent.fields()) != sorted(s["field"] for s in fields_spec):
        raise ValueError(
            f"field set mismatch: index has {sorted(parent.fields())}, "
            f"append brings {sorted(s['field'] for s in fields_spec)}"
        )
    stored_fields = dict(stored_fields or {})
    src_cols = sorted({s["col"] for s in fields_spec} | set(stored_fields.values()))

    phase_t: dict[str, float] = {}  # wall seconds per build phase (S26 observability)
    _t0 = time.time()

    def _mark(name: str) -> None:
        nonlocal _t0
        phase_t[name] = round(time.time() - _t0, 2)
        _t0 = time.time()

    sort_exprs = None
    sort_chain = normalize_index_sort(index_sort)
    if sort_chain is not None:
        if doc_col is not None:
            raise ValueError(
                "index_sort requires key_cols mode (doc_col hands the caller "
                "control of the docID rank, which IS the sort)"
            )
        for sort_field, _ in sort_chain:
            if sort_field not in stored_fields:
                raise ValueError(
                    f"index_sort field {sort_field!r} must be in stored_fields "
                    "(sorted queries read its values from the stored table)"
                )
        sort_exprs = [
            (F.col(stored_fields[f]).asc() if asc else F.col(stored_fields[f]).desc())
            for f, asc in sort_chain
        ] + [F.col(c) for c in (key_cols or [])]
    if doc_col is not None:
        from ._spread import spread

        # doc_col mode consumes the caller's frame directly — a
        # single-row-group corpus file would serialize the whole
        # invert kernel into ONE task (key_cols mode avoids this as a
        # side effect of the range partitioning in the ids freeze)
        docs_df = spread(
            corpus.select(F.col(doc_col).cast("long").alias("doc"), *src_cols)
        )
    else:
        if not key_cols:
            raise ValueError("need doc_col or key_cols")
        doc_base = (parent.doc_max + 1) if parent else 0
        # prune to the columns the index actually consumes BEFORE the
        # ids freeze — the freeze is a full corpus write, and unindexed
        # columns (e.g. a transcript's tool/ts when only text is
        # indexed) would be written and re-read for nothing
        needed = sorted(set(key_cols) | set(src_cols))
        with_ids = assign_dense_doc_ids(
            corpus.select(*needed), key_cols, doc_base=doc_base,
            freeze_dir=os.path.join(seg_dir, "_tmp_ids"),
            order_exprs=sort_exprs,
        )
        docs_df = with_ids.select("doc", *src_cols)
    _mark("ids_freeze")

    blocks, termdict, doclen, inverted = build_postings(
        docs_df, n_shards=n_shards, block_size=block_size,
        store_positions=store_positions, store_offsets=store_offsets,
        store_payloads=store_payloads, payload_delim=payload_delim,
        freeze_dir=os.path.join(seg_dir, "_tmp_inverted"),
        fields_spec=fields_spec,
        analyzer=field_analyzers,
    )
    _mark("invert_freeze")

    # write order: data first (invisible), stats second, manifest last.
    # The three table writes are independent jobs over the frozen
    # inverted relation — run them CONCURRENTLY (Spark schedules tasks
    # from parallel actions into idle slots; the dict writes are light
    # while the blocks shuffle dominates).
    #
    # Segment/field stats and per-shard lineage ride ON the write jobs
    # as observed metrics (CollectMetrics: JVM-side conditional
    # aggregates evaluated while rows stream to Parquet) — zero extra
    # Spark jobs. The field set and shard domain are both known at
    # plan time (fields_spec; 0..n_shards-1), so grouped stats unroll
    # into per-group conditional aggregates.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import Observation

    all_fields = [s["field"] for s in fields_spec]
    obs_dl, obs_td, obs_bl = Observation(), Observation(), Observation()
    dl_exprs = [F.min("doc").alias("doc_min"), F.max("doc").alias("doc_max")]
    td_exprs = []
    for i, fld_ in enumerate(all_fields):
        # dl>0: the dl=0 roster rows make doclen a complete doc roster
        # (MatchAllDocsQuery), but per-field stats count only docs with
        # >=1 surviving token (Lucene docCount/avgdl semantics)
        c = (F.col("field") == fld_) & (F.col("dl") > 0)
        dl_exprs += [
            F.count(F.when(c, 1)).alias(f"nd_{i}"),
            F.sum(F.when(c, F.col("dl"))).alias(f"sdl_{i}"),
        ]
        ct = F.col("field") == fld_
        td_exprs += [
            F.count(F.when(ct, 1)).alias(f"nt_{i}"),
            F.sum(F.when(ct, F.col("df"))).alias(f"np_{i}"),
        ]
    # Per-shard lineage unrolls to 3 conditional aggregates per shard in
    # ONE CollectMetrics node — free at the default 32 shards, but a
    # Catalyst plan/codegen blowup at spark-submit scale (4096 shards =
    # ~12k expressions). Above the threshold, lineage comes from a tiny
    # groupBy('shard') read-back over the written postings instead.
    unroll_lineage = n_shards <= LINEAGE_UNROLL_MAX_SHARDS
    if unroll_lineage:
        bl_exprs = []
        for s_ in range(n_shards):
            c = F.col("shard") == s_
            bl_exprs += [
                F.count(F.when(c, 1)).alias(f"nb_{s_}"),
                F.sum(F.when(c, F.col("n"))).alias(f"npost_{s_}"),
                F.sum(F.when(c, F.length("docs") + F.length("tfs") + F.length("dlqs")
                             + F.coalesce(F.length("positions"), F.lit(0)))).alias(f"pb_{s_}"),
            ]
        blocks = blocks.observe(obs_bl, *bl_exprs)
    termdict = termdict.observe(obs_td, *td_exprs)
    doclen = doclen.observe(obs_dl, *dl_exprs)

    with ThreadPoolExecutor(4) as pool:
        jobs = [
            pool.submit(lambda: blocks.write.mode("errorifexists").parquet(os.path.join(seg_dir, "postings"))),
            pool.submit(lambda: termdict.write.mode("errorifexists").parquet(os.path.join(seg_dir, "termdict"))),
            pool.submit(lambda: doclen.write.mode("errorifexists").parquet(os.path.join(seg_dir, "doclen"))),
        ]
        if stored_fields:
            # index-owned stored/doc-values table, co-sharded with the
            # postings (shard = doc % n_shards) so per-shard kernels can
            # receive doc-values filters as a cogrouped side input
            stored = docs_df.select(
                F.pmod(F.col("doc"), F.lit(n_shards)).cast("int").alias("shard"),
                F.col("doc"),
                *[F.col(c).alias(f) for f, c in sorted(stored_fields.items())],
            )
            jobs.append(
                pool.submit(lambda: stored.write.mode("errorifexists").parquet(os.path.join(seg_dir, "stored")))
            )
        for j in jobs:
            j.result()
    _mark("table_writes")

    # the write jobs are done — their observed metrics ARE the stats
    # (the r3-era read-back jobs are gone; ~1-2 s fixed cost per build)
    mdl, mtd = obs_dl.get, obs_td.get
    field_stats: dict[str, dict] = {}
    for i, fld_ in enumerate(all_fields):
        nd, nt = int(mdl[f"nd_{i}"]), int(mtd[f"nt_{i}"])
        if nd == 0 and nt == 0:
            continue  # field absent from this segment (matches the old groupBy shape)
        field_stats[fld_] = {
            "n_docs": nd,
            "sum_dl": int(mdl[f"sdl_{i}"] or 0),
            "n_terms": nt,
            "n_postings": int(mtd[f"np_{i}"] or 0),
        }
    pstats = field_stats.get(primary, {"n_docs": 0, "sum_dl": 0, "n_terms": 0, "n_postings": 0})
    doc_min = int(mdl["doc_min"]) if mdl["doc_min"] is not None else 0
    doc_max = int(mdl["doc_max"]) if mdl["doc_max"] is not None else -1
    # per-partition lineage — one record per shard: segment IDs,
    # doc/term counts, bytes (BASELINE.json north_star metrics)
    if unroll_lineage:
        mbl = obs_bl.get
        shard_rows = [
            (s_, int(mbl[f"nb_{s_}"]), int(mbl[f"npost_{s_}"] or 0),
             int(mbl[f"pb_{s_}"] or 0))
            for s_ in range(n_shards)
        ]
    else:
        shard_rows = [
            (int(r["shard"]), int(r["nb"]), int(r["np"] or 0), int(r["pb"] or 0))
            for r in spark.read.parquet(os.path.join(seg_dir, "postings"))
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("nb"),
                F.sum("n").alias("np"),
                F.sum(F.length("docs") + F.length("tfs") + F.length("dlqs")
                      + F.coalesce(F.length("positions"), F.lit(0))).alias("pb"),
            )
            .collect()
        ]
    _mark("stats_jobs")
    lineage = [{"fingerprint": fingerprint, "phase_seconds": phase_t}] + [
        {"shard": s_, "n_blocks": nb_, "n_postings": np_, "payload_bytes": pb_}
        for s_, nb_, np_, pb_ in sorted(shard_rows)
        if nb_
    ]
    # drop the frozen intermediates (ids, inverted) before sizing
    import shutil

    for tmp in ("_tmp_ids", "_tmp_inverted"):
        shutil.rmtree(os.path.join(seg_dir, tmp), ignore_errors=True)
    # fingerprint AFTER dropping intermediates: the hash must describe
    # exactly the published segment contents
    seg_bytes, seg_hash = dir_fingerprint(seg_dir)
    _mark("finalize")

    # n_docs = docs with >=1 token in the PRIMARY field (Lucene's
    # per-field docCount — docs lacking the field don't count for its
    # avgdl); doc_min/doc_max span all fields.
    seg = SegmentMeta(
        segment_id=segment_id,
        path=rel,
        n_docs=pstats["n_docs"],
        sum_dl=pstats["sum_dl"],
        n_terms=pstats.get("n_terms", 0),
        n_postings=pstats.get("n_postings", 0),
        doc_min=doc_min,
        doc_max=doc_max,
        bytes=seg_bytes,
        lineage=lineage,
        field_stats=field_stats,
        content_hash=seg_hash,
        files=table_file_lists(seg_dir),
    )
    # Lock-free multi-writer commit (reference: FDBIndexWriter drops
    # the Directory lock, README.md:33-38): on a lost CAS race, reload
    # the winner's manifest and re-commit our already-written segment
    # on top of it. Safe only when docIDs cannot collide across racing
    # writers — true for doc_col mode (caller-owned unique keys); in
    # key_cols mode a racer may have claimed the same dense-id range,
    # so we refuse rather than publish overlapping docIDs.
    attempt_parent = parent
    while True:
        manifest = Manifest(
            version=catalog.next_version(),
            analyzer=analyzer_pin,
            block_size=block_size,
            n_shards=n_shards,
            segments=(attempt_parent.segments if attempt_parent else []) + [seg],
            parent_version=attempt_parent.version if attempt_parent else None,
            # start from the parent's properties: an append must CARRY
            # FORWARD deletes_path/n_deletes (and any future keys) — or
            # tombstoned docs would resurrect in the new snapshot
            properties={
                **(attempt_parent.properties if attempt_parent else {}),
                "store_positions": store_positions,
                "store_offsets": bool(store_offsets),
                "store_payloads": bool(store_payloads),
                **({"payload_delim": payload_delim} if payload_delim else {}),
                "primary_field": primary,
                "field_analyzers": dict(field_analyzers),
                "stored_fields": sorted(stored_fields),
                "keyword_fields": sorted(keyword_fields),
                **({"index_sort": sort_chain} if sort_chain else {}),
                **(
                    {"user_data": {str(k): str(v) for k, v in commit_user_data.items()}}
                    if commit_user_data is not None
                    else {}
                ),
            },
        )
        try:
            return catalog.commit(manifest)
        except CommitConflict:
            latest = catalog.load()
            if doc_col is None and latest.doc_max >= seg.doc_min:
                raise CommitConflict(
                    "concurrent append raced this build's dense docID range; "
                    "rebuild against the new snapshot (or use doc_col mode "
                    "for lock-free multi-writer appends)"
                )
            if latest.analyzer != analyzer_pin or latest.block_size != block_size or latest.n_shards != n_shards:
                raise
            attempt_parent = latest
