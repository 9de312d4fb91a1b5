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
import uuid
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import bm25, codec
from ..functions.analysis import ANALYZER_VERSION, _TOKEN_RE
from ..sources.manifest import IndexCatalog, Manifest, SegmentMeta

DEFAULT_N_SHARDS = 16
DEFAULT_BLOCK_SIZE = codec.BLOCK_SIZE

INVERTED_SCHEMA = T.StructType(
    [
        T.StructField("doc", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.LongType(), False),
        T.StructField("dl", T.LongType(), False),
        T.StructField("dlq", T.IntegerType(), False),
        T.StructField("positions", T.BinaryType(), True),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
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
    ]
)


def assign_dense_doc_ids(
    df: DataFrame,
    key_cols: list[str],
    doc_base: int = 0,
    num_partitions: int | None = None,
    freeze_dir: str | None = None,
) -> DataFrame:
    """Add a dense deterministic int64 `doc` column, ordered by key_cols.

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
    keyed = (
        df.repartitionByRange(num_partitions, *key_cols)
        .sortWithinPartitions(*key_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    keyed.write.mode("errorifexists").parquet(freeze_dir)
    frozen = spark.read.parquet(freeze_dir)
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


def _invert_factory(store_positions: bool, token_re: re.Pattern = _TOKEN_RE):
    """Tokenize + per-doc inversion kernel (the in-memory segment)."""

    def invert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            docs = pdf["doc"].to_numpy(np.int64)
            tok_lists = pdf["text"].fillna("").str.lower().str.findall(token_re)
            lens = tok_lists.str.len().to_numpy(np.int64)
            total = int(lens.sum())
            if total == 0:
                continue
            keep = lens > 0  # docs with no tokens produce no postings
            flat_terms = np.concatenate(
                [np.asarray(t, dtype=object) for t in tok_lists[keep]]
            )
            row_rep = np.repeat(np.flatnonzero(keep), lens[keep])
            starts = np.cumsum(lens[keep]) - lens[keep]
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
                    "doc": docs[r[pstarts]],
                    "term": uniques[c[pstarts]],
                    "tf": tf.astype(np.int64),
                    "dl": lens[r[pstarts]].astype(np.int64),
                    "dlq": bm25.int_to_byte4(lens[r[pstarts]]).astype(np.int32),
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
            yield out

    return invert


def _pack_factory(block_size: int, store_positions: bool):
    """Whole-partition vectorized block packer: one varbyte pass for
    all doc-gaps/tfs in the partition, per-block cost = byte slices."""

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        n = len(pdf)
        # sort=True: codes follow term lexicographic order, so the output
        # (and the Parquet row groups) are term-clustered AND term-sorted —
        # that is what makes row-group min/max stats prune term lookups
        tcodes, tuniq = pd.factorize(pdf["term"].to_numpy(), sort=True)
        shards = pdf["shard"].to_numpy(np.int64)
        order = np.lexsort((pdf["doc"].to_numpy(np.int64), shards, tcodes))
        tcodes, shards = tcodes[order], shards[order]
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
            pos_col = pdf["positions"].to_numpy()[order]
            plens = np.fromiter((len(x) for x in pos_col), dtype=np.int64, count=n)
            pbuf = b"".join(pos_col.tolist())
            poffs = np.concatenate(([0], np.cumsum(plens)))
            pos_bytes = [pbuf[poffs[a] : poffs[b]] for a, b in zip(bstarts.tolist(), bends.tolist())]
        else:
            pos_bytes = None
        yield pd.DataFrame(
            {
                "term": tuniq[tcodes[bstarts]],
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
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(doc, text) -> (blocks, termdict, doclen, inverted) DataFrames.

    blocks, termdict and doclen all branch from `inverted`. With
    freeze_dir set, the inverted relation is written to Parquet once
    and all three consumers read the frozen columnar copy — measured
    ~10x cheaper than Spark's in-memory columnar cache for this shape
    (millions of tiny rows with binary cells), and it doubles as the
    resumable intermediate of the build.
    """
    inverted = docs_df.select("doc", "text").mapInPandas(
        _invert_factory(store_positions), schema=INVERTED_SCHEMA
    )
    if freeze_dir is not None:
        inverted.write.mode("errorifexists").parquet(freeze_dir)
        inverted = docs_df.sparkSession.read.parquet(freeze_dir)
    withshard = inverted.withColumn(
        "shard", F.pmod(F.col("doc"), F.lit(n_shards)).cast("int")
    )
    termdict = inverted.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"), F.sum("tf").cast("long").alias("ttf")
    )
    doclen = inverted.groupBy("doc").agg(
        F.first("dl").alias("dl"), F.first("dlq").alias("dlq")
    )
    if pack_partitions is None:
        pack_partitions = docs_df.sparkSession.sparkContext.defaultParallelism
    blocks = (
        withshard.select("term", "shard", "doc", "tf", "dlq", "positions")
        .repartition(pack_partitions, "term", "shard")
        .mapInPandas(_pack_factory(block_size, store_positions), schema=POSTINGS_SCHEMA)
    )
    return blocks, termdict, doclen, inverted


def _dir_bytes(path: str) -> int:
    total = 0
    for base, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(base, f))
    return total


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    root: str,
    *,
    doc_col: str | None = None,
    key_cols: list[str] | None = None,
    text_col: str = "text",
    n_shards: int = DEFAULT_N_SHARDS,
    block_size: int = DEFAULT_BLOCK_SIZE,
    store_positions: bool = True,
    append: bool = False,
    fingerprint: str | None = None,
) -> Manifest:
    """Build (or append) one segment and commit a new snapshot.

    doc_col: existing int64 unique doc key; OR key_cols for dense-ID
    assignment (e.g. ["conv_id", "turn_idx"] per BASELINE.json docID).
    """
    catalog = IndexCatalog(root)
    parent: Manifest | None = None
    if catalog.exists():
        parent = catalog.load()
        if not append:
            raise ValueError(f"index exists at {root}; pass append=True")
        if parent.analyzer != ANALYZER_VERSION or parent.block_size != block_size or parent.n_shards != n_shards:
            raise ValueError("index config mismatch (analyzer/block_size/n_shards pinned at creation)")
        if fingerprint and any(
            s.lineage and s.lineage[0].get("fingerprint") == fingerprint for s in parent.segments
        ):
            return parent  # idempotent re-run: already committed

    version = catalog.next_version()
    segment_id = f"seg-v{version:06d}-{(fingerprint or uuid.uuid4().hex[:12])}"
    rel = catalog.new_segment_path(segment_id)
    seg_dir = os.path.join(root, rel)
    os.makedirs(seg_dir, exist_ok=True)

    if doc_col is not None:
        docs_df = corpus.select(
            F.col(doc_col).cast("long").alias("doc"), F.col(text_col).alias("text")
        )
    else:
        if not key_cols:
            raise ValueError("need doc_col or key_cols")
        doc_base = (parent.doc_max + 1) if parent else 0
        with_ids = assign_dense_doc_ids(
            corpus, key_cols, doc_base=doc_base,
            freeze_dir=os.path.join(seg_dir, "_tmp_ids"),
        )
        docs_df = with_ids.select("doc", F.col(text_col).alias("text"))

    blocks, termdict, doclen, inverted = build_postings(
        docs_df, n_shards=n_shards, block_size=block_size,
        store_positions=store_positions,
        freeze_dir=os.path.join(seg_dir, "_tmp_inverted"),
    )

    # write order: data first (invisible), stats second, manifest last
    blocks.write.mode("errorifexists").parquet(os.path.join(seg_dir, "postings"))
    termdict.write.mode("errorifexists").parquet(os.path.join(seg_dir, "termdict"))
    doclen.write.mode("errorifexists").parquet(os.path.join(seg_dir, "doclen"))

    dstats = spark.read.parquet(os.path.join(seg_dir, "doclen")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        F.min("doc").alias("doc_min"),
        F.max("doc").alias("doc_max"),
    ).collect()[0]
    tstats = spark.read.parquet(os.path.join(seg_dir, "termdict")).agg(
        F.count(F.lit(1)).alias("n_terms"), F.sum("df").alias("n_postings")
    ).collect()[0]
    # per-partition lineage: one record per shard (segment IDs, doc/term
    # counts, bytes — BASELINE.json north_star metrics)
    lineage_rows = (
        spark.read.parquet(os.path.join(seg_dir, "postings"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.sum(
                F.length("docs") + F.length("tfs") + F.length("dlqs")
                + F.coalesce(F.length("positions"), F.lit(0))
            ).alias("payload_bytes"),
        )
        .collect()
    )
    lineage = [{"fingerprint": fingerprint}] + [
        r.asDict() for r in sorted(lineage_rows, key=lambda r: r["shard"])
    ]
    # drop the frozen intermediates (ids, inverted) before sizing
    import shutil

    for tmp in ("_tmp_ids", "_tmp_inverted"):
        shutil.rmtree(os.path.join(seg_dir, tmp), ignore_errors=True)

    # docs whose text tokenizes to nothing still count for N/avgdl in
    # Lucene only if they have the field; our contract: every corpus row
    # is a doc. Track both; n_docs here = docs with >=1 token.
    n_corpus = int(dstats["n_docs"])

    seg = SegmentMeta(
        segment_id=segment_id,
        path=rel,
        n_docs=n_corpus,
        sum_dl=int(dstats["sum_dl"] or 0),
        n_terms=int(tstats["n_terms"]),
        n_postings=int(tstats["n_postings"] or 0),
        doc_min=int(dstats["doc_min"]) if dstats["doc_min"] is not None else 0,
        doc_max=int(dstats["doc_max"]) if dstats["doc_max"] is not None else -1,
        bytes=_dir_bytes(seg_dir),
        lineage=lineage,
    )
    manifest = Manifest(
        version=version,
        analyzer=ANALYZER_VERSION,
        block_size=block_size,
        n_shards=n_shards,
        segments=(parent.segments if parent else []) + [seg],
        parent_version=parent.version if parent else None,
        properties={"store_positions": store_positions},
    )
    return catalog.commit(manifest)
