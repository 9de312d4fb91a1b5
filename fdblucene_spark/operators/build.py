"""Index build: corpus DataFrame -> block-compressed posting segment.

The Spark re-expression of the reference's indexing path
(IndexWriter.addDocument -> Lucene80Codec -> FDB pages; trace in
SURVEY.md section 3.1). Every stage is declarative DataFrame work or
an Arrow-batched kernel; there is no per-row Python anywhere:

1. dense docID assignment — range-partition + in-partition sort + two-
   pass offset add (scales: no global window; the reference's docID
   allocator is a transactional counter, DATA.md:17-22);
2. tokenize (versioned analyzer, functions/analysis.py) + posexplode
   (JVM) -> (doc, pos, term);
3. groupBy(doc, term) -> tf + sorted position list (the logical
   postings of DATA.md:53-54), Catalyst partial+final aggregation;
4. doc length via window-sum over doc + SmallFloat quantization
   (norms, DATA.md:37);
5. salted shuffle: shard = doc % n_shards keeps every doc's postings
   for all terms co-located per shard (so AND/phrase intersect locally)
   while splitting hot Zipf terms across shards (north_rule skew
   handling);
6. mapInPandas block packer: delta+varbyte blocks with per-block
   (min_doc, max_doc, max_tf, min_dlq) — the block-max metadata;
7. Parquet segment (postings + termdict + doclen) at an invisible
   task-unique path, then manifest commit publishes it atomically.

Idempotence/resume: pass a build `fingerprint`; if the current
manifest already carries a segment with that fingerprint the build is
a no-op (reference analogue: applyIfExists write-after-delete
tolerance, FDBIndexOutput.java:182-189, and snapshot-checkpoint
resume per BASELINE.json).
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import bm25, codec
from ..functions.analysis import ANALYZER_VERSION, exploded_terms
from ..sources.manifest import IndexCatalog, Manifest, SegmentMeta

DEFAULT_N_SHARDS = 16
DEFAULT_BLOCK_SIZE = codec.BLOCK_SIZE

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


@F.pandas_udf(T.IntegerType())
def _dlq_udf(dl: pd.Series) -> pd.Series:
    """SmallFloat intToByte4 norm quantization, Arrow-batched."""
    return pd.Series(bm25.int_to_byte4(dl.to_numpy(np.int64)), dtype="int32")


def assign_dense_doc_ids(
    df: DataFrame,
    key_cols: list[str],
    doc_base: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense deterministic int64 `doc` column, ordered by key_cols.

    Scalable dense-ID assignment without a global single-partition
    window: range-partition by key, sort within partitions, count per
    partition (pass 1), then add cumulative offsets in a mapInPandas
    (pass 2). Because range partitions are non-overlapping and rows are
    sorted within each, the key->id mapping is independent of where the
    sampled boundaries fall — deterministic for unique keys.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    keyed = df.repartitionByRange(num_partitions, *key_cols).sortWithinPartitions(*key_cols)
    keyed = keyed.persist(StorageLevel.MEMORY_AND_DISK)
    counts = dict(
        keyed.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    )
    offsets = {}
    acc = doc_base
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)
    out_schema = T.StructType(df.schema.fields + [T.StructField("doc", T.LongType(), False)])

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        start = b_offsets.value.get(pid, 0)
        for pdf in batches:
            pdf = pdf.copy()
            pdf["doc"] = np.arange(start, start + len(pdf), dtype=np.int64)
            start += len(pdf)
            yield pdf

    return keyed.mapInPandas(add_ids, schema=out_schema)


def _pack_factory(block_size: int, store_positions: bool):
    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(["term", "shard", "doc"], kind="mergesort", ignore_index=True)
        terms = pdf["term"].to_numpy()
        shards = pdf["shard"].to_numpy()
        docs = pdf["doc"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dlqs = pdf["dlq"].to_numpy(np.int64)
        poslists = pdf["positions"].to_numpy() if store_positions else None
        change = np.flatnonzero((terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(pdf)]))
        rows = []
        for s, e in zip(starts, ends):
            flat_pos = None
            if store_positions:
                flat_pos = (
                    np.concatenate([np.asarray(p, dtype=np.int64) for p in poslists[s:e]])
                    if e > s
                    else np.empty(0, dtype=np.int64)
                )
            for blk in codec.pack_blocks(
                docs[s:e], tfs[s:e], flat_pos, dlqs[s:e], block_size
            ):
                rows.append(
                    (
                        terms[s],
                        int(shards[s]),
                        blk["block_id"],
                        blk["n"],
                        blk["min_doc"],
                        blk["max_doc"],
                        blk["max_tf"],
                        blk["min_dlq"],
                        blk["docs"],
                        blk["tfs"],
                        blk["dlqs"],
                        blk["positions"] if store_positions else None,
                    )
                )
        yield pd.DataFrame(rows, columns=[f.name for f in POSTINGS_SCHEMA.fields])

    return pack


def build_postings(
    docs_df: DataFrame,
    n_shards: int = DEFAULT_N_SHARDS,
    block_size: int = DEFAULT_BLOCK_SIZE,
    store_positions: bool = True,
    ascii_fast_path: bool = False,
    pack_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(doc, text) -> (postings_blocks, termdict, doclen) DataFrames."""
    terms = exploded_terms(docs_df, doc_col="doc", text_col="text", ascii_fast_path=ascii_fast_path)
    agg_cols = [F.count(F.lit(1)).cast("long").alias("tf")]
    if store_positions:
        agg_cols.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    postings = terms.groupBy("doc", "term").agg(*agg_cols)
    postings = postings.withColumn("dl", F.sum("tf").over(Window.partitionBy("doc")))
    postings = postings.withColumn("dlq", _dlq_udf(F.col("dl")))
    postings = postings.withColumn(
        "shard", F.pmod(F.col("doc"), F.lit(n_shards)).cast("int")
    )
    termdict = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"), F.sum("tf").cast("long").alias("ttf")
    )
    doclen = postings.groupBy("doc").agg(
        F.first("dl").alias("dl"), F.first("dlq").alias("dlq")
    )
    sel = ["term", "shard", "doc", "tf", "dlq"] + (["positions"] if store_positions else [])
    packed_in = postings.select(*sel)
    if not store_positions:
        packed_in = packed_in.withColumn("positions", F.lit(None).cast(T.ArrayType(T.IntegerType())))
    if pack_partitions is None:
        pack_partitions = docs_df.sparkSession.sparkContext.defaultParallelism
    blocks = packed_in.repartition(pack_partitions, "term", "shard").mapInPandas(
        _pack_factory(block_size, True), schema=POSTINGS_SCHEMA
    )
    return blocks, termdict, doclen


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
    ascii_fast_path: bool = False,
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

    if doc_col is not None:
        docs_df = corpus.select(
            F.col(doc_col).cast("long").alias("doc"), F.col(text_col).alias("text")
        )
    else:
        if not key_cols:
            raise ValueError("need doc_col or key_cols")
        doc_base = (parent.doc_max + 1) if parent else 0
        with_ids = assign_dense_doc_ids(corpus, key_cols, doc_base=doc_base)
        docs_df = with_ids.select("doc", F.col(text_col).alias("text"))

    blocks, termdict, doclen = build_postings(
        docs_df,
        n_shards=n_shards,
        block_size=block_size,
        store_positions=store_positions,
        ascii_fast_path=ascii_fast_path,
    )

    version = catalog.next_version()
    segment_id = f"seg-v{version:06d}-{(fingerprint or uuid.uuid4().hex[:12])}"
    rel = catalog.new_segment_path(segment_id)
    seg_dir = os.path.join(root, rel)

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
            F.sum(F.length("docs") + F.length("tfs") + F.length("dlqs") + F.length("positions")).alias("payload_bytes"),
        )
        .collect()
    )
    lineage = [{"fingerprint": fingerprint}] + [r.asDict() for r in sorted(lineage_rows, key=lambda r: r["shard"])]

    seg = SegmentMeta(
        segment_id=segment_id,
        path=rel,
        n_docs=int(dstats["n_docs"]),
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
