"""Segment merge: associative reduce over compressed postings.

The reference merges via Lucene `writer.addIndexes(dir1, dir2)`
(reference: SimpleFDBDirectoryTest.java:161-187) — read every source
segment, rewrite merged segments, commit by rename. Our segments
carry disjoint docID ranges (dense per-segment allocation with
doc_base offsets, like Lucene's docBase), which makes merge
associative and — in `concat` mode — entirely compressed-domain
(BASELINE.json north_rule: "never decompressing in per-row Python"):

- concat: blocks are already internally delta+varbyte packed and
  docID-disjoint across segments, so a merged posting list is just
  the segments' block lists renumbered in docID order. Pure DataFrame
  work: union + window row_number. Zero decode.
- repack: applyInPandas per (term, shard) — numpy decode, concat,
  re-pack to full blocks. Use when many appends left short tail
  blocks (block-max bounds get tighter, scans fewer rows).

`add_indexes` merges foreign index roots with docID rebase (the
exact addIndexes semantics), which requires repack since the first
delta of every block is absolute.

Scale note: the window in concat mode partitions by (term, shard) —
the salt keeps hot-term groups bounded (n_docs / n_shards / block
postings each); at 10^12 turns you raise n_shards at index creation,
not this code.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import codec
from ..sources.manifest import IndexCatalog, Manifest, SegmentMeta
from .build import POSTINGS_SCHEMA, _dir_bytes


def _repack_factory(block_size: int, store_positions: bool):
    """Per-(term, shard) numpy block repack; optional docID offset col."""

    def repack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, shard = key[0], int(key[1])
        pdf = pdf.sort_values(["min_doc", "block_id"], ignore_index=True)
        docs_l, tfs_l, pos_l, dlq_l = [], [], [], []
        for _, r in pdf.iterrows():
            d = codec.decode_doc_block(r["docs"])
            t = codec.decode_tf_block(r["tfs"])
            q = np.frombuffer(r["dlqs"], dtype=np.uint8).astype(np.int64)
            off = int(r["doc_off"]) if "doc_off" in pdf.columns else 0
            docs_l.append(d + off)
            tfs_l.append(t)
            dlq_l.append(q)
            if store_positions:
                flat, _ = codec.decode_positions_block(r["positions"], t)
                pos_l.append(flat)
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        dlqs = np.concatenate(dlq_l)
        flat_pos = np.concatenate(pos_l) if store_positions else None
        order = np.argsort(docs, kind="mergesort")
        if not np.array_equal(order, np.arange(docs.size)):
            # positions are per-posting variable length; reorder via splits
            if store_positions:
                bounds = np.cumsum(tfs) - tfs
                flat_pos = np.concatenate(
                    [flat_pos[bounds[i] : bounds[i] + tfs[i]] for i in order]
                )
            docs, tfs, dlqs = docs[order], tfs[order], dlqs[order]
        rows = []
        for blk in codec.pack_blocks(docs, tfs, flat_pos, dlqs, block_size):
            rows.append(
                (
                    term,
                    shard,
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
        return pd.DataFrame(rows, columns=[f.name for f in POSTINGS_SCHEMA.fields])

    return repack


def _write_merged(
    spark: SparkSession,
    catalog: IndexCatalog,
    manifest: Manifest,
    blocks: DataFrame,
    termdict: DataFrame,
    doclen: DataFrame,
    seg_stats: dict,
    lineage_extra: dict,
) -> Manifest:
    version = catalog.next_version()
    segment_id = f"seg-v{version:06d}-merge-{uuid.uuid4().hex[:8]}"
    rel = catalog.new_segment_path(segment_id)
    seg_dir = os.path.join(catalog.root, rel)
    blocks.write.mode("errorifexists").parquet(os.path.join(seg_dir, "postings"))
    termdict.write.mode("errorifexists").parquet(os.path.join(seg_dir, "termdict"))
    doclen.write.mode("errorifexists").parquet(os.path.join(seg_dir, "doclen"))
    tstats = spark.read.parquet(os.path.join(seg_dir, "termdict")).agg(
        F.count(F.lit(1)).alias("n_terms"), F.sum("df").alias("n_postings")
    ).collect()[0]
    seg = SegmentMeta(
        segment_id=segment_id,
        path=rel,
        n_docs=seg_stats["n_docs"],
        sum_dl=seg_stats["sum_dl"],
        n_terms=int(tstats["n_terms"]),
        n_postings=int(tstats["n_postings"] or 0),
        doc_min=seg_stats["doc_min"],
        doc_max=seg_stats["doc_max"],
        bytes=_dir_bytes(seg_dir),
        lineage=[lineage_extra],
    )
    merged = Manifest(
        version=version,
        analyzer=manifest.analyzer,
        block_size=manifest.block_size,
        n_shards=manifest.n_shards,
        segments=[seg],
        parent_version=manifest.version,
        properties=dict(manifest.properties),
    )
    return catalog.commit(merged)


def merge_segments(spark: SparkSession, root: str, mode: str = "concat") -> Manifest:
    """Consolidate all segments of an index into one (L20)."""
    catalog = IndexCatalog(root)
    manifest = catalog.load()
    if len(manifest.segments) <= 1 and mode == "concat":
        return manifest
    postings = spark.read.parquet(*manifest.segment_paths(root, "postings"))
    termdict_raw = spark.read.parquet(*manifest.segment_paths(root, "termdict"))
    doclen = spark.read.parquet(*manifest.segment_paths(root, "doclen"))
    termdict = termdict_raw.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("ttf").alias("ttf")
    )
    store_positions = bool(manifest.properties.get("store_positions", True))
    if mode == "concat":
        w = Window.partitionBy("term", "shard").orderBy("min_doc", "block_id")
        blocks = postings.withColumn(
            "block_id", (F.row_number().over(w) - F.lit(1)).cast("int")
        ).select(*[f.name for f in POSTINGS_SCHEMA.fields])
    elif mode == "repack":
        blocks = postings.groupBy("term", "shard").applyInPandas(
            _repack_factory(manifest.block_size, store_positions), schema=POSTINGS_SCHEMA
        )
    else:
        raise ValueError(f"unknown merge mode {mode!r}")
    seg_stats = {
        "n_docs": manifest.n_docs,
        "sum_dl": manifest.sum_dl,
        "doc_min": min(s.doc_min for s in manifest.segments),
        "doc_max": manifest.doc_max,
    }
    lineage = {
        "op": f"merge-{mode}",
        "inputs": [s.segment_id for s in manifest.segments],
    }
    return _write_merged(spark, catalog, manifest, blocks, termdict, doclen, seg_stats, lineage)


def add_indexes(spark: SparkSession, dest_root: str, src_roots: list[str]) -> Manifest:
    """Merge foreign index roots into dest with docID rebase — the
    `writer3.addIndexes(dir1, dir2)` semantics (reference:
    SimpleFDBDirectoryTest.java:180-186). Requires repack because the
    first delta of each docs block is absolute."""
    dest_cat = IndexCatalog(dest_root)
    manifests = [IndexCatalog(r).load() for r in src_roots]
    base = manifests[0]
    for m in manifests[1:]:
        if (m.analyzer, m.block_size, m.n_shards) != (base.analyzer, base.block_size, base.n_shards):
            raise ValueError("cannot addIndexes across mismatched index configs")
    offsets = []
    acc = 0
    for m in manifests:
        offsets.append(acc - min((s.doc_min for s in m.segments), default=0))
        acc += m.doc_max + 1 - min((s.doc_min for s in m.segments), default=0)
    postings = None
    doclen = None
    termdicts = []
    for root, m, off in zip(src_roots, manifests, offsets):
        p = spark.read.parquet(*m.segment_paths(root, "postings")).withColumn(
            "doc_off", F.lit(off).cast("long")
        )
        d = spark.read.parquet(*m.segment_paths(root, "doclen")).withColumn(
            "doc", F.col("doc") + F.lit(off)
        )
        postings = p if postings is None else postings.unionByName(p)
        doclen = d if doclen is None else doclen.unionByName(d)
        termdicts.append(spark.read.parquet(*m.segment_paths(root, "termdict")))
    termdict = termdicts[0]
    for t in termdicts[1:]:
        termdict = termdict.unionByName(t)
    termdict = termdict.groupBy("term").agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
    store_positions = all(m.properties.get("store_positions", True) for m in manifests)
    blocks = postings.groupBy("term", "shard").applyInPandas(
        _repack_factory(base.block_size, store_positions), schema=POSTINGS_SCHEMA
    )
    # shard stays the source's doc%n_shards even after rebase: it is a
    # salt, and all of a doc's postings still share one shard value,
    # which is the only property query/merge kernels rely on.
    seg_stats = {
        "n_docs": sum(m.n_docs for m in manifests),
        "sum_dl": sum(m.sum_dl for m in manifests),
        "doc_min": 0,
        "doc_max": acc - 1,
    }
    synthetic_parent = Manifest(
        version=dest_cat.next_version() - 1 if dest_cat.exists() else 0,
        analyzer=base.analyzer,
        block_size=base.block_size,
        n_shards=base.n_shards,
        segments=[],
        properties={"store_positions": store_positions},
    )
    lineage = {"op": "addIndexes", "inputs": src_roots, "offsets": offsets}
    return _write_merged(spark, dest_cat, synthetic_parent, blocks, termdict, doclen, seg_stats, lineage)
