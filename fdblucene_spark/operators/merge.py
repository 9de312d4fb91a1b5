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
  re-pack to full blocks, and APPLY DELETES physically (the snapshot's
  delete list drops out of the manifest and df/ttf/avgdl are
  recomputed from surviving postings — Lucene's merge semantics).

`add_indexes` merges foreign index roots with docID rebase (the
exact addIndexes semantics), which requires repack since the first
delta of every block is absolute.

Scale note: the window in concat mode partitions by (term, shard) —
the salt keeps hot-term groups bounded; at 10^12 turns you raise
n_shards at index creation, not this code.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import codec
from ..sources.manifest import (
    IndexCatalog, Manifest, SegmentMeta, dir_fingerprint, table_file_lists,
)
from .build import POSTINGS_SCHEMA

TERMDICT_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("ttf", T.LongType(), False),
    ]
)


def _ensure_postings_cols(df: DataFrame) -> DataFrame:
    """Add any POSTINGS_SCHEMA columns missing from an older segment's
    files as typed nulls (schema evolution: e.g. the payloads column) —
    merges mix segment generations freely."""
    for f in POSTINGS_SCHEMA.fields:
        if f.name not in df.columns:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    return df


def _sorted_member(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """vals[i] in sorted_arr via searchsorted — O(n log m), no hashing."""
    idx = np.searchsorted(sorted_arr, vals)
    ok = idx < sorted_arr.size
    hit = np.zeros(vals.size, dtype=bool)
    if ok.any():
        hit[ok] = sorted_arr[idx[ok]] == vals[ok]
    return hit


def _repack_group(
    fld: str,
    term: str,
    shard: int,
    pdf: pd.DataFrame,
    block_size: int,
    store_positions: bool,
    store_offsets: bool,
    deleted: np.ndarray | None,
    store_payloads: bool = False,
) -> pd.DataFrame:
    """One (field, term, shard) group's numpy block repack; optional
    docID offset col and physical delete application (deleted = SORTED
    unique docIDs, probed with searchsorted). Positions AND character
    offsets (when stored) survive the repack: both are per-occurrence
    flat arrays filtered/reordered with the same posting gather."""
    pdf = pdf.sort_values(["min_doc", "block_id"], ignore_index=True)
    return _repack_core(fld, term, shard, pdf, block_size, store_positions,
                        store_offsets, deleted, store_payloads)


def _repack_factory(
    block_size: int,
    store_positions: bool,
    store_offsets: bool = False,
    store_payloads: bool = False,
):
    """Per-(field, term, shard) repack kernel for the NO-DELETES paths
    (segment consolidation, addIndexes rebase): full (field, term,
    shard) parallelism. The delete-applying path uses
    _repack_shard_factory instead — a per-shard COGROUP with the
    tombstone list, so delete application stays distributed (never a
    driver-pickled array; reference scale contract, README.md:33-38)."""

    def repack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return _repack_group(
            key[0], key[1], int(key[2]), pdf, block_size, store_positions,
            store_offsets, None, store_payloads,
        )

    return repack


def _repack_shard_factory(block_size: int, store_positions: bool, store_offsets: bool,
                          store_payloads: bool = False):
    """Cogrouped per-shard repack WITH physical delete application:
    left = one shard's posting blocks, right = that shard's tombstones
    (shard = doc % n_shards co-locates them — same aux-cogroup pattern
    as the query path's _aux_frames). Parallelism = n_shards, the knob
    an operator raises with corpus size; a billion tombstones stream
    through the shuffle like any other table and each kernel sees only
    its shard's slice, probed via sorted searchsorted."""

    def repack(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {f.name: pd.Series(dtype=object) for f in POSTINGS_SCHEMA.fields}
        ).iloc[:0]
        if left.empty:
            return empty
        deleted = None
        if right is not None and len(right):
            deleted = np.unique(right["doc"].to_numpy(np.int64))
        outs = []
        for (fld, term), pdf in left.groupby(["field", "term"], sort=False):
            shard = int(pdf.iloc[0]["shard"])
            r = _repack_group(
                fld, term, shard, pdf, block_size, store_positions,
                store_offsets, deleted, store_payloads,
            )
            if len(r):
                outs.append(r)
        return pd.concat(outs, ignore_index=True) if outs else empty

    return repack


def _decode_group(
    pdf: pd.DataFrame,
    store_positions: bool,
    store_offsets: bool,
    deleted: np.ndarray | None,
    store_payloads: bool = False,
) -> dict | None:
    """Decode one posting group's blocks to flat arrays SORTED by docID
    (per-occurrence arrays gathered with the same permutation), with
    optional docID rebase (doc_off column) and physical delete
    application. Shared by the repack and reshard kernels. A group is
    single-field; keyword-field blocks carry no offsets cell even in
    an offsets index."""
    has_off = bool(store_offsets and len(pdf) and pdf.iloc[0]["offsets"])
    has_pay = bool(
        store_payloads and len(pdf) and "payloads" in pdf.columns and pdf.iloc[0]["payloads"]
    )
    docs_l, tfs_l, pos_l, dlq_l, ost_l, oln_l, pay_l = [], [], [], [], [], [], []
    for _, r in pdf.iterrows():
        d = codec.decode_doc_block(r["docs"])
        t = codec.decode_tf_block(r["tfs"])
        q = np.frombuffer(r["dlqs"], dtype=np.uint8).astype(np.int64)
        flat = None
        ost = oln = pay = None
        if store_positions:
            flat, _ = codec.decode_positions_block(r["positions"], t)
        if has_off:
            o_s, o_e, _ = codec.decode_offsets_block(r["offsets"], t)
            ost, oln = o_s, o_e - o_s
        if has_pay:
            pay, _ = codec.decode_payloads_block(r["payloads"], t)
        off = int(r["doc_off"]) if "doc_off" in pdf.columns else 0
        if deleted is not None and deleted.size and d.size:
            live = ~_sorted_member(deleted, d)
            occ_live = np.repeat(live, t)
            if store_positions:
                flat = flat[occ_live]
            if has_off:
                ost, oln = ost[occ_live], oln[occ_live]
            if has_pay:
                pay = pay[occ_live]
            d, t, q = d[live], t[live], q[live]
        if d.size == 0:
            continue
        docs_l.append(d + off)
        tfs_l.append(t)
        dlq_l.append(q)
        if store_positions:
            pos_l.append(flat)
        if has_off:
            ost_l.append(ost)
            oln_l.append(oln)
        if has_pay:
            pay_l.append(pay)
    if not docs_l:
        return None
    docs = np.concatenate(docs_l)
    tfs = np.concatenate(tfs_l)
    dlqs = np.concatenate(dlq_l)
    flat_pos = np.concatenate(pos_l) if store_positions else None
    flat_ost = np.concatenate(ost_l) if has_off else None
    flat_oln = np.concatenate(oln_l) if has_off else None
    flat_pay = np.concatenate(pay_l) if has_pay else None
    order = np.argsort(docs, kind="mergesort")
    if not np.array_equal(order, np.arange(docs.size)):
        bounds = np.cumsum(tfs) - tfs
        gather = np.concatenate(
            [np.arange(bounds[i], bounds[i] + tfs[i]) for i in order]
        ) if (store_positions or has_off or has_pay) else None
        if store_positions:
            flat_pos = flat_pos[gather]
        if has_off:
            flat_ost, flat_oln = flat_ost[gather], flat_oln[gather]
        if has_pay:
            flat_pay = flat_pay[gather]
        docs, tfs, dlqs = docs[order], tfs[order], dlqs[order]
    return {
        "docs": docs, "tfs": tfs, "dlqs": dlqs, "pos": flat_pos,
        "ost": flat_ost, "oln": flat_oln, "pay": flat_pay,
        "has_off": has_off, "has_pay": has_pay,
    }


def _pack_group_rows(
    fld: str, term: str, shard: int, g: dict, block_size: int, store_positions: bool
) -> list[tuple]:
    rows = []
    for blk in codec.pack_blocks(
        g["docs"], g["tfs"], g["pos"], g["dlqs"], block_size,
        flat_off_starts=g["ost"], flat_off_lens=g["oln"], flat_payloads=g["pay"],
    ):
        rows.append(
            (
                fld, term, shard, blk["block_id"], blk["n"], blk["min_doc"],
                blk["max_doc"], blk["max_tf"], blk["min_dlq"], blk["docs"],
                blk["tfs"], blk["dlqs"],
                blk["positions"] if store_positions else None,
                blk["offsets"],
                blk["payloads"],
            )
        )
    return rows


def _repack_core(
    fld: str,
    term: str,
    shard: int,
    pdf: pd.DataFrame,
    block_size: int,
    store_positions: bool,
    store_offsets: bool,
    deleted: np.ndarray | None,
    store_payloads: bool = False,
) -> pd.DataFrame:
    g = _decode_group(pdf, store_positions, store_offsets, deleted, store_payloads)
    if g is None:
        return pd.DataFrame({f.name: pd.Series(dtype=object) for f in POSTINGS_SCHEMA.fields}).iloc[:0]
    rows = _pack_group_rows(fld, term, shard, g, block_size, store_positions)
    return pd.DataFrame(rows, columns=[f.name for f in POSTINGS_SCHEMA.fields])


def termdict_from_blocks(blocks: DataFrame) -> DataFrame:
    """Recompute (term, df, ttf) from packed blocks — needed when a
    repack changed the surviving postings (delete application)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ttfs = [int(codec.decode_tf_block(b).sum()) for b in pdf["tfs"]]
            yield pd.DataFrame(
                {"field": pdf["field"], "term": pdf["term"],
                 "df": pdf["n"].astype("int64"), "ttf": ttfs}
            )

    per_block = blocks.mapInPandas(stats, schema=TERMDICT_SCHEMA)
    return per_block.groupBy("field", "term").agg(
        F.sum("df").cast("long").alias("df"), F.sum("ttf").cast("long").alias("ttf")
    )


def _write_merged(
    spark: SparkSession,
    catalog: IndexCatalog,
    manifest: Manifest,
    blocks: DataFrame,
    termdict: DataFrame,
    doclen: DataFrame,
    lineage_extra: dict,
    properties: dict | None = None,
    stored: DataFrame | None = None,
    keep_segments: list[SegmentMeta] | None = None,
    fields_override: list[str] | None = None,
    termdict_from_written: bool = False,
) -> Manifest:
    """termdict_from_written: callers whose termdict would be DERIVED
    from `blocks` (sorted merge, delete repack, split) pass True and
    termdict=None — the dict is then computed from the postings
    parquet AFTER the blocks write lands, so the expensive
    decode/repack pipeline runs ONCE instead of once per consumer
    (blocks.write and termdict.write evaluated it concurrently)."""
    version = catalog.next_version()
    segment_id = f"seg-v{version:06d}-merge-{uuid.uuid4().hex[:8]}"
    rel = catalog.new_segment_path(segment_id)
    seg_dir = os.path.join(catalog.root, rel)
    # field/segment stats ride on the write jobs as observed metrics
    # (same zero-extra-job pattern as build_index): the field domain is
    # known from the source manifest, so the per-field groupBy unrolls
    # into conditional aggregates evaluated while rows stream out. The
    # independent table writes run concurrently.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import Observation

    # fields_override: callers whose `manifest` is synthetic (addIndexes
    # builds a parent with segments=[], so manifest.fields() would
    # collapse to ['text']) pass the true field domain from their
    # sources — otherwise keyword/secondary-field stats would be
    # silently dropped and BM25 idf/norms on those fields would fall
    # back to primary/global stats.
    all_fields = list(fields_override) if fields_override else manifest.fields()
    obs_dl, obs_td = Observation(), Observation()
    dl_exprs = [F.min("doc").alias("doc_min"), F.max("doc").alias("doc_max")]
    td_exprs = []
    for i, fld_ in enumerate(all_fields):
        # dl>0: doclen carries dl=0 roster rows (complete live-doc
        # domain for MatchAllDocsQuery) that must not count toward
        # per-field docCount/avgdl — same filter as build_index
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
    doclen = doclen.observe(obs_dl, *dl_exprs)
    if not termdict_from_written:
        termdict = termdict.observe(obs_td, *td_exprs)
    with ThreadPoolExecutor(4) as pool:
        jobs = [
            pool.submit(lambda: blocks.write.mode("errorifexists").parquet(os.path.join(seg_dir, "postings"))),
            pool.submit(lambda: doclen.write.mode("errorifexists").parquet(os.path.join(seg_dir, "doclen"))),
        ]
        if not termdict_from_written:
            jobs.append(pool.submit(lambda: termdict.write.mode("errorifexists").parquet(os.path.join(seg_dir, "termdict"))))
        if stored is not None:
            jobs.append(pool.submit(lambda: stored.write.mode("errorifexists").parquet(os.path.join(seg_dir, "stored"))))
        for j in jobs:
            j.result()
    if termdict_from_written:
        termdict = termdict_from_blocks(
            spark.read.parquet(os.path.join(seg_dir, "postings"))
        ).observe(obs_td, *td_exprs)
        termdict.write.mode("errorifexists").parquet(os.path.join(seg_dir, "termdict"))
    mdl, mtd = obs_dl.get, obs_td.get
    field_stats: dict[str, dict] = {}
    for i, fld_ in enumerate(all_fields):
        nd, nt = int(mdl[f"nd_{i}"]), int(mtd[f"nt_{i}"])
        if nd == 0 and nt == 0:
            continue
        field_stats[fld_] = {
            "n_docs": nd, "sum_dl": int(mdl[f"sdl_{i}"] or 0),
            "n_terms": nt, "n_postings": int(mtd[f"np_{i}"] or 0),
        }
    primary = (properties or manifest.properties).get("primary_field", "text")
    pstats = field_stats.get(primary) or next(iter(field_stats.values()), {})
    seg_bytes, seg_hash = dir_fingerprint(seg_dir)
    seg = SegmentMeta(
        segment_id=segment_id,
        path=rel,
        n_docs=int(pstats.get("n_docs", 0)),
        sum_dl=int(pstats.get("sum_dl", 0)),
        n_terms=int(pstats.get("n_terms", 0)),
        n_postings=int(pstats.get("n_postings", 0)),
        doc_min=int(mdl["doc_min"]) if mdl["doc_min"] is not None else 0,
        doc_max=int(mdl["doc_max"]) if mdl["doc_max"] is not None else -1,
        bytes=seg_bytes,
        lineage=[lineage_extra],
        field_stats=field_stats,
        content_hash=seg_hash,
        files=table_file_lists(seg_dir),
    )
    merged = Manifest(
        version=version,
        analyzer=manifest.analyzer,
        block_size=manifest.block_size,
        n_shards=manifest.n_shards,
        segments=list(keep_segments or []) + [seg],
        parent_version=manifest.version,
        properties=dict(properties if properties is not None else manifest.properties),
    )
    return catalog.commit(merged)


def merge_segments(spark: SparkSession, root: str, mode: str = "concat") -> Manifest:
    """Consolidate all segments of an index into one (L20).

    concat: compressed-domain, keeps any pending delete list.
    repack: applies deletes physically and recomputes df/ttf/doclen.
    """
    catalog = IndexCatalog(root)
    manifest = catalog.load()
    has_deletes = bool(manifest.properties.get("deletes_path"))
    has_dv = bool(manifest.properties.get("dv_path"))
    if len(manifest.segments) <= 1 and mode == "concat" and not has_deletes and not has_dv:
        return manifest
    postings = _ensure_postings_cols(
        spark.read.parquet(*manifest.segment_paths(root, "postings"))
    )
    termdict_raw = spark.read.parquet(*manifest.segment_paths(root, "termdict"))
    doclen = spark.read.parquet(*manifest.segment_paths(root, "doclen"))
    store_positions = bool(manifest.properties.get("store_positions", True))
    properties = dict(manifest.properties)
    if len(manifest.segments) > 1:
        # combining segments interleaves their sorted docID runs — a
        # concat merge is NOT Lucene's sorted merge (which re-sorts),
        # so the merged snapshot must not claim the index_sort pin
        # (early-terminated sorted queries would misorder)
        properties.pop("index_sort", None)
    stored = None
    if properties.get("stored_fields"):
        stored_paths = [p for p in manifest.segment_paths(root, "stored") if os.path.isdir(p)]
        if stored_paths:
            stored = spark.read.parquet(*stored_paths)
    if properties.get("dv_path") and stored is not None:
        # full consolidation rewrites the stored table: fold pending
        # doc-values overrides in and drop the sidecar (Lucene merges
        # fold DV update generations the same way)
        from .deletes import apply_dv_overrides

        stored = apply_dv_overrides(
            stored, spark.read.parquet(os.path.join(root, properties["dv_path"]))
        )
        properties.pop("dv_path", None)
        properties.pop("n_dv", None)
    if mode == "concat":
        w = Window.partitionBy("field", "term", "shard").orderBy("min_doc", "block_id")
        blocks = postings.withColumn(
            "block_id", (F.row_number().over(w) - F.lit(1)).cast("int")
        ).select(*[f.name for f in POSTINGS_SCHEMA.fields])
        termdict = termdict_raw.groupBy("field", "term").agg(
            F.sum("df").cast("long").alias("df"), F.sum("ttf").cast("long").alias("ttf")
        )
    elif mode == "repack":
        store_off = bool(properties.get("store_offsets", False))
        store_pay = bool(properties.get("store_payloads", False))
        if has_deletes:
            # DISTRIBUTED delete application: tombstones cogroup with
            # the postings per shard (shard = doc % n_shards, the same
            # co-location invariant the query path's _aux_frames uses),
            # so nothing index-sized ever lands on the driver and each
            # repack kernel probes only its shard's sorted slice. The
            # doclen/stored anti-joins are plain joins — AQE broadcasts
            # a small delete list by itself and shuffles a huge one.
            dels_df = spark.read.parquet(
                os.path.join(root, manifest.properties["deletes_path"])
            ).select("doc")
            dels_aux = dels_df.select(
                F.pmod(F.col("doc"), F.lit(manifest.n_shards)).cast("int").alias("shard"),
                F.col("doc").cast("long").alias("doc"),
            )
            doclen = doclen.join(dels_df, "doc", "left_anti")
            if stored is not None:
                stored = stored.join(dels_df, "doc", "left_anti")
            properties.pop("deletes_path", None)
            properties.pop("n_deletes", None)
            blocks = (
                postings.groupBy("shard")
                .cogroup(dels_aux.groupBy("shard"))
                .applyInPandas(
                    _repack_shard_factory(
                        manifest.block_size, store_positions, store_off, store_pay
                    ),
                    schema=POSTINGS_SCHEMA,
                )
            )
        else:
            blocks = postings.groupBy("field", "term", "shard").applyInPandas(
                _repack_factory(manifest.block_size, store_positions,
                                store_offsets=store_off, store_payloads=store_pay),
                schema=POSTINGS_SCHEMA,
            )
        if has_deletes:
            # surviving postings changed -> recompute exact stats from
            # the WRITTEN postings (the repack runs once, not twice)
            termdict = None
        else:
            termdict = termdict_raw.groupBy("field", "term").agg(
                F.sum("df").cast("long").alias("df"), F.sum("ttf").cast("long").alias("ttf")
            )
    else:
        raise ValueError(f"unknown merge mode {mode!r}")
    lineage = {
        "op": f"merge-{mode}",
        "inputs": [s.segment_id for s in manifest.segments],
        "deletes_applied": bool(has_deletes and mode == "repack"),
    }
    return _write_merged(
        spark, catalog, manifest, blocks, termdict, doclen, lineage, properties, stored,
        termdict_from_written=termdict is None,
    )


def merge_partial(
    spark: SparkSession, root: str, segment_ids: list[str], mode: str = "concat"
) -> Manifest:
    """Merge ONLY the named segments into one, leaving the rest of the
    manifest untouched — the building block of the tiered merge policy
    (Lucene merges segment subsets continuously; the reference gets
    this via writer.addIndexes/background merges,
    SimpleFDBDirectoryTest.java:161-187, while merge_segments is the
    all-or-nothing consolidation).

    concat: compressed-domain (block lists renumbered in docID order,
    zero decode). repack: re-packs the selected segments' blocks to
    full block_size — pure recompression; a pending delete list stays
    pending (merge_segments(mode="repack") remains the delete-applying
    operation, so partial merges never make global df/ttf stats
    inconsistent between merged and untouched segments)."""
    catalog = IndexCatalog(root)
    manifest = catalog.load()
    ids = set(segment_ids)
    sel = [s for s in manifest.segments if s.segment_id in ids]
    keep = [s for s in manifest.segments if s.segment_id not in ids]
    if len(sel) != len(ids):
        missing = ids - {s.segment_id for s in sel}
        raise ValueError(f"unknown segment ids: {sorted(missing)}")
    if len(sel) < 2:
        return manifest

    def paths(table: str) -> list[str]:
        return [os.path.join(root, s.path, table) for s in sel]

    postings = _ensure_postings_cols(spark.read.parquet(*paths("postings")))
    doclen = spark.read.parquet(*paths("doclen"))
    properties = dict(manifest.properties)
    # the merged SEGMENT interleaves >= 2 sorted docID runs, so the
    # snapshot-level index_sort pin no longer holds (see merge_segments)
    properties.pop("index_sort", None)
    store_positions = bool(properties.get("store_positions", True))
    stored = None
    if properties.get("stored_fields"):
        sp = [p for p in paths("stored") if os.path.isdir(p)]
        if sp:
            stored = spark.read.parquet(*sp)
    termdict = (
        spark.read.parquet(*paths("termdict"))
        .groupBy("field", "term")
        .agg(F.sum("df").cast("long").alias("df"), F.sum("ttf").cast("long").alias("ttf"))
    )
    if mode == "concat":
        w = Window.partitionBy("field", "term", "shard").orderBy("min_doc", "block_id")
        blocks = postings.withColumn(
            "block_id", (F.row_number().over(w) - F.lit(1)).cast("int")
        ).select(*[f.name for f in POSTINGS_SCHEMA.fields])
    elif mode == "repack":
        blocks = postings.groupBy("field", "term", "shard").applyInPandas(
            _repack_factory(
                manifest.block_size, store_positions,
                store_offsets=bool(properties.get("store_offsets", False)),
                store_payloads=bool(properties.get("store_payloads", False)),
            ),
            schema=POSTINGS_SCHEMA,
        )
    else:
        raise ValueError(f"unknown merge mode {mode!r}")
    lineage = {"op": f"merge-partial-{mode}", "inputs": [s.segment_id for s in sel]}
    return _write_merged(
        spark, catalog, manifest, blocks, termdict, doclen, lineage, properties,
        stored, keep_segments=keep,
    )


def expunge_deletes(spark: SparkSession, root: str) -> Manifest:
    """Lucene IndexWriter.forceMergeDeletes: physically reclaim
    tombstoned docs by rewriting ONLY the segments that hold them —
    clean segments are never touched (the reference reaches this
    through writer.forceMergeDeletes(), stock Lucene 8 on the FDB
    directory). At 100x scale this is the difference between paying a
    full-index rewrite to reclaim a 0.1% delete churn and paying only
    for the dirty segments.

    Plan shape: per-segment tombstone counts come from ONE broadcast
    range join of the (possibly huge) delete list against the tiny
    segment-range table — the driver sees one row per segment, never
    the tombstones. Affected segments rewrite through the same
    cogrouped per-shard repack as merge_segments(mode='repack')
    (tombstones stay distributed), with exact df/ttf recomputed from
    the surviving blocks; the delete list then clears from the
    manifest (every in-range tombstone was applied; out-of-range ids
    reference nothing and drop with it)."""
    catalog = IndexCatalog(root)
    manifest = catalog.load()
    del_rel = manifest.properties.get("deletes_path")
    if not del_rel:
        return manifest
    dels_df = spark.read.parquet(os.path.join(root, del_rel)).select("doc")
    ranges = spark.createDataFrame(
        [(s.segment_id, int(s.doc_min), int(s.doc_max)) for s in manifest.segments],
        "segment_id string, doc_min long, doc_max long",
    )
    hit_rows = (
        dels_df.join(
            F.broadcast(ranges),
            (F.col("doc") >= F.col("doc_min")) & (F.col("doc") <= F.col("doc_max")),
        )
        .groupBy("segment_id")
        .count()
        .collect()  # bounded: one row per segment
    )
    affected = {r["segment_id"] for r in hit_rows if r["count"] > 0}
    properties = dict(manifest.properties)
    properties.pop("deletes_path", None)
    properties.pop("n_deletes", None)
    if not affected:
        # tombstones reference no live docID range: just clear the list
        cleared = Manifest(
            version=catalog.next_version(),
            analyzer=manifest.analyzer,
            block_size=manifest.block_size,
            n_shards=manifest.n_shards,
            segments=manifest.segments,
            parent_version=manifest.version,
            properties=properties,
        )
        return catalog.commit(cleared)
    sel = [s for s in manifest.segments if s.segment_id in affected]
    keep = [s for s in manifest.segments if s.segment_id not in affected]
    if len(sel) > 1:
        # the rewritten segment interleaves >= 2 sorted docID runs (see
        # merge_partial); a single-segment rewrite keeps the pin — a
        # delete-filtered subsequence preserves the sort order
        properties.pop("index_sort", None)

    def paths(table: str) -> list[str]:
        return [os.path.join(root, s.path, table) for s in sel]

    postings = _ensure_postings_cols(spark.read.parquet(*paths("postings")))
    doclen = spark.read.parquet(*paths("doclen")).join(dels_df, "doc", "left_anti")
    stored = None
    if properties.get("stored_fields"):
        sp = [p for p in paths("stored") if os.path.isdir(p)]
        if sp:
            stored = spark.read.parquet(*sp).join(dels_df, "doc", "left_anti")
    store_positions = bool(properties.get("store_positions", True))
    dels_aux = dels_df.select(
        F.pmod(F.col("doc"), F.lit(manifest.n_shards)).cast("int").alias("shard"),
        F.col("doc").cast("long").alias("doc"),
    )
    blocks = (
        postings.groupBy("shard")
        .cogroup(dels_aux.groupBy("shard"))
        .applyInPandas(
            _repack_shard_factory(
                manifest.block_size, store_positions,
                bool(properties.get("store_offsets", False)),
                bool(properties.get("store_payloads", False)),
            ),
            schema=POSTINGS_SCHEMA,
        )
    )
    lineage = {
        "op": "expunge-deletes",
        "inputs": [s.segment_id for s in sel],
        "deletes_applied": True,
    }
    # termdict from the WRITTEN postings (surviving postings changed;
    # computing it from `blocks` would run the repack twice)
    return _write_merged(
        spark, catalog, manifest, blocks, None, doclen, lineage, properties,
        stored, keep_segments=keep, termdict_from_written=True,
    )


def maybe_merge(
    spark: SparkSession,
    root: str,
    max_segments: int = 10,
    tier_factor: float = 10.0,
    mode: str = "concat",
) -> Manifest:
    """Tiered merge policy (Lucene TieredMergePolicy analogue) for
    continuous-append operation: a no-op while the snapshot holds
    <= max_segments segments; above the bound, ONE partial merge of
    the smallest size tier — at least enough segments to bring the
    count back to the bound, extended to every further segment still
    within tier_factor x the smallest (a burst of small appends
    collapses in one merge instead of cascading) — and never a larger
    segment that doesn't need rewriting. Under continuous append at
    100x scale this caps segment count (and with it query-side scan
    fan-in) without ever paying a full-index rewrite; an operator
    calls it after appends, like Lucene's background merge scheduler."""
    if max_segments < 1:
        raise ValueError("max_segments must be >= 1")
    catalog = IndexCatalog(root)
    manifest = catalog.load()
    if len(manifest.segments) <= max_segments:
        return manifest
    segs = sorted(manifest.segments, key=lambda s: (s.bytes, s.segment_id))
    need = len(segs) - max_segments + 1
    take = list(segs[:need])
    floor = max(1, segs[0].bytes)
    for s in segs[need:]:
        if s.bytes <= tier_factor * floor:
            take.append(s)
        else:
            break
    return merge_partial(spark, root, [s.segment_id for s in take], mode=mode)


def reshard(spark: SparkSession, root: str, n_shards: int) -> Manifest:
    """Rewrite the index with a new shard count (shard = doc %
    n_shards). n_shards is pinned at index creation and is THE kernel
    parallelism knob — at 100x corpus growth an operator reshards to
    add parallelism instead of rebuilding from the source corpus.
    Per-(field, term) kernel: decode once, split occurrences by new
    shard, re-pack — one wide shuffle over the compressed blocks, no
    source-text re-analysis. The stored table's shard column is pure
    Catalyst (pmod). Rank identity is exact: shard assignment only
    partitions the doc space (every kernel evaluates per-shard and
    results merge by score), it never affects scores.

    Consolidates all segments (like merge) and keeps a pending delete
    list pending — deletes co-locate via doc % n_shards computed at
    query time, so they follow the new layout automatically."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    catalog = IndexCatalog(root)
    manifest = catalog.load()
    if n_shards == manifest.n_shards:
        return manifest
    postings = _ensure_postings_cols(
        spark.read.parquet(*manifest.segment_paths(root, "postings"))
    )
    doclen = spark.read.parquet(*manifest.segment_paths(root, "doclen"))
    termdict = (
        spark.read.parquet(*manifest.segment_paths(root, "termdict"))
        .groupBy("field", "term")
        .agg(F.sum("df").cast("long").alias("df"), F.sum("ttf").cast("long").alias("ttf"))
    )
    properties = dict(manifest.properties)
    if len(manifest.segments) > 1:
        # resharding keeps docIDs but consolidates segments — multiple
        # sorted runs interleave, so the index_sort pin drops (a
        # single-segment reshard preserves the order and keeps it)
        properties.pop("index_sort", None)
    store_positions = bool(properties.get("store_positions", True))
    store_off = bool(properties.get("store_offsets", False))
    store_pay = bool(properties.get("store_payloads", False))
    stored = None
    if properties.get("stored_fields"):
        sp = [p for p in manifest.segment_paths(root, "stored") if os.path.isdir(p)]
        if sp:
            stored = spark.read.parquet(*sp).withColumn(
                "shard", F.pmod(F.col("doc"), F.lit(n_shards)).cast("int")
            )

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        fld, term = key[0], key[1]
        g = _decode_group(pdf, store_positions, store_off, None, store_pay)
        empty = pd.DataFrame(
            {f.name: pd.Series(dtype=object) for f in POSTINGS_SCHEMA.fields}
        ).iloc[:0]
        if g is None:
            return empty
        shards = g["docs"] % n_shards
        rows: list[tuple] = []
        for sh in np.unique(shards):
            sel = shards == sh
            occ = np.repeat(sel, g["tfs"])
            sub = {
                "docs": g["docs"][sel], "tfs": g["tfs"][sel], "dlqs": g["dlqs"][sel],
                "pos": g["pos"][occ] if g["pos"] is not None else None,
                "ost": g["ost"][occ] if g["ost"] is not None else None,
                "oln": g["oln"][occ] if g["oln"] is not None else None,
                "pay": g["pay"][occ] if g["pay"] is not None else None,
            }
            rows.extend(
                _pack_group_rows(fld, term, int(sh), sub, manifest.block_size, store_positions)
            )
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=[f.name for f in POSTINGS_SCHEMA.fields])

    blocks = postings.groupBy("field", "term").applyInPandas(
        kernel, schema=POSTINGS_SCHEMA
    )
    # carry the new shard count through _write_merged via a synthetic
    # parent (the same trick add_indexes uses for a fresh dest)
    parent = Manifest(
        version=manifest.version,
        analyzer=manifest.analyzer,
        block_size=manifest.block_size,
        n_shards=n_shards,
        segments=manifest.segments,
        properties=properties,
    )
    lineage = {
        "op": "reshard",
        "inputs": [s.segment_id for s in manifest.segments],
        "n_shards_from": manifest.n_shards,
        "n_shards_to": n_shards,
    }
    return _write_merged(
        spark, catalog, parent, blocks, termdict, doclen, lineage, properties, stored
    )


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
        lo = min((s.doc_min for s in m.segments), default=0)
        offsets.append(acc - lo)
        acc += m.doc_max + 1 - lo
    off_sets = [bool(m.properties.get("store_offsets", False)) for m in manifests]
    if any(o != off_sets[0] for o in off_sets[1:]):
        raise ValueError("cannot addIndexes across mismatched store_offsets")
    pay_sets = [bool(m.properties.get("store_payloads", False)) for m in manifests]
    if any(p != pay_sets[0] for p in pay_sets[1:]):
        raise ValueError("cannot addIndexes across mismatched store_payloads")
    stored_sets = [sorted(m.properties.get("stored_fields", [])) for m in manifests]
    if any(s != stored_sets[0] for s in stored_sets[1:]):
        raise ValueError(f"cannot addIndexes across mismatched stored_fields: {stored_sets}")
    carry_stored = bool(stored_sets[0])
    kw_sets = [sorted(m.properties.get("keyword_fields", [])) for m in manifests]
    if any(k != kw_sets[0] for k in kw_sets[1:]):
        raise ValueError(f"cannot addIndexes across mismatched keyword_fields: {kw_sets}")
    postings = None
    doclen = None
    stored = None
    termdicts = []
    for root, m, off in zip(src_roots, manifests, offsets):
        if m.properties.get("deletes_path"):
            raise ValueError("apply deletes (merge repack) before addIndexes")
        # rebase shard along with doc: the offset is constant per
        # source, so (doc + off) % n_shards == (shard + off) % n_shards
        # for every doc of the source — the shard == doc % n_shards
        # invariant (which co-locates deletes/doc-values side inputs
        # with their postings shard) survives the rebase.
        new_shard = F.pmod(F.col("shard") + F.lit(off), F.lit(base.n_shards)).cast("int")
        p = (
            _ensure_postings_cols(spark.read.parquet(*m.segment_paths(root, "postings")))
            .withColumn("doc_off", F.lit(off).cast("long"))
            .withColumn("shard", new_shard)
        )
        d = spark.read.parquet(*m.segment_paths(root, "doclen")).withColumn(
            "doc", F.col("doc") + F.lit(off)
        )
        postings = p if postings is None else postings.unionByName(p)
        doclen = d if doclen is None else doclen.unionByName(d)
        termdicts.append(spark.read.parquet(*m.segment_paths(root, "termdict")))
        if carry_stored:
            st_paths = [q for q in m.segment_paths(root, "stored") if os.path.isdir(q)]
            st = (
                spark.read.parquet(*st_paths)
                .withColumn("doc", F.col("doc") + F.lit(off))
                .withColumn("shard", new_shard)
            )
            stored = st if stored is None else stored.unionByName(st)
    termdict = termdicts[0]
    for t in termdicts[1:]:
        termdict = termdict.unionByName(t)
    termdict = termdict.groupBy("field", "term").agg(
        F.sum("df").cast("long").alias("df"), F.sum("ttf").cast("long").alias("ttf")
    )
    store_positions = all(m.properties.get("store_positions", True) for m in manifests)
    blocks = postings.groupBy("field", "term", "shard").applyInPandas(
        _repack_factory(base.block_size, store_positions, store_offsets=off_sets[0],
                        store_payloads=pay_sets[0]),
        schema=POSTINGS_SCHEMA,
    )
    synthetic_parent = Manifest(
        version=dest_cat.next_version() - 1 if dest_cat.exists() else 0,
        analyzer=base.analyzer,
        block_size=base.block_size,
        n_shards=base.n_shards,
        segments=[],
        properties={"store_positions": store_positions},
    )
    lineage = {"op": "addIndexes", "inputs": src_roots, "offsets": offsets}
    props = {
        "store_positions": store_positions,
        "store_offsets": off_sets[0],
        "store_payloads": pay_sets[0],
        "primary_field": base.properties.get("primary_field", "text"),
        "stored_fields": stored_sets[0],
        "keyword_fields": kw_sets[0],
        # per-field analyzer map (PerFieldAnalyzerWrapper): identical
        # across sources by the analyzer-pin equality check above —
        # dropping it would make analyzer_for() fall back to the
        # default chain on the merged index
        **(
            {"field_analyzers": dict(base.properties["field_analyzers"])}
            if base.properties.get("field_analyzers")
            else {}
        ),
    }
    # the true field domain is the union across SOURCE manifests — the
    # synthetic parent has no segments, so its fields() can't know it
    union_fields: list[str] = []
    for m in manifests:
        for f in m.fields():
            if f not in union_fields:
                union_fields.append(f)
    return _write_merged(
        spark, dest_cat, synthetic_parent, blocks, termdict, doclen, lineage, props, stored,
        fields_override=union_fields,
    )


def split_index(
    spark: SparkSession,
    src_root: str,
    dest_first: str,
    dest_second: str,
    predicate: str | None = None,
    docs: DataFrame | list[int] | None = None,
) -> tuple[Manifest, Manifest]:
    """Lucene misc PKIndexSplitter analogue: partition ONE index into
    TWO fresh indexes by a document predicate — docs matching go to
    `dest_first`, every other LIVE doc to `dest_second` (the reference
    reaches index surgery like this through stock Lucene tooling over
    its FDBDirectory, reference: FDBDirectory.java:102-167 open/create).
    Lucene's splitter wraps a FilterIndexReader over liveDocs and
    addIndexes()es each side; ours rewrites each side directly through
    the SAME cogrouped per-shard repack as expunge_deletes — the
    "drop list" for a side is simply the other side's docs (plus any
    pending tombstones, which vanish from BOTH sides, exactly the
    liveDocs semantics).

    Select docs by `predicate` (a Catalyst SQL string over the stored
    table, evaluated AFTER folding any pending doc-values overrides —
    the latest value decides the side, like a reader would see) or by
    an explicit `docs` DataFrame/list of docIDs.

    docIDs are preserved, not renumbered (our engine never requires
    density — doclen is the roster); this keeps the split pure and
    lets add_indexes() reassemble the original index. The index_sort
    pin survives only a single-segment source (a filtered subsequence
    of one sorted run stays sorted; multi-segment splits interleave).

    Scale shape: ONE repack shuffle per side keyed by shard (the same
    knob as every merge), side membership rides broadcast-free as a
    cogrouped aux frame; no collect of anything corpus-sized.
    """
    if (predicate is None) == (docs is None):
        raise ValueError("split_index needs exactly one of predicate= or docs=")
    for dest in (dest_first, dest_second):
        if IndexCatalog(dest).exists():
            raise ValueError(f"split destination already exists: {dest}")
    catalog = IndexCatalog(src_root)
    manifest = catalog.load()
    properties = dict(manifest.properties)
    store_positions = bool(properties.get("store_positions", True))
    postings = _ensure_postings_cols(
        spark.read.parquet(*manifest.segment_paths(src_root, "postings"))
    )
    doclen = spark.read.parquet(*manifest.segment_paths(src_root, "doclen"))
    stored = None
    if properties.get("stored_fields"):
        sp = [p for p in manifest.segment_paths(src_root, "stored") if os.path.isdir(p)]
        if sp:
            stored = spark.read.parquet(*sp)
    if properties.get("dv_path") and stored is not None:
        from .deletes import apply_dv_overrides

        stored = apply_dv_overrides(
            stored, spark.read.parquet(os.path.join(src_root, properties["dv_path"]))
        )
    properties.pop("dv_path", None)
    properties.pop("n_dv", None)
    tomb = None
    if properties.get("deletes_path"):
        tomb = spark.read.parquet(
            os.path.join(src_root, properties["deletes_path"])
        ).select(F.col("doc").cast("long").alias("doc")).distinct()
    properties.pop("deletes_path", None)
    properties.pop("n_deletes", None)
    if len(manifest.segments) > 1:
        properties.pop("index_sort", None)

    full_roster = doclen.select(F.col("doc").cast("long").alias("doc")).distinct()
    roster = full_roster
    if tomb is not None:
        roster = roster.join(tomb, "doc", "left_anti")
    if predicate is not None:
        if stored is None:
            raise ValueError("predicate= split needs stored fields on the index")
        matched = stored.filter(predicate).select(F.col("doc").cast("long").alias("doc"))
    elif isinstance(docs, DataFrame):
        matched = docs.select(F.col(docs.columns[0]).cast("long").alias("doc"))
    else:
        matched = spark.createDataFrame([(int(d),) for d in docs], "doc long")
    matched = matched.distinct().join(roster, "doc", "left_semi")
    # side A drops everything outside `matched` — from the FULL roster,
    # so a tombstoned doc that happens to satisfy the predicate still
    # drops (matched is live-restricted, so it never shields one);
    # side B drops `matched` plus the tombstones
    drop_first = full_roster.join(matched, "doc", "left_anti")
    if tomb is not None:
        drop_second = matched.unionByName(tomb).distinct()
    else:
        drop_second = matched

    repack = _repack_shard_factory(
        manifest.block_size, store_positions,
        bool(properties.get("store_offsets", False)),
        bool(properties.get("store_payloads", False)),
    )
    out: list[Manifest] = []
    for dest, drop, side in (
        (dest_first, drop_first, "first"),
        (dest_second, drop_second, "second"),
    ):
        dels_aux = drop.select(
            F.pmod(F.col("doc"), F.lit(manifest.n_shards)).cast("int").alias("shard"),
            F.col("doc").cast("long").alias("doc"),
        )
        blocks = (
            postings.groupBy("shard")
            .cogroup(dels_aux.groupBy("shard"))
            .applyInPandas(repack, schema=POSTINGS_SCHEMA)
        )
        side_doclen = doclen.join(drop, "doc", "left_anti")
        side_stored = stored.join(drop, "doc", "left_anti") if stored is not None else None
        dest_cat = IndexCatalog(dest)
        synthetic_parent = Manifest(
            version=0,
            analyzer=manifest.analyzer,
            block_size=manifest.block_size,
            n_shards=manifest.n_shards,
            segments=[],
            properties={"store_positions": store_positions},
        )
        lineage = {"op": "split", "source": src_root, "side": side,
                   "inputs": [s.segment_id for s in manifest.segments]}
        out.append(
            _write_merged(
                spark, dest_cat, synthetic_parent, blocks, None, side_doclen,
                lineage, dict(properties), side_stored,
                fields_override=manifest.fields(),
                termdict_from_written=True,
            )
        )
    return out[0], out[1]


_SORTED_FLAT_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("doc", T.LongType(), False),
        T.StructField("tf", T.LongType(), False),
        T.StructField("dlq", T.LongType(), False),
        # per-posting byte cells sliced verbatim from the block blobs
        # (the inverted relation's layout) — never decoded int arrays
        T.StructField("positions", T.BinaryType(), True),
        T.StructField("offsets", T.BinaryType(), True),
        T.StructField("payloads", T.BinaryType(), True),
    ]
)


def merge_sorted(spark: SparkSession, root: str) -> Manifest:
    """Sorted merge (Lucene's SortingCodecReader path: a merge of an
    index with IndexWriterConfig.setIndexSort re-sorts the union and
    the merged segment KEEPS the sort — stock Lucene 8 behavior the
    concat/repack modes deliberately decline, dropping the pin
    instead). Consolidates every segment into ONE whose docIDs follow
    the pinned SortField chain globally, so search_sorted /
    search_sorted_multi early-terminate on the merged index exactly
    as on a freshly sorted build.

    Pending tombstones are applied (dropped docs vanish, the delete
    list clears) and pending doc-values overrides fold into the
    rewritten stored table FIRST — the remap ranks post-override
    values, Lucene's DV-generation fold semantics.

    Plan shape (the honest cost of a sorted merge — Lucene pays the
    same full rewrite through SortingCodecReader):
    1. new docIDs = the windowless dense-rank scan over the live
       stored table ordered by the pinned chain (+ old doc tiebreak,
       making the merge deterministic and idempotent);
    2. postings decode ONCE to per-posting rows (occurrence slices as
       Arrow lists), ONE doc-keyed join against the remap (uniform —
       dense ids), ONE (field, term) shuffle to re-pack blocks per
       new shard (shard = new_doc % n_shards preserved as the kernel
       parallelism law);
    3. doclen/stored remap by the same join; exact df/ttf recomputed
       from the surviving blocks.
    No driver-side state beyond the usual bounded offsets table."""
    catalog = IndexCatalog(root)
    manifest = catalog.load()
    properties = dict(manifest.properties)
    chain = properties.get("index_sort")
    if not chain:
        raise ValueError(
            "merge_sorted requires an index_sort pin (use merge_segments "
            "for unsorted indexes)"
        )
    if not properties.get("stored_fields"):
        raise ValueError("index_sort index must carry stored_fields")
    store_positions = bool(properties.get("store_positions", True))
    store_off = bool(properties.get("store_offsets", False))
    store_pay = bool(properties.get("store_payloads", False))
    n_shards = manifest.n_shards

    stored_paths = [p for p in manifest.segment_paths(root, "stored") if os.path.isdir(p)]
    stored = spark.read.parquet(*stored_paths)
    del_rel = properties.pop("deletes_path", None)
    properties.pop("n_deletes", None)
    dels = None
    if del_rel:
        dels = spark.read.parquet(os.path.join(root, del_rel)).select(
            F.col("doc").cast("long").alias("doc")
        )
        stored = stored.join(dels, "doc", "left_anti")
    if properties.get("dv_path"):
        from .deletes import apply_dv_overrides

        stored = apply_dv_overrides(
            stored, spark.read.parquet(os.path.join(root, properties["dv_path"]))
        )
        properties.pop("dv_path", None)
        properties.pop("n_dv", None)

    from .build import assign_dense_doc_ids

    order_exprs = [
        (F.col(f).asc() if asc else F.col(f).desc()) for f, asc in chain
    ] + [F.col("old_doc")]
    keyed = stored.withColumnRenamed("doc", "old_doc")
    # the ids freeze backs every downstream read (remap, stored_new),
    # so it lives until the commit below; cleaned in the finally
    _freeze = os.path.join("/tmp", "sparklucene-smerge-" + uuid.uuid4().hex[:12])
    with_ids = assign_dense_doc_ids(
        keyed, ["old_doc"], order_exprs=order_exprs, freeze_dir=_freeze,
    )
    remap = with_ids.select(
        F.col("old_doc"), F.col("doc").cast("long").alias("new_doc")
    )
    stored_new = with_ids.drop("old_doc")
    if "shard" in stored_new.columns:
        stored_new = stored_new.withColumn(
            "shard", F.pmod(F.col("doc"), F.lit(n_shards)).cast("int")
        )

    doclen = spark.read.parquet(*manifest.segment_paths(root, "doclen"))
    out_cols = [
        (
            F.col("new_doc").alias("doc")
            if c == "doc"
            else (
                F.pmod(F.col("new_doc"), F.lit(n_shards)).cast("int").alias("shard")
                if c == "shard"
                else F.col(c)
            )
        )
        for c in doclen.columns
    ]
    doclen_new = (
        doclen.withColumnRenamed("doc", "old_doc").join(remap, "old_doc").select(*out_cols)
    )

    postings = _ensure_postings_cols(
        spark.read.parquet(*manifest.segment_paths(root, "postings"))
    )

    def flatten(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One output frame per INPUT batch. Only docs/tfs/dlqs are
        # decoded (cheap int streams); the positions/offsets/payloads
        # blobs are SLICED into per-posting byte cells without a
        # decode/re-encode round trip — every per-posting encoding
        # restarts its delta at the posting boundary, so the block
        # blob's slices ARE the inverted relation's cells, and docID
        # remapping never touches occurrence payloads. (The previous
        # kernel decoded every occurrence into ~1 small numpy array
        # per posting — millions of tiny Arrow list cells through two
        # shuffles.)
        for pdf in batches:
            if pdf.empty:
                continue
            has_doc_off = "doc_off" in pdf.columns
            fields_l: list[np.ndarray] = []
            terms_l: list[np.ndarray] = []
            docs_l: list[np.ndarray] = []
            tfs_l: list[np.ndarray] = []
            dlqs_l: list[np.ndarray] = []
            pos_l: list = []
            ost_l: list = []
            pay_l: list = []
            for r in pdf.itertuples(index=False):
                r = r._asdict()
                d = codec.decode_doc_block(r["docs"])
                if d.size == 0:
                    continue
                t = codec.decode_tf_block(r["tfs"])
                q = np.frombuffer(r["dlqs"], dtype=np.uint8).astype(np.int64)
                n = d.size
                if store_positions and r["positions"] is not None:
                    pos_l.extend(codec.varbyte_split_cells(r["positions"], t))
                else:
                    pos_l.extend([None] * n)
                if store_off and r["offsets"] is not None:
                    ost_l.extend(codec.varbyte_split_cells(r["offsets"], 2 * t))
                else:
                    ost_l.extend([None] * n)
                if store_pay and r.get("payloads") is not None:
                    pay_l.extend(codec.varbyte_split_cells(r["payloads"], t))
                else:
                    pay_l.extend([None] * n)
                off = int(r["doc_off"]) if has_doc_off else 0
                fields_l.append(np.full(n, r["field"], dtype=object))
                terms_l.append(np.full(n, r["term"], dtype=object))
                docs_l.append((d + off).astype(np.int64))
                tfs_l.append(t.astype(np.int64))
                dlqs_l.append(q.astype(np.int64))
            if not docs_l:
                continue
            yield pd.DataFrame(
                {
                    "field": np.concatenate(fields_l),
                    "term": np.concatenate(terms_l),
                    "doc": np.concatenate(docs_l),
                    "tf": np.concatenate(tfs_l),
                    "dlq": np.concatenate(dlqs_l),
                    "positions": pos_l,
                    "offsets": ost_l,
                    "payloads": pay_l,
                }
            )

    flat = postings.mapInPandas(flatten, schema=_SORTED_FLAT_SCHEMA)
    remapped = (
        flat.withColumnRenamed("doc", "old_doc")
        .join(remap, "old_doc")
        .drop("old_doc")
        .withColumnRenamed("new_doc", "doc")
    )

    block_size = manifest.block_size

    # Pack with the BUILD's whole-partition kernel over a (field, term,
    # shard) hash repartition — many groups per task, parallelism is
    # n_terms * n_shards spread over the shuffle partitions instead of
    # one applyInPandas call per (field, term) group (the documents
    # corpus has ~31 terms: the old groupBy shape capped the pack
    # stage at ~31 tasks, each materializing one corpus-wide group in
    # a single Python call). The kernel consumes the per-posting byte
    # cells verbatim, so a sorted merge produces byte-identical block
    # encodings to a fresh sorted build of the same rows.
    from .build import _pack_factory

    pack_partitions = spark.sparkContext.defaultParallelism
    blocks = (
        remapped.withColumn(
            "shard", F.pmod(F.col("doc"), F.lit(n_shards)).cast("int")
        )
        .repartition(pack_partitions, "field", "term", "shard")
        .mapInPandas(
            _pack_factory(block_size, store_positions, store_off, store_pay),
            schema=POSTINGS_SCHEMA,
        )
    )
    lineage = {
        "op": "merge_sorted",
        "inputs": [s.segment_id for s in manifest.segments],
        "deletes_applied": bool(del_rel),
        "index_sort": chain,
    }
    try:
        return _write_merged(
            spark, catalog, manifest, blocks, None, doclen_new, lineage,
            properties, stored_new, termdict_from_written=True,
        )
    finally:
        import shutil

        shutil.rmtree(_freeze, ignore_errors=True)


def split_segments(
    root: str, segment_ids: list[str], dst_root: str, max_workers: int = 8
) -> Manifest:
    """Lucene misc IndexSplitter (the BY-SEGMENT splitter, sibling of
    the PKIndexSplitter surface `split_index`): carve the named
    segments out into a fresh standalone index WITHOUT rewriting a
    byte — segments are immutable, so the split is a file copy plus a
    fresh manifest. Lucene's tool does exactly this (copies
    segment files and writes a new segments_N).

    Semantics:
    - the split index's corpus stats (N, df, ttf, avgdl) are the
      SELECTED segments' sums — automatic, because every stat derives
      from SegmentMeta + the copied termdict tables (side-local
      stats, like split_index);
    - the delete / doc-values sidecars copy AS-IS: entries whose
      docIDs fall outside the selected segments reference nothing and
      are inert (the same tolerance expunge_deletes documents);
    - an index_sort pin carries: each segment's internal docID order
      is untouched and the sorted kernels already handle
      per-(shard, segment) runs;
    - the source index is not modified (run delete/expunge there
      separately if the split is a move, not a copy).

    Driver cost is manifest-sized decisions + the file copy
    (delegate to DistCp / server-side copy at 100 TB, exactly like
    sync_replica); no Spark job at all."""
    from dataclasses import replace

    from .replicate import _copy_tree_atomic

    catalog = IndexCatalog(root)
    manifest = catalog.load()
    by_id = {s.segment_id: s for s in manifest.segments}
    unknown = [sid for sid in segment_ids if sid not in by_id]
    if unknown:
        raise ValueError(f"unknown segment ids: {unknown}")
    if not segment_ids:
        raise ValueError("segment_ids must be non-empty")
    dst_cat = IndexCatalog(dst_root)
    if dst_cat.exists():
        raise ValueError(f"destination {dst_root!r} is already an index")
    picked = [by_id[sid] for sid in segment_ids]
    for seg in picked:
        _copy_tree_atomic(
            os.path.join(root, seg.path), os.path.join(dst_root, seg.path), max_workers
        )
    properties = dict(manifest.properties)
    for key in ("deletes_path", "dv_path"):
        rel = properties.get(key)
        if rel:
            src = os.path.join(root, rel)
            if os.path.isdir(src):
                _copy_tree_atomic(src, os.path.join(dst_root, rel), max_workers)
            elif os.path.exists(src):
                os.makedirs(os.path.dirname(os.path.join(dst_root, rel)), exist_ok=True)
                import shutil

                shutil.copy2(src, os.path.join(dst_root, rel))
            else:
                properties.pop(key, None)
    out = Manifest(
        version=1,
        analyzer=manifest.analyzer,
        block_size=manifest.block_size,
        n_shards=manifest.n_shards,
        segments=[
            replace(seg, lineage=seg.lineage + [{"op": "split_segments", "from": root}])
            for seg in picked
        ],
        parent_version=None,
        properties=properties,
    )
    return dst_cat.commit(out)
