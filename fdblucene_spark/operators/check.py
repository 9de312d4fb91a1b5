"""CheckIndex analogue: distributed structural verification of an
index (Lucene's `org.apache.lucene.index.CheckIndex`, which the
reference inherits by delegation — /root/reference/README.md:54-57).

Two layers, mirroring CheckIndex's file-level + segment-level passes:

1. `IndexCatalog.verify_segments()` (manifest.py) — files exist,
   per-segment structural checksum matches the manifest (fast,
   driver-side, already exercised by the truncation test).
2. `check_index(spark, root)` — the deep pass, DISTRIBUTED: every
   posting block re-decodes and re-validates its invariants in a
   mapInPandas kernel (Arrow batches, no row-wise Python), and the
   block-derived per-term statistics are re-aggregated and compared
   against the term dictionary. O(index bytes) total work spread over
   the cluster, which is the only shape that still completes at
   100 TB — Lucene's single-process CheckIndex is the scale
   bottleneck this replaces.

Checked invariants (the block contract build.py's packer guarantees
and every query kernel assumes):
- docIDs inside a block strictly ascending; min_doc/max_doc match;
  n matches the decoded count; every doc ≡ shard (mod n_shards);
- tf vector length n, all tf >= 1, max_tf matches;
- dlq bytes length n, min_dlq matches;
- positions (when present) decode to exactly sum(tf) entries,
  strictly ascending within each posting;
- termdict df/ttf equal the postings-derived sums per (field, term).

Returns a DataFrame of violations (empty = healthy); `problem` is a
human-readable invariant name plus context.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import codec
from .build import normalize_index_sort
from .query import Searcher

VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("problem", T.StringType(), False),
    ]
)


def _check_block(r: pd.Series, n_shards: int) -> list[str]:
    out = []
    d = codec.decode_doc_block(r["docs"])
    if len(d) != r["n"]:
        out.append(f"n={r['n']} but {len(d)} docs decoded")
    if d.size:
        if not np.all(np.diff(d) > 0):
            out.append("docIDs not strictly ascending")
        if int(d[0]) != r["min_doc"] or int(d[-1]) != r["max_doc"]:
            out.append("min_doc/max_doc do not match decoded bounds")
        if n_shards and not np.all(d % n_shards == r["shard"]):
            out.append("doc outside its shard (doc % n_shards != shard)")
    tf = codec.decode_tf_block(r["tfs"])
    if len(tf) != len(d):
        out.append("tf vector length != doc count")
    elif tf.size:
        if tf.min() < 1:
            out.append("tf < 1")
        if int(tf.max()) != r["max_tf"]:
            out.append("max_tf does not match decoded max")
    dlq = np.frombuffer(r["dlqs"], dtype=np.uint8)
    if len(dlq) != len(d):
        out.append("dlq vector length != doc count")
    elif dlq.size and int(dlq.min()) != r["min_dlq"]:
        out.append("min_dlq does not match decoded min")
    if r["positions"] is not None and len(tf) == len(d):
        try:
            pos, starts = codec.decode_positions_block(r["positions"], tf)
        except Exception as ex:  # truncated/corrupt varbytes
            out.append(f"positions decode failed: {ex}")
        else:
            if len(pos) != int(tf.sum()):
                out.append("positions length != sum(tf)")
            else:
                ends = np.cumsum(tf)
                for i in range(len(d)):
                    seg = pos[starts[i] : ends[i]]
                    if seg.size > 1 and not np.all(np.diff(seg) > 0):
                        out.append("positions not strictly ascending in a posting")
                        break
    return out


def check_index(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Deep distributed CheckIndex pass; see module docstring.
    Returns violations (field, term, shard, block_id, problem)."""
    s = Searcher(spark, root, version)
    n_shards = int(s.manifest.n_shards or 0)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for p in _check_block(r, n_shards):
                    rows.append(
                        (r["field"], r["term"], int(r["shard"]), int(r["block_id"]), p)
                    )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["field", "term", "shard", "block_id", "problem"]
                )

    block_viol = s._postings.mapInPandas(kernel, schema=VIOLATION_SCHEMA)

    # termdict cross-check: df/ttf re-derived from the blocks
    def stats_kernel(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                tf = codec.decode_tf_block(r["tfs"])
                rows.append((r["field"], r["term"], len(tf), int(tf.sum())))
            if rows:
                yield pd.DataFrame(rows, columns=["field", "term", "bdf", "bttf"])

    derived = (
        s._postings.mapInPandas(
            stats_kernel,
            schema="field string, term string, bdf long, bttf long",
        )
        .groupBy("field", "term")
        .agg(F.sum("bdf").alias("bdf"), F.sum("bttf").alias("bttf"))
    )
    td = (
        spark.read.parquet(*s.manifest.segment_paths(root, "termdict"))
        .groupBy("field", "term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
    )
    td_viol = (
        derived.join(td, ["field", "term"], "full")
        .filter(
            (F.col("df").isNull())
            | (F.col("bdf").isNull())
            | (F.col("df") != F.col("bdf"))
            | (F.col("ttf") != F.col("bttf"))
        )
        .select(
            "field",
            "term",
            F.lit(-1).cast("int").alias("shard"),
            F.lit(-1).cast("int").alias("block_id"),
            F.concat(
                F.lit("termdict mismatch: df="),
                F.coalesce(F.col("df").cast("string"), F.lit("∅")),
                F.lit(" blocks="),
                F.coalesce(F.col("bdf").cast("string"), F.lit("∅")),
                F.lit(", ttf="),
                F.coalesce(F.col("ttf").cast("string"), F.lit("∅")),
                F.lit(" blocks="),
                F.coalesce(F.col("bttf").cast("string"), F.lit("∅")),
            ).alias("problem"),
        )
    )
    out = block_viol.unionByName(td_viol)

    # index-sort pass: when the manifest pins setIndexSort, verify the
    # docID order actually follows the chain. Scalable shape: check
    # every ADJACENT pair (doc, doc+1) inside a segment — docIDs are
    # dense per segment, and pairwise order implies total order by
    # transitivity — via ONE equi-join of the stored table against
    # itself shifted by one (no window, no global sort). Pairs crossing
    # a segment boundary are excluded (Lucene sorts per segment); pairs
    # where any chain field is NULL are skipped (null placement is a
    # sort-planner detail, not a data invariant).
    chain = normalize_index_sort(s.manifest.properties.get("index_sort"))
    if chain:
        cols = [f for f, _ in chain]
        cur = s._stored_df().select(F.col("doc").cast("long").alias("doc"), *cols)
        nxt = s._stored_df().select(
            (F.col("doc").cast("long") - 1).alias("doc"),
            *[F.col(f).alias(f"_n_{f}") for f in cols],
        )
        seg_starts = sorted(int(m.doc_min) for m in s.manifest.segments)
        pairs = cur.join(nxt, "doc").filter(
            ~(F.col("doc") + 1).isin([d for d in seg_starts])
        )
        nn = F.lit(True)
        for f in cols:
            nn = nn & F.col(f).isNotNull() & F.col(f"_n_{f}").isNotNull()
        # lexicographic "cur > next" under the chain's asc/desc mix
        bad = F.lit(False)
        eq = F.lit(True)
        for f, asc in chain:
            step = F.col(f) > F.col(f"_n_{f}") if asc else F.col(f) < F.col(f"_n_{f}")
            bad = bad | (eq & step)
            eq = eq & (F.col(f) == F.col(f"_n_{f}"))
        sort_viol = pairs.filter(nn & bad).select(
            F.lit("_index_sort").alias("field"),
            F.col("doc").cast("string").alias("term"),
            F.lit(-1).cast("int").alias("shard"),
            F.lit(-1).cast("int").alias("block_id"),
            F.lit(
                "index_sort violation: stored chain key decreases from doc to doc+1 "
                f"(pin: {chain})"
            ).alias("problem"),
        )
        out = out.unionByName(sort_viol)
    return out


def exorcise(spark: SparkSession, root: str) -> tuple:
    """CheckIndex -exorcise: commit a new snapshot WITHOUT the
    segments the structural pass flags (missing directory, or
    structural checksum mismatch — the (relpath, size) fingerprint
    catches truncation and missing files). The dropped segments'
    documents are LOST, exactly Lucene's documented -exorcise
    tradeoff; every healthy segment, the delete tombstones, the
    config pins and the commit user data carry through unchanged
    (tombstones referencing dropped docs over-delete nothing — the
    docs are already gone). Per-segment stats (SegmentMeta
    n_docs/sum_dl/field_stats) make the repaired manifest's corpus
    statistics correct by construction.

    Returns (manifest, dropped_segment_ids). No-op (returns the
    current manifest and []) when everything is healthy; refuses to
    commit an index with zero segments — if EVERY segment is corrupt
    there is nothing to salvage and the caller should rebuild."""
    import os as _os

    from ..sources.manifest import IndexCatalog, dir_fingerprint

    catalog = IndexCatalog(root)
    manifest = catalog.load()
    bad: list[str] = []
    for s in manifest.segments:
        seg_dir = _os.path.join(root, s.path)
        if not _os.path.isdir(seg_dir) or (
            s.content_hash and dir_fingerprint(seg_dir)[1] != s.content_hash
        ):
            bad.append(s.segment_id)
    if not bad:
        return manifest, []
    keep = [s for s in manifest.segments if s.segment_id not in set(bad)]
    if not keep:
        raise ValueError(
            "every segment is corrupt; refusing to commit an empty index")
    from dataclasses import replace as _replace

    new = _replace(
        manifest,
        version=catalog.next_version(),
        segments=keep,
        parent_version=manifest.version,
    )
    return catalog.commit(new), sorted(bad)
