"""Document deletes: delete-bitmap tables applied at query time.

Lucene semantics, rebuilt Spark-side (reference: doc add/delete via
IndexWriter, README.md:33-38; SURVEY.md L21): a delete does NOT
rewrite segments — it publishes a new snapshot whose manifest carries
a delete-list table (the liveDocs bitmap analogue). Queries anti-join
hits against it; corpus statistics (df/ttf/avgdl) intentionally still
include deleted docs until a repack merge applies deletes physically
— exactly Lucene's behavior, which keeps scores stable between
commits and makes merge the stats-recompute point.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.manifest import IndexCatalog, Manifest

DELETES_TABLE = "deletes"


def delete_docs(spark: SparkSession, root: str, doc_ids: DataFrame | list[int]) -> Manifest:
    """Publish a snapshot with additional deleted docIDs.

    doc_ids: DataFrame with a `doc` column, or a plain list. The new
    delete list = old list UNION new ids (monotone; idempotent re-runs
    are harmless because the union dedups).
    """
    catalog = IndexCatalog(root)
    manifest = catalog.load()
    if isinstance(doc_ids, list):
        doc_ids = spark.createDataFrame([(int(d),) for d in doc_ids], "doc long")
    dels = doc_ids.select(F.col("doc").cast("long").alias("doc")).distinct()
    old_rel = manifest.properties.get("deletes_path")
    if old_rel:
        old = spark.read.parquet(os.path.join(root, old_rel))
        dels = dels.unionByName(old).distinct()
    # natural partitioning: a billion-tombstone list writes in
    # parallel (coalesce(1) would funnel it through one task); both
    # the Spark readers and the driver-local pyarrow reader handle a
    # multi-file directory. Each publish rewrites the full union —
    # the same write amplification as Lucene's per-commit liveDocs.
    rel = os.path.join("data", "deletes", f"del-{uuid.uuid4().hex[:12]}")
    dels.write.parquet(os.path.join(root, rel))
    n_del = spark.read.parquet(os.path.join(root, rel)).count()
    new = Manifest(
        version=catalog.next_version(),
        analyzer=manifest.analyzer,
        block_size=manifest.block_size,
        n_shards=manifest.n_shards,
        segments=manifest.segments,
        parent_version=manifest.version,
        properties={**manifest.properties, "deletes_path": rel, "n_deletes": n_del},
    )
    return catalog.commit(new)


def apply_dv_overrides(base: DataFrame, overrides: DataFrame) -> DataFrame:
    """Layer numeric doc-values overrides over the stored table:
    per overridden column, the override value wins where present
    (coalesce — idempotent, so re-applying after a partial merge
    folded some overrides in is harmless). Columns are validated by
    the writer (update_doc_values), so every override column exists
    in base."""
    ov_cols = [c for c in overrides.columns if c != "doc"]
    ov = overrides.select(
        "doc", *[F.col(c).alias(f"__ov_{c}") for c in ov_cols]
    )
    out = base.join(ov, "doc", "left")
    for c in ov_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__ov_{c}"), F.col(c)))
    return out.drop(*[f"__ov_{c}" for c in ov_cols])


def update_doc_values(
    spark: SparkSession, root: str, updates: DataFrame
) -> Manifest:
    """Lucene `IndexWriter.updateNumericDocValue` / binary analogue:
    re-point a stored doc-values field for existing docs WITHOUT
    rewriting segments or re-indexing text. Publishes a snapshot
    whose manifest carries a doc-values override table (`dv_path`,
    the sidecar pattern of delete_docs); every read surface that
    consumes the stored table — numeric range predicates, sort,
    facets, grouping, block join, function score — layers the
    overrides via apply_dv_overrides. A full merge (merge_segments)
    folds overrides into the rewritten stored table and drops the
    sidecar, exactly as Lucene merges fold DV update generations.

    updates: DataFrame with a `doc` column plus one or more stored
    columns to override. Repeated updates merge latest-wins per
    (doc, column); columns must already exist in the stored table
    (Lucene updates existing DV fields only)."""
    catalog = IndexCatalog(root)
    manifest = catalog.load()
    stored_cols = set(manifest.properties.get("stored_fields", []))
    ov_cols = [c for c in updates.columns if c != "doc"]
    if "doc" not in updates.columns or not ov_cols:
        raise ValueError("updates needs a `doc` column plus value columns")
    missing = [c for c in ov_cols if c not in stored_cols]
    if missing:
        raise ValueError(
            f"not stored doc-values fields: {missing} (stored: {sorted(stored_cols)})"
        )
    new = updates.select("doc", *ov_cols).dropDuplicates(["doc"])
    old_rel = manifest.properties.get("dv_path")
    if old_rel:
        old = spark.read.parquet(os.path.join(root, old_rel))
        both = sorted(set(ov_cols) | {c for c in old.columns if c != "doc"})
        n = new.select(
            "doc", *[
                (F.col(c) if c in ov_cols else F.lit(None)).alias(c) for c in both
            ]
        ).alias("n")
        o = old.select(
            "doc", *[
                (F.col(c) if c in old.columns else F.lit(None)).alias(c) for c in both
            ]
        ).alias("o")
        new = (
            n.join(o, "doc", "full")
            .select(
                "doc",
                *[F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}")).alias(c) for c in both],
            )
        )
    rel = os.path.join("data", "doc_values", f"dv-{uuid.uuid4().hex[:12]}")
    new.write.parquet(os.path.join(root, rel))
    n_dv = spark.read.parquet(os.path.join(root, rel)).count()
    committed = Manifest(
        version=catalog.next_version(),
        analyzer=manifest.analyzer,
        block_size=manifest.block_size,
        n_shards=manifest.n_shards,
        segments=manifest.segments,
        parent_version=manifest.version,
        properties={**manifest.properties, "dv_path": rel, "n_dv": n_dv},
    )
    return catalog.commit(committed)


def update_docs(
    spark: SparkSession,
    root: str,
    replacements: DataFrame,
    *,
    doc_col: str,
    **build_kwargs,
) -> Manifest:
    """Update = delete-then-append, the Lucene updateDocument contract
    (L21): tombstone the old docIDs (doc_col names them in
    `replacements`), then append the new content as a fresh segment
    with NEW dense docIDs above doc_max — exactly how Lucene assigns a
    new internal id on update. Pass key_cols=... in build_kwargs for
    the dense-ID assignment of the replacement rows. Two snapshots are
    committed; a later repack merge reclaims the tombstoned postings.
    """
    from .build import build_index

    # tombstone old versions first, then append the new content under
    # FRESH doc ids above doc_max (dense append), keeping the natural
    # key mapping in the replacement segment's stored fields. The id
    # set stays a DataFrame end-to-end — no driver materialization.
    delete_docs(spark, root, replacements.select(F.col(doc_col).alias("doc")).distinct())
    return build_index(spark, replacements, root, doc_col=None, append=True, **build_kwargs)


def live_filter(spark: SparkSession, root: str, manifest: Manifest, hits: DataFrame) -> DataFrame:
    """Anti-join hits (doc column) against the snapshot's delete list."""
    rel = manifest.properties.get("deletes_path")
    if not rel:
        return hits
    # no forced broadcast: AQE broadcasts a small list by itself and
    # shuffles a billion-row one (a driver-forced broadcast of an
    # unbounded delete list is the anti-pattern the kernels avoid)
    dels = spark.read.parquet(os.path.join(root, rel))
    return hits.join(dels, "doc", "left_anti")


def delete_by_query(
    spark: SparkSession,
    root: str,
    clauses: list[dict],
    *,
    min_should_match: int | None = None,
    numeric: list[dict] | None = None,
) -> Manifest:
    """Lucene IndexWriter.deleteDocuments(Query...): tombstone every
    LIVE doc matching a composable boolean query, resolved against the
    CURRENT committed snapshot (Lucene resolves query deletes against
    the segments present at delete time the same way; the reference
    reaches this through stock Lucene 8 on its FDBDirectory). Same
    clause dicts / occur / msm / phrase / nested / numeric semantics
    as Searcher.search_boolean; evaluation runs the constant-score
    matched-doc kernel — no top-k cut, no scores, and the matched
    doc-set stays a DataFrame end-to-end (a billion-doc delete never
    touches the driver). Already-tombstoned docs are excluded from the
    match, so the call is idempotent; physical reclaim stays with
    expunge_deletes / a repack merge, like Lucene's merge-time
    application of buffered deletes."""
    from .query import Searcher

    docs = Searcher(spark, root).matching_docs(
        clauses, min_should_match=min_should_match, numeric=numeric
    )
    return delete_docs(spark, root, docs)
