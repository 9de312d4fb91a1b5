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
