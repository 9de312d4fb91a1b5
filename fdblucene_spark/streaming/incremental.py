"""Structured Streaming ingestion: stream -> segment appends.

The reference has no streaming surface (SURVEY.md section 2.9); its
nearest concept is lock-free incremental multi-writer indexing
(reference: README.md:33-38). We expose incremental indexing as a
foreachBatch sink over the SAME batch build: every micro-batch
becomes one segment append committed by manifest swap, with
fingerprint = f"{checkpoint_id}:{batch_id}" so Structured Streaming's
at-least-once foreachBatch contract collapses to exactly-once index
state (a replayed batch hits the idempotent-fingerprint no-op path,
the applyIfExists idea of FDBIndexOutput.java:182-189).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.build import DEFAULT_BLOCK_SIZE, DEFAULT_N_SHARDS, build_index


def indexing_sink(
    root: str,
    *,
    key_cols: list[str],
    text_col: str = "text",
    n_shards: int = DEFAULT_N_SHARDS,
    block_size: int = DEFAULT_BLOCK_SIZE,
    store_positions: bool = True,
    stream_id: str = "stream",
    max_segments: int | None = None,
    tier_factor: float = 10.0,
    record_progress: bool = True,
):
    """Returns a foreachBatch function: stream.writeStream
    .foreachBatch(indexing_sink(root, key_cols=[...])).start().

    max_segments: enable the tiered merge policy inside the sink —
    after each micro-batch append, `maybe_merge` runs as Lucene's
    background merge scheduler would, so a long-running stream keeps a
    bounded segment count (and bounded query-side scan fan-in) without
    any operator intervention or full-index rewrites. The merge commits
    its own manifest version AFTER the append's, so a replayed batch
    still hits the append's idempotent-fingerprint no-op path first.

    record_progress: publish {stream_id: last appended batch_id} as
    commit user data WITH each append (Lucene setLiveCommitData — the
    Cloudant pattern of storing the consumed update sequence in the
    index commit itself), so an operator resuming a stream can read
    Searcher.user_data and know exactly which batch the snapshot
    contains without consulting the Spark checkpoint."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        from ..sources.manifest import IndexCatalog

        cat = IndexCatalog(root)
        exists = cat.exists()
        ud = None
        if record_progress:
            # commit data replaces wholesale (Lucene semantics), so
            # merge over the snapshot's map — progress keys of OTHER
            # streams writing this index survive
            base = cat.load().properties.get("user_data", {}) if exists else {}
            ud = {**base, f"last_batch:{stream_id}": str(batch_id)}
        build_index(
            spark,
            batch_df,
            root,
            key_cols=key_cols,
            text_col=text_col,
            n_shards=n_shards,
            block_size=block_size,
            store_positions=store_positions,
            append=exists,
            fingerprint=f"{stream_id}:{batch_id}",
            commit_user_data=ud,
        )
        if max_segments is not None:
            from ..operators.merge import maybe_merge

            maybe_merge(spark, root, max_segments=max_segments, tier_factor=tier_factor)

    return sink
