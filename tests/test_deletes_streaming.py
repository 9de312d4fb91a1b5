"""Deletes (L21) and Structured Streaming incremental ingestion."""

import os
import time

import pandas as pd
import pytest

from fdblucene_spark import oracle
from fdblucene_spark.data import synth
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.deletes import delete_docs
from fdblucene_spark.operators.merge import merge_segments
from fdblucene_spark.operators.query import Searcher
from fdblucene_spark.sources.manifest import IndexCatalog
from fdblucene_spark.streaming.incremental import indexing_sink

N = 80


@pytest.fixture(scope="module")
def base(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx-del"))
    df = synth.transcripts(spark, n_convs=N)
    build_index(spark, df, root, key_cols=["conv_id", "turn_idx"], n_shards=4)
    return root


def test_deleted_docs_vanish_from_results(spark, base):
    s0 = Searcher(spark, base)
    before = s0.search(["term00000"], 50).toPandas()
    victims = before["doc"].tolist()[:3]
    delete_docs(spark, base, victims)
    s1 = Searcher(spark, base)
    after = s1.search(["term00000"], 50).toPandas()
    assert not set(victims) & set(after["doc"])
    # Lucene semantics: surviving docs keep score and relative order
    # before a merge; newly promoted docs (old rank > k) can only
    # append after the full survivor prefix
    survivors = before[~before["doc"].isin(victims)]
    assert after["doc"].tolist()[: len(survivors)] == survivors["doc"].tolist()
    assert after["score"].tolist()[: len(survivors)] == survivors["score"].tolist()
    # old snapshot still sees them (time travel)
    s_old = Searcher(spark, base, version=s0.manifest.version)
    assert set(victims) <= set(s_old.search(["term00000"], 50).toPandas()["doc"])


def test_delete_is_monotone_union(spark, base):
    m1 = delete_docs(spark, base, [1])
    m2 = delete_docs(spark, base, [1, 2])
    assert m2.properties["n_deletes"] >= m1.properties["n_deletes"]


def test_repack_applies_deletes_and_recomputes_stats(spark, base):
    cat = IndexCatalog(base)
    before = cat.load()
    n_del = before.properties["n_deletes"]
    assert n_del > 0
    m = merge_segments(spark, base, mode="repack")
    assert "deletes_path" not in m.properties
    assert m.n_docs == before.n_docs - n_del
    # stats now reflect survivors: rank-identical to a fresh build of
    # the surviving corpus
    pdf = synth.transcripts_pandas(N).sort_values(["conv_id", "turn_idx"], ignore_index=True)
    import pyarrow.parquet as pq

    deleted = set()
    for v in cat.versions():
        rel = cat.load(v).properties.get("deletes_path")
        if rel:
            deleted |= set(
                pq.read_table(os.path.join(base, rel), columns=["doc"])["doc"].to_pylist()
            )
    keep = pdf.drop(index=list(deleted)).reset_index(drop=True)
    oidx = oracle.build_oracle_index(keep.index.tolist(), keep["text"].tolist())
    s = Searcher(spark, base)
    assert s.n_docs == oidx.n_docs
    got = s.search(["term00002", "term00040"], 20).toPandas()
    exp = oracle.search(oidx, ["term00002", "term00040"], 20)
    # docIDs differ (engine keeps original ids) but scores + count must
    # match the surviving-corpus oracle exactly
    assert [round(x, 5) for x in got["score"]] == [round(sc, 5) for _, sc in exp]


def test_streaming_foreachbatch_incremental(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream-src"))
    ckpt = str(tmp_path_factory.mktemp("stream-ckpt"))
    root = str(tmp_path_factory.mktemp("idx-stream"))

    full = synth.transcripts(spark, n_convs=30)
    # two micro-batches: conv < 15, conv >= 15 — written as files
    full.filter(full.conv_id < "conv_000015").write.parquet(os.path.join(src, "b0"))
    stream = (
        spark.readStream.schema(synth.TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", "64")
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            indexing_sink(root, key_cols=["conv_id", "turn_idx"], n_shards=4, stream_id="t")
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    full.filter(full.conv_id >= "conv_000015").write.parquet(os.path.join(src, "b1"))
    q2 = (
        spark.readStream.schema(synth.TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", "64")
        .parquet(src + "/*")
        .writeStream.foreachBatch(
            indexing_sink(root, key_cols=["conv_id", "turn_idx"], n_shards=4, stream_id="t")
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    # index now equals a one-shot batch build over the full corpus
    pdf = synth.transcripts_pandas(30).sort_values(["conv_id", "turn_idx"], ignore_index=True)
    oidx = oracle.build_oracle_index(list(range(len(pdf))), pdf["text"].tolist())
    s = Searcher(spark, root)
    assert s.n_docs == oidx.n_docs
    exp = oracle.search(oidx, ["term00001", "term00033"], 15)
    got = [(r["doc"], r["score"]) for r in s.search(["term00001", "term00033"], 15).collect()]
    # doc ids: batches arrive in conv order so dense ids align with oracle
    assert [round(s, 5) for _, s in exp] == [round(s, 5) for _, s in got]


def test_streaming_replay_is_idempotent(spark, base):
    # calling the sink twice with the same (stream_id, batch_id) is a no-op
    sink = indexing_sink(base, key_cols=["conv_id", "turn_idx"], n_shards=4, stream_id="replay")
    extra = synth.transcripts(spark, n_convs=N + 5).filter(f"conv_id >= 'conv_{N:06d}'")
    sink(extra, 7)
    v1 = IndexCatalog(base).current_version()
    sink(extra, 7)  # replay
    assert IndexCatalog(base).current_version() == v1


def test_streaming_sink_with_merge_policy(spark, tmp_path_factory):
    """indexing_sink(max_segments=): the tiered merge policy runs
    inside foreachBatch like a background merge scheduler — many
    micro-batch appends keep the snapshot's segment count bounded, and
    the final index is rank-identical to a one-shot batch build."""
    import os

    from fdblucene_spark.sources.manifest import IndexCatalog

    src = str(tmp_path_factory.mktemp("mp-src"))
    ckpt = str(tmp_path_factory.mktemp("mp-ckpt"))
    root = str(tmp_path_factory.mktemp("idx-mp"))

    full = synth.transcripts(spark, n_convs=24)
    # 8 micro-batches of 3 convs each (one file per batch)
    for i in range(8):
        lo, hi = f"conv_{i * 3:06d}", f"conv_{(i + 1) * 3:06d}"
        full.filter((full.conv_id >= lo) & (full.conv_id < hi)).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    q = (
        spark.readStream.schema(synth.TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
        .writeStream.foreachBatch(
            indexing_sink(root, key_cols=["conv_id", "turn_idx"], n_shards=4,
                          stream_id="mp", max_segments=3, tier_factor=50.0)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    man = IndexCatalog(root).load()
    assert len(man.segments) <= 3, [s.segment_id for s in man.segments]

    pdf = synth.transcripts_pandas(24).sort_values(["conv_id", "turn_idx"], ignore_index=True)
    oidx = oracle.build_oracle_index(list(range(len(pdf))), pdf["text"].tolist())
    s = Searcher(spark, root)
    assert s.n_docs == oidx.n_docs
    for terms, mode in [(["term00001", "term00010"], "or"),
                        (["term00001", "term00000"], "phrase")]:
        exp = oracle.search(oidx, terms, 20, mode)
        got = [(r["doc"], r["score"]) for r in s.search(list(terms), 20, mode).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], (terms, mode)
