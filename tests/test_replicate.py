"""Replication laws (Lucene replicator module analogue).

- a synced replica is search-identical to the source commit point
- sync is incremental (unchanged segments are skipped), idempotent
  (re-sync copies and commits nothing), and self-repairing (a
  corrupted replica segment is detected by fingerprint and re-copied)
- publish_revision pins a commit point across expire_orphans so a
  slow replica can still sync it; release_revision un-pins it
"""

import os
import shutil

import pytest

from fdblucene_spark.data import synth
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.deletes import delete_docs
from fdblucene_spark.operators.query import Searcher
from fdblucene_spark.operators.replicate import (
    publish_revision,
    release_revision,
    sync_replica,
)
from fdblucene_spark.sources.manifest import IndexCatalog

N_A, N_B = 40, 20
QUERIES = [
    (["term00000", "term00042"], 10, "or"),
    (["term00003", "term00015"], 50, "and"),
    (["needlealpha"], 20, "or"),
]


def _results(spark, root, version=None):
    s = Searcher(spark, root, version=version)
    return [
        [(r["doc"], round(r["score"], 6)) for r in s.search(t, k, m).collect()]
        for t, k, m in QUERIES
    ]


@pytest.fixture(scope="module")
def src_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("repl-src"))
    corpus = synth.transcripts(spark, n_convs=N_A)
    build_index(spark, corpus, root, key_cols=["conv_id", "turn_idx"], n_shards=4)
    return root


def test_replica_search_identical(spark, src_root, tmp_path):
    dst = str(tmp_path / "replica")
    m, rep = sync_replica(src_root, dst)
    assert rep.committed and rep.dst_version == 1
    assert len(rep.segments_copied) == 1 and not rep.segments_skipped
    assert rep.bytes_copied > 0
    assert _results(spark, dst) == _results(spark, src_root)
    # replica passes its own integrity check
    assert IndexCatalog(dst).verify_segments() == []


def test_resync_is_noop(spark, src_root, tmp_path):
    dst = str(tmp_path / "replica")
    _, first = sync_replica(src_root, dst)
    m2, rep2 = sync_replica(src_root, dst)
    assert not rep2.committed
    assert rep2.dst_version == first.dst_version == m2.version
    assert not rep2.segments_copied and rep2.bytes_copied == 0
    assert rep2.segments_skipped  # seen and fingerprint-matched


def test_incremental_sync_after_append_and_delete(spark, src_root, tmp_path):
    # clone the source so this test's commits don't leak to others
    src = str(tmp_path / "src2")
    shutil.copytree(src_root, src)
    dst = str(tmp_path / "replica")
    sync_replica(src, dst)

    more = synth.transcripts(spark, n_convs=N_A + N_B).filter(
        f"conv_id >= 'conv_{N_A:06d}'"
    )
    build_index(spark, more, src, key_cols=["conv_id", "turn_idx"], n_shards=4,
                append=True)
    delete_docs(spark, src, [0, 1, 2])

    m, rep = sync_replica(src, dst)
    assert rep.committed
    assert len(rep.segments_copied) == 1  # only the appended segment moved
    assert len(rep.segments_skipped) == 1
    assert rep.sidecars_copied  # the delete list travelled
    assert _results(spark, dst) == _results(spark, src)
    # deletes are live on the replica: tombstoned docs never surface
    s = Searcher(spark, dst)
    hit_docs = {r["doc"] for r in s.search(["term00000"], 1000, "or").collect()}
    assert not hit_docs & {0, 1, 2}


def test_sync_repairs_corrupt_replica(spark, src_root, tmp_path):
    dst = str(tmp_path / "replica")
    _, first = sync_replica(src_root, dst)
    seg = IndexCatalog(dst).load().segments[0]
    seg_dir = os.path.join(dst, seg.path)
    victim = next(
        os.path.join(b, n) for b, _d, ns in os.walk(seg_dir) for n in ns
        if n.endswith(".parquet")
    )
    with open(victim, "ab") as f:
        f.write(b"corruption")
    assert IndexCatalog(dst).verify_segments() != []
    _, rep = sync_replica(src_root, dst)
    assert rep.segments_copied == [seg.segment_id]  # re-copied, not skipped
    assert IndexCatalog(dst).verify_segments() == []
    assert _results(spark, dst) == _results(spark, src_root)


def test_publish_pins_commit_point_across_expiry(spark, src_root, tmp_path):
    src = str(tmp_path / "src3")
    shutil.copytree(src_root, src)
    pinned = publish_revision(src)

    # rewrite the segment set (delete + repack merge), then age the
    # pinned version out of the keep window — only the pin keeps its
    # segment files alive
    from fdblucene_spark.operators.merge import merge_segments

    delete_docs(spark, src, [0, 1, 2])
    merge_segments(spark, src, mode="repack")
    cat = IndexCatalog(src)
    pinned_segs = {s.path for s in cat.load(pinned).segments}
    removed = cat.expire_orphans(keep_versions=1)
    assert not ({os.path.normpath(r) for r in removed}
                & {os.path.normpath(p) for p in pinned_segs})

    dst = str(tmp_path / "replica")
    m, rep = sync_replica(src, dst, version=pinned)
    assert rep.src_version == pinned
    assert _results(spark, dst) == _results(spark, src, version=pinned)
    # replica of the pinned (pre-delete) commit has no delete sidecar
    assert "deletes_path" not in m.properties

    release_revision(src, pinned)
    assert pinned not in cat.snapshots()
