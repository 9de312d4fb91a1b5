"""Commit-point rollback + snapshot pins (Lucene SnapshotDeletionPolicy
+ IndexWriterConfig.setIndexCommit on a held commit).

Contracts: rollback_to republishes an OLD commit point as a NEW
monotonic version (history append-only — readers pinned between the
two are untouched); the restored manifest brings back the target's
whole state including delete sidecars; snapshot() pins a version's
segments against expire_orphans however old it gets; release +
expiry makes them collectible again.
"""

import os

import numpy as np
import pytest

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.deletes import delete_docs
from fdblucene_spark.operators.query import Searcher
from fdblucene_spark.sources.manifest import IndexCatalog

WORDS = ["ape", "bee", "cat", "doe", "elk", "fox"]


def _rows(n, seed, id0=0):
    rng = np.random.default_rng(seed)
    return [
        {"k": id0 + i, "text": " ".join(rng.choice(WORDS, size=int(rng.integers(2, 12))))}
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def rb_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rb") / "idx")
    build_index(spark, spark.createDataFrame(_rows(100, 7)), root,
                key_cols=["k"], n_shards=4, fingerprint="a")
    return root


def test_rollback_restores_old_commit_point(spark, rb_index):
    cat = IndexCatalog(rb_index)
    v1 = cat.current_version()
    base = {(r["doc"], r["score"])
            for r in Searcher(spark, rb_index).search(["fox"], 500).collect()}
    build_index(spark, spark.createDataFrame(_rows(50, 9, id0=5000)), rb_index,
                key_cols=["k"], n_shards=4, append=True, fingerprint="b")
    v2 = cat.current_version()
    assert v2 > v1
    grown = {(r["doc"], r["score"])
             for r in Searcher(spark, rb_index).search(["fox"], 500).collect()}
    assert grown != base  # append changed hits and/or idf/avgdl stats
    m = cat.rollback_to(v1)
    # append-only history: rollback is a NEW version mirroring v1
    assert m.version > v2 and m.parent_version == v2
    assert m.properties["restored_version"] == v1
    assert cat.current_version() == m.version
    restored = {(r["doc"], r["score"])
                for r in Searcher(spark, rb_index).search(["fox"], 500).collect()}
    assert restored == base
    # a reader pinned to the intermediate commit still sees it
    assert cat.load(v2).n_docs == 150 and cat.load().n_docs == 100


def test_rollback_restores_delete_state(spark, rb_index):
    cat = IndexCatalog(rb_index)
    s = Searcher(spark, rb_index)
    victim = int(s.search(["fox"], 1).collect()[0]["doc"])
    v_before = cat.current_version()
    delete_docs(spark, rb_index, [victim])
    assert victim not in {
        int(r["doc"]) for r in Searcher(spark, rb_index).search(["fox"], 500).collect()
    }
    cat.rollback_to(v_before)  # un-deletes: old properties come back
    assert victim in {
        int(r["doc"]) for r in Searcher(spark, rb_index).search(["fox"], 500).collect()
    }
    with pytest.raises(FileNotFoundError):
        cat.rollback_to(999999)


def test_snapshot_protects_segments_from_expiry(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snap") / "idx")
    build_index(spark, spark.createDataFrame(_rows(40, 3)), root,
                key_cols=["k"], n_shards=2, fingerprint="a")
    cat = IndexCatalog(root)
    v1 = cat.current_version()
    seg1_paths = {s.path for s in cat.load(v1).segments}
    assert cat.snapshot() == v1  # defaults to CURRENT
    assert cat.snapshots() == [v1]
    cat.snapshot(v1)  # idempotent
    assert cat.snapshots() == [v1]
    # age v1 far out of the keep window with data-free commits
    for i in range(5):
        cat.commit_user_data({"seq": str(i)})
    removed = cat.expire_orphans(keep_versions=2)
    assert removed == []  # snapshot held the segments
    assert all(os.path.isdir(os.path.join(root, p)) for p in seg1_paths)
    # pinned reader still opens and searches the old commit
    s_old = Searcher(spark, root, version=v1)
    assert s_old.manifest.version == v1
    assert s_old.search(["ape"], 5).count() > 0
    # release -> collectible; but only segments NOT referenced by the
    # kept newest manifests go (here the same segments are still
    # referenced by CURRENT, so nothing is removed)
    cat.release_snapshot(v1)
    assert cat.snapshots() == []
    assert cat.expire_orphans(keep_versions=2) == []
    with pytest.raises(ValueError, match="not snapshotted"):
        cat.release_snapshot(v1)
    with pytest.raises(FileNotFoundError):
        cat.snapshot(424242)


def test_released_rollback_target_is_collectible(spark, tmp_path_factory):
    """Full lifecycle: snapshot v1, REPLACE the corpus state via new
    appends + a rollback elsewhere, release the pin, expire — v1's
    segments go only when unreferenced by every kept/pinned version."""
    root = str(tmp_path_factory.mktemp("lc") / "idx")
    build_index(spark, spark.createDataFrame(_rows(30, 5)), root,
                key_cols=["k"], n_shards=2, fingerprint="a")
    cat = IndexCatalog(root)
    v1 = cat.current_version()
    seg1 = {s.path for s in cat.load(v1).segments}
    cat.snapshot(v1)
    from fdblucene_spark.operators.merge import merge_segments

    build_index(spark, spark.createDataFrame(_rows(30, 6, id0=900)), root,
                key_cols=["k"], n_shards=2, append=True, fingerprint="b")
    merge_segments(spark, root)  # rewrites into one segment; v1 segs now old
    for i in range(4):
        cat.commit_user_data({"seq": str(i)})
    # the unpinned middle commit's segments may age out, but the
    # pinned v1 segments must survive
    assert seg1.isdisjoint(set(cat.expire_orphans(keep_versions=2)))
    assert all(os.path.isdir(os.path.join(root, p)) for p in seg1)
    cat.release_snapshot(v1)
    removed = cat.expire_orphans(keep_versions=2)
    assert seg1 <= set(removed)  # v1 segments collected after release
    # the index remains healthy at CURRENT
    assert IndexCatalog(root).verify_segments() == []
    assert Searcher(spark, root).search(["ape"], 5).count() >= 0
