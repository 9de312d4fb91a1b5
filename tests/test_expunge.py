"""expunge_deletes (Lucene IndexWriter.forceMergeDeletes): rewrite
ONLY the segments holding tombstoned docs.

Laws pinned here:
- dirty-segment isolation: clean segments survive by identity (same
  segment_id AND content_hash — never rewritten, not merely re-listed)
- exactness: post-expunge search results (docs AND float32 scores) are
  bit-identical to merge_segments(mode='repack') on a twin index with
  the same tombstones — the full-rewrite path whose stats-exactness
  the merge suite already pins
- the delete list clears from the manifest; no-op cases (no deletes /
  out-of-range tombstones) never rewrite a segment
"""

import numpy as np
import pytest

from fdblucene_spark.data import synth
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.deletes import delete_docs
from fdblucene_spark.operators.merge import expunge_deletes, merge_segments
from fdblucene_spark.operators.query import Searcher
from fdblucene_spark.sources.manifest import IndexCatalog

N_A, N_B, N_C = 40, 30, 30


def _build_three_segments(spark, root):
    full = synth.transcripts(spark, n_convs=N_A + N_B + N_C)
    a = full.filter(full.conv_id < f"conv_{N_A:06d}")
    b = full.filter(
        (full.conv_id >= f"conv_{N_A:06d}") & (full.conv_id < f"conv_{N_A + N_B:06d}")
    )
    c = full.filter(full.conv_id >= f"conv_{N_A + N_B:06d}")
    build_index(spark, a, root, key_cols=["conv_id", "turn_idx"], n_shards=4)
    build_index(spark, b, root, key_cols=["conv_id", "turn_idx"], n_shards=4, append=True)
    build_index(spark, c, root, key_cols=["conv_id", "turn_idx"], n_shards=4, append=True)
    return IndexCatalog(root).load()


QUERIES = [
    (["term00000", "term00042"], 25, "or"),
    (["term00003", "term00015"], 25, "and"),
    (["term00007"], 100, "or"),
]


def _results(spark, root):
    s = Searcher(spark, root)
    return [
        [(r["doc"], float(np.float32(r["score"]))) for r in s.search(t, k, m).collect()]
        for t, k, m in QUERIES
    ]


def test_expunge_rewrites_only_dirty_segments(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx-exp"))
    twin = str(tmp_path_factory.mktemp("idx-exp-twin"))
    m0 = _build_three_segments(spark, root)
    _build_three_segments(spark, twin)
    assert len(m0.segments) == 3
    # tombstone docs from the MIDDLE segment's range only
    mid = sorted(m0.segments, key=lambda s: s.doc_min)[1]
    dels = list(range(mid.doc_min + 1, mid.doc_min + 15))
    delete_docs(spark, root, dels)
    delete_docs(spark, twin, dels)

    m1 = expunge_deletes(spark, root)
    # the delete list cleared; exactly one new segment replaces mid
    assert "deletes_path" not in m1.properties
    assert len(m1.segments) == 3
    old_clean = {
        s.segment_id: s.content_hash for s in m0.segments if s.segment_id != mid.segment_id
    }
    new_ids = {s.segment_id for s in m1.segments}
    assert mid.segment_id not in new_ids
    for sid, h in old_clean.items():
        assert sid in new_ids  # clean segments survive by identity
        (kept,) = [s for s in m1.segments if s.segment_id == sid]
        assert kept.content_hash == h

    # exactness: bit-identical to the full repack on the twin
    merge_segments(spark, twin, mode="repack")
    assert _results(spark, root) == _results(spark, twin)


def test_expunge_noop_without_deletes(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx-exp2"))
    m0 = _build_three_segments(spark, root)
    m1 = expunge_deletes(spark, root)
    assert m1.version == m0.version  # no commit at all


def test_expunge_out_of_range_clears_without_rewrite(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx-exp3"))
    m0 = _build_three_segments(spark, root)
    delete_docs(spark, root, [10**9, 10**9 + 1])
    m1 = expunge_deletes(spark, root)
    assert "deletes_path" not in m1.properties
    assert {s.segment_id for s in m1.segments} == {s.segment_id for s in m0.segments}
    assert m1.version > m0.version  # the cleared list is a real commit


def test_expunge_docs_gone_and_stats_exact(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx-exp4"))
    m0 = _build_three_segments(spark, root)
    s = Searcher(spark, root)
    hits = [r["doc"] for r in s.search(["term00000"], 50, "or").collect()]
    assert hits
    victim = hits[0]
    delete_docs(spark, root, [victim])
    expunge_deletes(spark, root)
    s2 = Searcher(spark, root)
    post = [r["doc"] for r in s2.search(["term00000"], 50, "or").collect()]
    assert victim not in post
    # manifest n_docs dropped by exactly the tombstone count
    m1 = IndexCatalog(root).load()
    assert m1.n_docs == m0.n_docs - 1


def test_searcher_refresh(spark, tmp_path_factory):
    """SearcherManager analogue: refresh() is identity while nothing
    committed, returns a latest-pin Searcher after a commit, and the
    old pin keeps serving its snapshot (isolation)."""
    root = str(tmp_path_factory.mktemp("idx-refresh"))
    df = synth.transcripts(spark, n_convs=20)
    build_index(spark, df, root, key_cols=["conv_id", "turn_idx"], n_shards=4)
    s0 = Searcher(spark, root)
    assert s0.refresh() is s0
    victim = s0.search(["term00000"], 5, "or").collect()[0]["doc"]
    delete_docs(spark, root, [int(victim)])
    s1 = s0.refresh()
    assert s1 is not s0 and s1.manifest.version > s0.manifest.version
    assert int(victim) in [r["doc"] for r in s0.search(["term00000"], 50, "or").collect()]
    assert int(victim) not in [r["doc"] for r in s1.search(["term00000"], 50, "or").collect()]
