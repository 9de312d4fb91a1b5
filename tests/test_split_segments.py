"""Segment-level IndexSplitter (merge.split_segments).

Laws:
- zero-rewrite: the split index's segment files are byte-identical
  (content_hash preserved) and the source index is untouched;
- side-local stats: searching the split equals searching its
  segments, with carried tombstones honored as pending liveDocs;
- expunge on the split then compare against a FRESH build of the
  live subset: bit-identical scores (the strongest oracle);
- an index_sort pin carries (per-segment order is untouched);
- guards: unknown ids, empty selection, occupied destination.
"""

import os

import numpy as np
import pytest

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.deletes import delete_docs
from fdblucene_spark.operators.merge import expunge_deletes, split_segments
from fdblucene_spark.operators.query import Searcher


def _rows(n, off=0, tag="beta"):
    return [{"doc_id": off + i, "text": f"alpha {tag} w{off + i} common"} for i in range(n)]


@pytest.fixture(scope="module")
def two_seg(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("ssplit")
    root = str(base / "idx")
    build_index(spark, spark.createDataFrame(_rows(40)), root,
                key_cols=["doc_id"], n_shards=2)
    build_index(spark, spark.createDataFrame(_rows(30, 40, "gamma")), root,
                key_cols=["doc_id"], n_shards=2, append=True)
    delete_docs(spark, root, [3, 5, 41])
    return str(base), root


def test_split_zero_rewrite_and_pending_deletes(spark, two_seg):
    base, root = two_seg
    s = Searcher(spark, root)
    seg0 = s.manifest.segments[0]
    dst = os.path.join(base, "half")
    m2 = split_segments(root, [seg0.segment_id], dst)
    assert [x.segment_id for x in m2.segments] == [seg0.segment_id]
    assert m2.segments[0].content_hash == seg0.content_hash  # byte-identical copy
    t = Searcher(spark, dst)
    docs = sorted(r["doc"] for r in t.search(["alpha"], k=200).collect())
    assert docs and max(docs) < 40
    assert 3 not in docs and 5 not in docs  # carried tombstones honored
    # out-of-range tombstone (41) is inert; source untouched
    assert len(Searcher(spark, root).manifest.segments) == 2


def test_split_expunged_equals_fresh_build(spark, two_seg):
    base, root = two_seg
    s = Searcher(spark, root)
    seg0 = s.manifest.segments[0]
    dst = os.path.join(base, "half2")
    split_segments(root, [seg0.segment_id], dst)
    expunge_deletes(spark, dst)
    ref = os.path.join(base, "ref")
    live = [r for r in _rows(40) if r["doc_id"] not in (3, 5)]
    build_index(spark, spark.createDataFrame(live), ref, doc_col="doc_id", n_shards=2)
    a = [(r["doc"], np.float32(r["score"]))
         for r in Searcher(spark, dst).search(["alpha", "beta"], 50, "or").collect()]
    b = [(r["doc"], np.float32(r["score"]))
         for r in Searcher(spark, ref).search(["alpha", "beta"], 50, "or").collect()]
    assert a == b and len(a) == 38


def test_split_carries_index_sort_pin(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("ssplit2")
    root = str(base / "sidx")
    rows = [{"doc_id": i, "text": f"alpha w{i}", "w": (i * 37) % 100} for i in range(50)]
    kw = dict(key_cols=["doc_id"], n_shards=2, stored_fields={"w": "w"},
              index_sort=("w", True))
    build_index(spark, spark.createDataFrame(rows), root, **kw)
    s = Searcher(spark, root)
    dst = str(base / "dst")
    m2 = split_segments(root, [s.manifest.segments[0].segment_id], dst)
    assert m2.properties["index_sort"] == [["w", True]]
    hits = Searcher(spark, dst).search_sorted(["alpha"], k=5, sort_field="w",
                                              ascending=True).collect()
    ws = [r["w"] for r in hits]
    assert ws == sorted(ws)


def test_split_guards(spark, two_seg):
    base, root = two_seg
    s = Searcher(spark, root)
    sid = s.manifest.segments[0].segment_id
    with pytest.raises(ValueError, match="unknown segment"):
        split_segments(root, ["nope"], os.path.join(base, "g1"))
    with pytest.raises(ValueError, match="non-empty"):
        split_segments(root, [], os.path.join(base, "g2"))
    dst = os.path.join(base, "g3")
    split_segments(root, [sid], dst)
    with pytest.raises(ValueError, match="already an index"):
        split_segments(root, [sid], dst)
