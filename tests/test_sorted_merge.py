"""Sorted merge (merge.merge_sorted — Lucene SortingCodecReader path).

Contracts:
- CANONICAL-REBUILD LAW: merge_sorted over (base + append + deletes +
  dv overrides) produces the SAME index a fresh build of the live
  post-override corpus with the same index_sort would — identical
  (docID -> key) mapping, bit-identical (doc, score) search results,
  identical doclen rows — because the chain rank is canonical;
- the index_sort pin SURVIVES (the concat/repack modes drop it) and
  search_sorted early-terminates on the merged index (block counter);
- pending deletes are applied (tombstoned docs gone, list cleared)
  and dv overrides fold BEFORE ranking (the remap orders by
  post-override values);
- offsets survive the rewrite (occurrence identity vs the rebuild);
- check_index (incl. its index-sort pass) is clean post-merge;
- guards: unsorted indexes are refused.
"""

import numpy as np
import pytest

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.check import check_index
from fdblucene_spark.operators.deletes import delete_docs, update_doc_values
from fdblucene_spark.operators.merge import merge_sorted
from fdblucene_spark.operators.query import Searcher

WORDS = ["ion", "flux", "core", "node", "edge", "path"]


def _corpus(n, seed, id0=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "k": id0 + i,
            "text": " ".join(rng.choice(WORDS, size=int(rng.integers(3, 20)))),
            "w": int(rng.integers(0, 10_000)),
        }
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def merged_pair(spark, tmp_path_factory):
    base_rows = _corpus(300, 11)
    app_rows = _corpus(150, 12, id0=300)
    rows = base_rows + app_rows
    basep = tmp_path_factory.mktemp("smerge")
    root = str(basep / "idx")
    kw = dict(
        key_cols=["k"], n_shards=4, block_size=8,
        stored_fields={"w": "w", "k": "k"}, index_sort=("w", True),
        store_offsets=True,
    )
    build_index(spark, spark.createDataFrame(base_rows), root, **kw)
    build_index(spark, spark.createDataFrame(app_rows), root, append=True, **kw)
    s0 = Searcher(spark, root)
    kmap = {r["k"]: r["doc"] for r in s0._stored_df().select("doc", "k").collect()}
    # tombstone every k % 13 == 0; dv-update w of every k % 17 == 0
    dead_ks = [r["k"] for r in rows if r["k"] % 13 == 0]
    delete_docs(spark, root, [kmap[k] for k in dead_ks])
    upd = [(kmap[r["k"]], 20_000 + r["k"]) for r in rows if r["k"] % 17 == 0]
    update_doc_values(spark, root, spark.createDataFrame(upd, "doc long, w long"))
    merge_sorted(spark, root)
    # the canonical rebuild: live corpus with post-override w values
    live = []
    for r in rows:
        if r["k"] % 13 == 0:
            continue
        w = 20_000 + r["k"] if r["k"] % 17 == 0 else r["w"]
        live.append({**r, "w": w})
    ref = str(basep / "ref")
    build_index(spark, spark.createDataFrame(live), ref, **kw)
    return rows, live, root, ref


def test_sorted_merge_canonical_rebuild_law(spark, merged_pair):
    rows, live, root, ref = merged_pair
    s, r = Searcher(spark, root), Searcher(spark, ref)
    assert len(s.manifest.segments) == 1
    assert s.manifest.properties["index_sort"] == [["w", True]]
    assert "deletes_path" not in s.manifest.properties
    assert "dv_path" not in s.manifest.properties
    # (doc -> k, w) identity with the fresh build
    a = sorted(map(tuple, s._stored_df().select("doc", "k", "w").collect()))
    b = sorted(map(tuple, r._stored_df().select("doc", "k", "w").collect()))
    assert a == b
    # bit-identical search, both modes
    for mode, terms in (("or", ["ion", "flux"]), ("and", ["core", "node"])):
        ga = [(x["doc"], np.float32(x["score"])) for x in s.search(terms, 50, mode).collect()]
        gb = [(x["doc"], np.float32(x["score"])) for x in r.search(terms, 50, mode).collect()]
        assert ga == gb, mode
    # doclen rows identical
    da = sorted(map(tuple, spark.read.parquet(*s.manifest.segment_paths(root, "doclen")).collect()))
    db = sorted(map(tuple, spark.read.parquet(*r.manifest.segment_paths(ref, "doclen")).collect()))
    assert da == db


def test_sorted_merge_offsets_survive(spark, merged_pair):
    rows, live, root, ref = merged_pair
    s, r = Searcher(spark, root), Searcher(spark, ref)
    a = sorted(map(tuple, s.offsets(["ion"]).collect()))
    b = sorted(map(tuple, r.offsets(["ion"]).collect()))
    assert a == b and len(a) > 0


def test_sorted_merge_early_termination(spark, merged_pair):
    import pandas as pd

    from fdblucene_spark.operators.query import _match_shard, _sorted_match_early

    rows, live, root, ref = merged_pair
    s = Searcher(spark, root)
    early = [
        tuple(x)
        for x in s.search_sorted(["ion"], k=12, sort_field="w", ascending=True).collect()
    ]
    generic = [
        tuple(x)
        for x in Searcher(spark, ref)
        .search_sorted(["ion"], k=12, sort_field="w", ascending=True)
        .collect()
    ]
    assert early == generic and len(early) == 12
    # counter proof on the merged segment files: the early kernel
    # decodes a strict subset of the blocks (the pin is real)
    seg_ranges = sorted((m.doc_min, m.doc_max) for m in s.manifest.segments)
    assert len(seg_ranges) == 1
    post = pd.concat(
        [pd.read_parquet(p) for p in s.manifest.segment_paths(root, "postings")]
    )
    post = post[(post["field"] == "text") & (post["term"].isin(["ion", "flux"]))]
    k = 5
    dec_total, blk_total = 0, 0
    for _, shard_pdf in post.groupby("shard"):
        groups = {t: g for t, g in shard_pdf.groupby("term", sort=False)}
        stats: dict = {}
        got = _sorted_match_early(groups, "or", ["ion", "flux"], None, k, seg_ranges, stats)
        want = np.sort(_match_shard(groups, "or", ["ion", "flux"], None))[:k]
        assert got.tolist() == want.tolist()
        dec_total += stats.get("blocks_decoded", 0)
        blk_total += stats.get("blocks_total", 0)
    assert blk_total > 8 and dec_total < blk_total / 2, (dec_total, blk_total)


def test_sorted_merge_check_index_clean(spark, merged_pair):
    rows, live, root, ref = merged_pair
    assert check_index(spark, root).count() == 0


def test_sorted_merge_requires_pin(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("smergeg") / "plain")
    build_index(
        spark, spark.createDataFrame(_corpus(40, 3)), root,
        key_cols=["k"], n_shards=2, stored_fields={"w": "w"},
    )
    with pytest.raises(ValueError, match="index_sort"):
        merge_sorted(spark, root)
