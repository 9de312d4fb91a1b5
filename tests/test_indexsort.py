"""Index-time sorting (IndexWriterConfig.setIndexSort) + early-
terminated sorted search.

Contracts:
- docID rank within a segment follows the index_sort field's values;
- search_sorted over a sorted index returns results IDENTICAL to the
  generic path over an unsorted index of the same corpus;
- the early-termination kernel provably decodes fewer blocks than the
  index holds (counter test on the real segment files);
- the pin behaves like the other creation-time configs: appends must
  match, mismatches raise, CONCAT merges drop it (a concat merge
  interleaves sorted runs and refuses to claim sortedness it did not
  produce) and results stay correct after; the sorted-merge path that
  re-sorts and KEEPS the pin is merge.merge_sorted
  (tests/test_sorted_merge.py).
"""

import os

import numpy as np
import pandas as pd
import pytest

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.merge import merge_segments
from fdblucene_spark.operators.query import Searcher, _match_shard, _sorted_match_early
from fdblucene_spark.sources.manifest import IndexCatalog

WORDS = ["ion", "flux", "core", "node", "edge", "path"]


def _corpus(n, seed, id0=0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        ln = int(rng.integers(3, 20))
        rows.append(
            {
                "k": id0 + i,
                "text": " ".join(rng.choice(WORDS, size=ln)),
                "w": int(rng.integers(0, 10_000)),
            }
        )
    return rows


@pytest.fixture(scope="module")
def sorted_pair(spark, tmp_path_factory):
    """The same 400-doc corpus indexed twice: index_sort=('w', asc)
    vs unsorted. block_size=8 forces many blocks per (term, shard)."""
    rows = _corpus(400, 7)
    df = spark.createDataFrame(rows)
    base = tmp_path_factory.mktemp("isort")
    r_sorted, r_plain = str(base / "sorted"), str(base / "plain")
    build_index(
        spark, df, r_sorted, key_cols=["k"], n_shards=4, block_size=8,
        stored_fields={"w": "w"}, index_sort=("w", True),
    )
    build_index(
        spark, df, r_plain, key_cols=["k"], n_shards=4, block_size=8,
        stored_fields={"w": "w"},
    )
    return rows, r_sorted, r_plain


def test_docid_rank_follows_sort_values(spark, sorted_pair):
    _, r_sorted, _ = sorted_pair
    s = Searcher(spark, r_sorted)
    stored = s._stored_df().select("doc", "w").toPandas().sort_values("doc")
    assert (np.diff(stored["w"].to_numpy()) >= 0).all()
    assert s.manifest.properties["index_sort"] == [["w", True]]


@pytest.mark.parametrize("mode,terms", [("or", ["ion", "flux"]), ("and", ["core", "node"])])
def test_sorted_search_identical_to_generic(spark, sorted_pair, mode, terms):
    """Early-terminated sorted top-k == generic path on the unsorted
    twin (docIDs differ between the indexes, so compare by key via w
    values + match multiset sizes, then exact per-index oracle)."""
    rows, r_sorted, r_plain = sorted_pair
    k = 13
    s_sorted = Searcher(spark, r_sorted)
    s_plain = Searcher(spark, r_plain)
    a = s_sorted.search_sorted(terms, k=k, sort_field="w", ascending=True, mode=mode).toPandas()
    b = s_plain.search_sorted(terms, k=k, sort_field="w", ascending=True, mode=mode).toPandas()
    # same sort-field values in the same order (docIDs are index-local)
    assert a["w"].tolist() == b["w"].tolist()
    # exact brute-force oracle on values
    toks = {r["k"]: r["text"].split() for r in rows}
    match = [
        r["w"] for r in rows
        if (any(t in toks[r["k"]] for t in terms) if mode == "or"
            else all(t in toks[r["k"]] for t in terms))
    ]
    assert a["w"].tolist() == sorted(match)[:k]


def test_early_termination_decodes_fewer_blocks(spark, sorted_pair):
    """Counter proof on the real segment files: the early kernel stops
    after ~k docs per (shard, segment) while the index holds far more
    blocks; results identical to the exhaustive matcher's first k."""
    _, r_sorted, _ = sorted_pair
    s = Searcher(spark, r_sorted)
    seg_ranges = sorted((m.doc_min, m.doc_max) for m in s.manifest.segments)
    post = pd.read_parquet(s.manifest.segment_paths(r_sorted, "postings")[0])
    post = post[post["field"] == "text"]
    k = 5
    dec_total, blk_total = 0, 0
    for _, shard_pdf in post[post["term"].isin(["ion", "flux"])].groupby("shard"):
        groups = {t: g for t, g in shard_pdf.groupby("term", sort=False)}
        stats: dict = {}
        got = _sorted_match_early(groups, "or", ["ion", "flux"], None, k, seg_ranges, stats)
        want = np.sort(_match_shard(groups, "or", ["ion", "flux"], None))[:k]
        assert got.tolist() == want.tolist()
        dec_total += stats.get("blocks_decoded", 0)
        blk_total += stats.get("blocks_total", 0)
    assert blk_total > 8
    assert dec_total < blk_total / 2, (dec_total, blk_total)


def test_index_sort_validation(spark, sorted_pair, tmp_path):
    rows, r_sorted, _ = sorted_pair
    df = spark.createDataFrame(rows)
    with pytest.raises(ValueError, match="key_cols mode"):
        build_index(
            spark, df, str(tmp_path / "x1"), doc_col="k",
            stored_fields={"w": "w"}, index_sort=("w", True),
        )
    with pytest.raises(ValueError, match="stored_fields"):
        build_index(
            spark, df, str(tmp_path / "x2"), key_cols=["k"], index_sort=("w", True)
        )
    # append with a mismatched sort pin refuses (S2 analogue)
    df2 = spark.createDataFrame(_corpus(50, 11, id0=1000))
    with pytest.raises(ValueError, match="index_sort pinned"):
        build_index(
            spark, df2, r_sorted, key_cols=["k"], n_shards=4, block_size=8,
            stored_fields={"w": "w"}, append=True,
        )


def test_append_keeps_per_segment_sort_and_merge_drops_pin(spark, tmp_path_factory, sorted_pair):
    rows, _, _ = sorted_pair
    spark_rows = _corpus(150, 3)
    extra = _corpus(80, 5, id0=5000)
    root = str(tmp_path_factory.mktemp("isort-app") / "idx")
    df1 = spark.createDataFrame(spark_rows)
    df2 = spark.createDataFrame(extra)
    build_index(
        spark, df1, root, key_cols=["k"], n_shards=4, block_size=8,
        stored_fields={"w": "w"}, index_sort=("w", True), fingerprint="a",
    )
    build_index(
        spark, df2, root, key_cols=["k"], n_shards=4, block_size=8,
        stored_fields={"w": "w"}, index_sort=("w", True), append=True,
        fingerprint="b",
    )
    s = Searcher(spark, root)
    # each SEGMENT is internally sorted (Lucene per-segment semantics)
    stored = s._stored_df().select("doc", "w").toPandas().sort_values("doc")
    for lo, hi in sorted((m.doc_min, m.doc_max) for m in s.manifest.segments):
        seg = stored[(stored["doc"] >= lo) & (stored["doc"] <= hi)]
        assert (np.diff(seg["w"].to_numpy()) >= 0).all()
    toks = {r["k"]: r["text"].split() for r in spark_rows + extra}
    wmap = {r["k"]: r["w"] for r in spark_rows + extra}
    want = sorted(wmap[d] for d in toks if "edge" in toks[d])[:9]
    got = s.search_sorted(["edge"], k=9, sort_field="w", ascending=True)
    assert [r["w"] for r in got.collect()] == want
    # merge interleaves the two sorted runs -> pin drops, results hold
    merge_segments(spark, root, mode="concat")
    s2 = Searcher(spark, root)
    assert "index_sort" not in s2.manifest.properties
    got2 = s2.search_sorted(["edge"], k=9, sort_field="w", ascending=True)
    assert [r["w"] for r in got2.collect()] == want


def test_descending_index_sort(spark, tmp_path_factory):
    rows = _corpus(200, 13)
    root = str(tmp_path_factory.mktemp("isort-desc") / "idx")
    build_index(
        spark, spark.createDataFrame(rows), root, key_cols=["k"], n_shards=4,
        block_size=8, stored_fields={"w": "w"}, index_sort=("w", False),
    )
    s = Searcher(spark, root)
    stored = s._stored_df().select("doc", "w").toPandas().sort_values("doc")
    assert (np.diff(stored["w"].to_numpy()) <= 0).all()
    toks = {r["k"]: r["text"].split() for r in rows}
    wmap = {r["k"]: r["w"] for r in rows}
    want = sorted((wmap[d] for d in toks if "path" in toks[d]), reverse=True)[:7]
    got = s.search_sorted(["path"], k=7, sort_field="w", ascending=False)
    assert [r["w"] for r in got.collect()] == want


@pytest.fixture(scope="module")
def chain_pair(spark, tmp_path_factory):
    """Multi-field setIndexSort: chain (bucket asc, w desc) vs the
    unsorted twin. bucket has only 4 values, so the secondary field
    does real tie-breaking work inside every bucket."""
    rng = np.random.default_rng(23)
    rows = []
    for i in range(400):
        ln = int(rng.integers(3, 20))
        rows.append(
            {
                "k": i,
                "text": " ".join(rng.choice(WORDS, size=ln)),
                "bucket": int(rng.integers(0, 4)),
                "w": int(rng.integers(0, 10_000)),
            }
        )
    df = spark.createDataFrame(rows)
    base = tmp_path_factory.mktemp("isortm")
    r_sorted, r_plain = str(base / "sorted"), str(base / "plain")
    build_index(
        spark, df, r_sorted, key_cols=["k"], n_shards=4, block_size=8,
        stored_fields={"bucket": "bucket", "w": "w"},
        index_sort=[("bucket", True), ("w", False)],
    )
    build_index(
        spark, df, r_plain, key_cols=["k"], n_shards=4, block_size=8,
        stored_fields={"bucket": "bucket", "w": "w"},
    )
    return rows, r_sorted, r_plain


def test_chain_docid_rank_follows_chain(spark, chain_pair):
    _, r_sorted, _ = chain_pair
    s = Searcher(spark, r_sorted)
    assert s.manifest.properties["index_sort"] == [["bucket", True], ["w", False]]
    stored = s._stored_df().select("doc", "bucket", "w").toPandas().sort_values("doc")
    keys = list(zip(stored["bucket"], -stored["w"]))
    assert keys == sorted(keys)


@pytest.mark.parametrize("mode,terms", [("or", ["ion", "flux"]), ("and", ["core", "node"])])
def test_chain_sorted_multi_identical_to_generic(spark, chain_pair, mode, terms):
    """search_sorted_multi with the exact pinned chain (early path) ==
    the layout-agnostic path on the unsorted twin == brute force."""
    rows, r_sorted, r_plain = chain_pair
    k = 13
    chain = [("bucket", True), ("w", False)]
    a = Searcher(spark, r_sorted).search_sorted_multi(terms, k, chain, mode=mode).toPandas()
    b = Searcher(spark, r_plain).search_sorted_multi(terms, k, chain, mode=mode).toPandas()
    assert list(zip(a["bucket"], a["w"])) == list(zip(b["bucket"], b["w"]))
    toks = {r["k"]: r["text"].split() for r in rows}
    match = [
        (r["bucket"], -r["w"]) for r in rows
        if (any(t in toks[r["k"]] for t in terms) if mode == "or"
            else all(t in toks[r["k"]] for t in terms))
    ]
    want = [(bkt, -nw) for bkt, nw in sorted(match)[:k]]
    assert list(zip(a["bucket"], a["w"])) == want


def test_chain_prefix_sort_takes_generic_path(spark, chain_pair):
    """A PREFIX of the pinned chain must NOT early-terminate (within
    prefix ties docIDs order by the rest of the chain, not doc asc) —
    results must still equal the unsorted twin's doc-asc-tie ordering."""
    rows, r_sorted, r_plain = chain_pair
    a = (
        Searcher(spark, r_sorted)
        .search_sorted_multi(["ion"], 15, [("bucket", True)])
        .toPandas()
    )
    b = (
        Searcher(spark, r_plain)
        .search_sorted_multi(["ion"], 15, [("bucket", True)])
        .toPandas()
    )
    assert a["bucket"].tolist() == b["bucket"].tolist()
    # single-field search_sorted on the chain-pinned index likewise
    # refuses the early path yet stays correct
    c = Searcher(spark, r_sorted).search_sorted(["ion"], 15, "bucket", ascending=True).toPandas()
    assert c["bucket"].tolist() == a["bucket"].tolist()


def test_chain_early_decodes_fewer_blocks(spark, chain_pair):
    """The early kernel engages for the full chain: counter proof via
    the same per-shard harness as the single-field test."""
    _, r_sorted, _ = chain_pair
    s = Searcher(spark, r_sorted)
    seg_ranges = sorted((m.doc_min, m.doc_max) for m in s.manifest.segments)
    post = pd.read_parquet(s.manifest.segment_paths(r_sorted, "postings")[0])
    post = post[post["field"] == "text"]
    k = 5
    dec_total, blk_total = 0, 0
    for _, shard_pdf in post[post["term"].isin(["ion", "flux"])].groupby("shard"):
        groups = {t: g for t, g in shard_pdf.groupby("term", sort=False)}
        stats: dict = {}
        got = _sorted_match_early(groups, "or", ["ion", "flux"], None, k, seg_ranges, stats)
        want = np.sort(_match_shard(groups, "or", ["ion", "flux"], None))[:k]
        assert got.tolist() == want.tolist()
        dec_total += stats.get("blocks_decoded", 0)
        blk_total += stats.get("blocks_total", 0)
    assert dec_total < blk_total / 2, (dec_total, blk_total)


def test_chain_append_pin_and_legacy_flat_pin(spark, chain_pair, tmp_path):
    """Append must redeclare the exact chain; a legacy flat manifest
    pin ([field, asc]) still round-trips through the normalizer."""
    from fdblucene_spark.operators.build import normalize_index_sort

    rows, r_sorted, _ = chain_pair
    df2 = spark.createDataFrame(
        [{"k": 10_000, "text": "ion flux", "bucket": 1, "w": 3}]
    )
    with pytest.raises(ValueError, match="index_sort pinned"):
        build_index(
            spark, df2, r_sorted, key_cols=["k"], n_shards=4, block_size=8,
            stored_fields={"bucket": "bucket", "w": "w"}, append=True,
            index_sort=[("bucket", True)],
        )
    assert normalize_index_sort(["w", True]) == [["w", True]]
    assert normalize_index_sort(("w", False)) == [["w", False]]
    assert normalize_index_sort([("a", True), ("b", False)]) == [["a", True], ["b", False]]
    assert normalize_index_sort(None) is None


def test_sorted_search_after_pages(spark, sorted_pair):
    """Sorted searchAfter: cursor pages concatenate to the full
    (w asc/desc, doc asc) ranking with no overlap, on BOTH the sorted
    index (early path disabled under after) and the plain one; the
    null-valued cursor is refused."""
    _, r_sorted, r_plain = sorted_pair
    for root in (r_sorted, r_plain):
        s = Searcher(spark, root)
        for asc in (True, False):
            full = s.search_sorted(["ion"], k=60, sort_field="w",
                                   ascending=asc).collect()
            assert len(full) == 60
            cur = (full[19]["w"], int(full[19]["doc"]))
            page2 = s.search_sorted(["ion"], k=40, sort_field="w",
                                    ascending=asc, after=cur).collect()
            assert [(r["doc"], r["w"]) for r in page2] == [
                (r["doc"], r["w"]) for r in full[20:60]]
        with pytest.raises(ValueError, match="non-null"):
            s.search_sorted(["ion"], k=5, sort_field="w",
                            after=(None, 3))
