"""PKIndexSplitter analogue (merge.split_index) laws.

Lucene misc's PKIndexSplitter partitions one index into two by a
filter, reading through liveDocs. Ours must:
- partition the LIVE roster exactly (disjoint union, tombstones in
  neither side);
- rebuild per-side stats so each side scores like an index built
  from only its docs (oracle bit-check);
- let pending doc-values overrides decide the side and fold them;
- survive an add_indexes() reassembly (numDocs law).
"""

import os

import pytest
from pyspark.sql import functions as F

from fdblucene_spark import oracle
from fdblucene_spark.data import synth
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.merge import add_indexes, split_index
from fdblucene_spark.operators.query import Searcher
from fdblucene_spark.sources.manifest import IndexCatalog

N = 80  # conversations


@pytest.fixture(scope="module")
def src_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx-split-src"))
    df = synth.transcripts(spark, n_convs=N)
    build_index(
        spark, df, root, key_cols=["conv_id", "turn_idx"], n_shards=4,
        stored_fields={"role": "role", "turn_idx": "turn_idx"},
    )
    return root


@pytest.fixture(scope="module")
def split_roots(spark, src_root, tmp_path_factory):
    base = tmp_path_factory.mktemp("idx-split-out")
    a, b = str(base / "first"), str(base / "second")
    split_index(spark, src_root, a, b, predicate="role = 'user'")
    return a, b


def _roster(spark, root):
    m = IndexCatalog(root).load()
    return {
        int(r["doc"])
        for r in spark.read.parquet(*m.segment_paths(root, "doclen"))
        .select("doc").distinct().collect()
    }


def test_split_partition_law(spark, src_root, split_roots):
    a, b = split_roots
    ra, rb = _roster(spark, a), _roster(spark, b)
    assert ra and rb
    assert not (ra & rb)
    assert (ra | rb) == _roster(spark, src_root)
    # membership follows the predicate
    stored = spark.read.parquet(
        *IndexCatalog(src_root).load().segment_paths(src_root, "stored")
    )
    users = {int(r["doc"]) for r in stored.filter("role = 'user'").collect()}
    assert ra == users


def test_split_sides_score_like_dedicated_indexes(spark, src_root, split_roots):
    """Each side's BM25 must reflect ONLY its own corpus stats
    (df/avgdl recomputed), i.e. match the pure-Python oracle built
    over exactly that side's docs — keeping the ORIGINAL docIDs."""
    pdf = synth.transcripts_pandas(N).sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    ids = list(range(len(pdf)))
    for side, pred in zip(split_roots, (pdf["role"] == "user", pdf["role"] != "user")):
        sub_ids = [i for i in ids if bool(pred.iloc[i])]
        oidx = oracle.build_oracle_index(sub_ids, pdf["text"].iloc[sub_ids].tolist())
        s = Searcher(spark, side)
        for terms, k, mode in [(["term00007"], 25, "or"),
                               (["term00003", "term00015"], 25, "and"),
                               (["term00000", "term00042"], 10, "or")]:
            got = [(int(r["doc"]), float(r["score"])) for r in s.search(terms, k, mode).collect()]
            want = [(d, sc) for d, sc in oracle.search(oidx, terms, k, mode)]
            assert got == want, (side, terms, mode)


def test_split_drops_tombstones_from_both_sides(spark, src_root, tmp_path_factory):
    from fdblucene_spark.operators.deletes import delete_docs

    base = tmp_path_factory.mktemp("idx-split-del")
    work = str(base / "work")
    add_indexes(spark, work, [src_root])  # private copy to tombstone
    roster = sorted(_roster(spark, work))
    victims = roster[:5]
    delete_docs(spark, work, list(victims))
    a, b = str(base / "a"), str(base / "b")
    ma, mb = split_index(spark, work, a, b, predicate="role = 'user'")
    ra, rb = _roster(spark, a), _roster(spark, b)
    for v in victims:
        assert v not in ra and v not in rb
    assert (ra | rb) == set(roster) - set(victims)
    for m in (ma, mb):
        assert "deletes_path" not in m.properties


def test_split_dv_override_decides_side_and_folds(spark, src_root, tmp_path_factory):
    from fdblucene_spark.operators.deletes import update_doc_values

    base = tmp_path_factory.mktemp("idx-split-dv")
    work = str(base / "work")
    add_indexes(spark, work, [src_root])
    victim = min(_roster(spark, work))
    update_doc_values(
        spark, work,
        spark.createDataFrame([(victim, 10_000)], "doc long, turn_idx long"),
    )
    a, b = str(base / "a"), str(base / "b")
    ma, mb = split_index(spark, work, a, b, predicate="turn_idx >= 10000")
    assert _roster(spark, a) == {victim}
    assert victim not in _roster(spark, b)
    for m, root in ((ma, a), (mb, b)):
        assert "dv_path" not in m.properties
    # the override VALUE was folded into the rewritten stored table
    got = (
        spark.read.parquet(*ma.segment_paths(a, "stored"))
        .filter(F.col("doc") == victim).select("turn_idx").first()[0]
    )
    assert int(got) == 10_000


def test_split_addindexes_roundtrip_numdocs(spark, split_roots, src_root, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("idx-split-rt") / "re")
    add_indexes(spark, dest, list(split_roots))
    assert len(_roster(spark, dest)) == len(_roster(spark, src_root))


def test_split_guards(spark, src_root, split_roots, tmp_path_factory):
    t = tmp_path_factory.mktemp("idx-split-g")
    with pytest.raises(ValueError, match="exactly one"):
        split_index(spark, src_root, str(t / "x"), str(t / "y"))
    with pytest.raises(ValueError, match="exactly one"):
        split_index(spark, src_root, str(t / "x"), str(t / "y"),
                    predicate="role = 'user'", docs=[1])
    with pytest.raises(ValueError, match="already exists"):
        split_index(spark, src_root, split_roots[0], str(t / "y"),
                    predicate="role = 'user'")


def test_split_by_explicit_docs(spark, src_root, tmp_path_factory):
    t = tmp_path_factory.mktemp("idx-split-docs")
    roster = sorted(_roster(spark, src_root))
    picked = roster[::7]
    a, b = str(t / "a"), str(t / "b")
    split_index(spark, src_root, a, b, docs=picked)
    assert _roster(spark, a) == set(picked)
    assert _roster(spark, b) == set(roster) - set(picked)
