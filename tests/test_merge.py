"""Merge & lifecycle laws (SURVEY.md section 5.4).

- append builds a second segment; results equal a single-shot build
  over the union (merge(A,B) == build(A|B) rank identity)
- concat and repack merges preserve results exactly
- add_indexes mirrors the reference's writer3.addIndexes(dir1, dir2)
  -> numDocs == 2 test (SimpleFDBDirectoryTest.java:161-187)
"""

import pandas as pd
import pytest

from fdblucene_spark import oracle
from fdblucene_spark.data import synth
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.merge import add_indexes, merge_segments
from fdblucene_spark.operators.query import Searcher
from fdblucene_spark.sources.manifest import IndexCatalog

N_A, N_B = 60, 40  # conv counts for the two halves


def _conv_range(spark, lo, hi):
    df = synth.transcripts(spark, n_convs=hi)
    return df.filter(df.conv_id >= f"conv_{lo:06d}")


@pytest.fixture(scope="module")
def oracle_union():
    pdf = synth.transcripts_pandas(N_A + N_B).sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    return oracle.build_oracle_index(list(range(len(pdf))), pdf["text"].tolist())


@pytest.fixture(scope="module")
def appended(spark, tmp_path_factory):
    """Index built as A then append(B) -> two segments."""
    root = str(tmp_path_factory.mktemp("idx-app"))
    a = synth.transcripts(spark, n_convs=N_A)
    build_index(spark, a, root, key_cols=["conv_id", "turn_idx"], n_shards=4)
    b = _conv_range(spark, N_A, N_A + N_B)
    build_index(spark, b, root, key_cols=["conv_id", "turn_idx"], n_shards=4, append=True)
    return root


QUERIES = [
    (["term00000", "term00042"], 10, "or"),
    (["term00007"], 100, "or"),
    (["term00003", "term00015"], 50, "and"),
    (["needlealpha"], 20, "or"),
]


def _results(spark, root, version=None):
    s = Searcher(spark, root, version=version)
    out = []
    for terms, k, mode in QUERIES:
        out.append(
            [(r["doc"], round(r["score"], 5)) for r in s.search(terms, k, mode).collect()]
        )
    return out


def test_append_creates_second_segment(spark, appended):
    m = IndexCatalog(appended).load()
    assert len(m.segments) == 2
    assert m.segments[1].doc_min == m.segments[0].doc_max + 1  # disjoint docID ranges


def test_appended_equals_oracle_union(spark, appended, oracle_union):
    s = Searcher(spark, appended)
    assert s.n_docs == oracle_union.n_docs
    for terms, k, mode in QUERIES:
        exp = oracle.search(oracle_union, terms, k, mode)
        got = [(r["doc"], r["score"]) for r in s.search(terms, k, mode).collect()]
        assert [d for d, _ in exp] == [d for d, _ in got], terms


@pytest.mark.parametrize("mode", ["concat", "repack"])
def test_merge_preserves_results(spark, appended, mode):
    before = _results(spark, appended)
    m = merge_segments(spark, appended, mode=mode)
    assert len(m.segments) == 1
    after = _results(spark, appended)  # new CURRENT = merged
    assert before == after
    # pre-merge snapshot still queryable (time travel)
    cat = IndexCatalog(appended)
    old = _results(spark, appended, version=m.parent_version)
    assert old == before
    assert cat.load().n_docs == cat.load(m.parent_version).n_docs


def test_repack_consolidates_tail_blocks(spark, appended):
    # after a repack merge, per-(term, shard) block counts are minimal:
    # never more blocks than ceil(n_postings / block_size)
    m = merge_segments(spark, appended, mode="repack")
    postings = spark.read.parquet(*m.segment_paths(appended, "postings"))
    bs = m.block_size
    from pyspark.sql import functions as F

    g = postings.groupBy("term", "shard").agg(
        F.count(F.lit(1)).alias("n_blocks"), F.sum("n").alias("n_post")
    )
    bad = g.filter(F.col("n_blocks") > F.ceil(F.col("n_post") / bs)).count()
    assert bad == 0


def test_add_indexes_two_roots(spark, tmp_path_factory, oracle_union):
    # the reference's addIndexes(dir1, dir2) -> numDocs == 2 law, at corpus scale
    r1 = str(tmp_path_factory.mktemp("idx-r1"))
    r2 = str(tmp_path_factory.mktemp("idx-r2"))
    dest = str(tmp_path_factory.mktemp("idx-dest"))
    a = synth.transcripts(spark, n_convs=N_A)
    b = _conv_range(spark, N_A, N_A + N_B)
    build_index(spark, a, r1, key_cols=["conv_id", "turn_idx"], n_shards=4)
    build_index(spark, b, r2, key_cols=["conv_id", "turn_idx"], n_shards=4)
    m = add_indexes(spark, dest, [r1, r2])
    m1, m2 = IndexCatalog(r1).load(), IndexCatalog(r2).load()
    assert m.n_docs == m1.n_docs + m2.n_docs == oracle_union.n_docs
    # rebased docIDs align with the single-shot union ordering (r2's
    # dense ids keep their relative order, shifted by r1.doc_max+1),
    # so results must be exactly rank-identical to the oracle
    s = Searcher(spark, dest)
    for terms, k, mode in QUERIES:
        exp = oracle.search(oracle_union, terms, k, mode)
        got = [(r["doc"], r["score"]) for r in s.search(terms, k, mode).collect()]
        assert [d for d, _ in exp] == [d for d, _ in got], terms
        assert all(abs(a - b) < 1e-6 for (_, a), (_, b) in zip(exp, got)), terms


def test_build_after_merge_appends(spark, appended):
    # lifecycle: merge then append more data still works
    extra = _conv_range(spark, N_A + N_B, N_A + N_B + 10)
    m = build_index(
        spark, extra, appended, key_cols=["conv_id", "turn_idx"], n_shards=4, append=True
    )
    assert len(m.segments) >= 2
