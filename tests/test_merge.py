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


def test_tiered_merge_policy(spark, tmp_path_factory):
    """maybe_merge (TieredMergePolicy analogue): N small appends stay
    bounded at max_segments, rank identity is preserved, only the small
    tier is rewritten (the big base segment's files are untouched), and
    it is a no-op below the bound."""
    import os

    from fdblucene_spark.operators.merge import maybe_merge, merge_partial

    root = str(tmp_path_factory.mktemp("idx-tier"))
    base = synth.transcripts(spark, n_convs=40)
    build_index(spark, base, root, key_cols=["conv_id", "turn_idx"], n_shards=4)
    base_seg = IndexCatalog(root).load().segments[0]

    # no-op below the bound
    m0 = maybe_merge(spark, root, max_segments=4)
    assert [s.segment_id for s in m0.segments] == [base_seg.segment_id]

    n_total = 40
    for i in range(6):  # 6 small appends of 2 convs each
        b = _conv_range(spark, n_total, n_total + 2)
        build_index(spark, b, root, key_cols=["conv_id", "turn_idx"],
                    n_shards=4, append=True)
        n_total += 2
        # tier_factor=3: at this toy scale parquet footer overhead
        # flattens size ratios, so the default 10x would pull the big
        # base segment into the small tier
        m = maybe_merge(spark, root, max_segments=4, tier_factor=3.0)
        assert len(m.segments) <= 4, f"after append {i}"
        # the big base segment is never selected into a small-tier merge
        assert base_seg.segment_id in {s.segment_id for s in m.segments}

    # rank identity vs a single-shot build over the union
    pdf = synth.transcripts_pandas(n_total).sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    oidx = oracle.build_oracle_index(list(range(len(pdf))), pdf["text"].tolist())
    s = Searcher(spark, root)
    for terms, mode in [(["term00001", "term00010"], "or"), (["term00000"], "or"),
                        (["term00001", "term00000"], "phrase")]:
        exp = oracle.search(oidx, terms, 50, mode)
        got = [(r["doc"], r["score"]) for r in s.search(list(terms), 50, mode).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], (terms, mode)

    # repack-mode partial merge preserves results too
    man = IndexCatalog(root).load()
    small = [x.segment_id for x in man.segments if x.segment_id != base_seg.segment_id]
    if len(small) >= 2:
        merge_partial(spark, root, small, mode="repack")
        s2 = Searcher(spark, root)
        exp = oracle.search(oidx, ["term00001", "term00010"], 50, "or")
        got = [(r["doc"], r["score"])
               for r in s2.search(["term00001", "term00010"], 50, "or").collect()]
        assert [d for d, _ in got] == [d for d, _ in exp]

    # unknown segment id -> clear error; single id -> no-op
    with pytest.raises(ValueError, match="unknown segment"):
        merge_partial(spark, root, ["nope"])
    man2 = IndexCatalog(root).load()
    assert merge_partial(spark, root, [man2.segments[0].segment_id]).version == man2.version


def test_reshard_rank_identity(spark, tmp_path_factory):
    """reshard(n_shards): build at 4 shards, reshard to 16 (and down to
    2) — identical hits AND scores on or/and/phrase/boolean paths,
    pending deletes still honored, offsets survive, stored-table shard
    column follows the new layout."""
    import numpy as np
    from fdblucene_spark.operators.deletes import delete_docs
    from fdblucene_spark.operators.merge import reshard

    root = str(tmp_path_factory.mktemp("idx-reshard"))
    df = synth.transcripts(spark, n_convs=50)
    build_index(spark, df, root, key_cols=["conv_id", "turn_idx"], n_shards=4,
                store_offsets=True, stored_fields={"ts": "ts"})
    delete_docs(spark, root, list(range(0, 200, 7)))
    s0 = Searcher(spark, root)
    qs = [(["term00001", "term00010"], "or"), (["term00000", "term00002"], "and"),
          (["term00001", "term00000"], "phrase")]
    before = {
        (tuple(t), m): [(r["doc"], r["score"]) for r in s0.search(list(t), 80, m).collect()]
        for t, m in qs
    }
    off_before = sorted(
        (r["doc"], r["pos"], r["start"], r["end"])
        for r in s0.offsets(["term00001"]).collect()
    )

    for new_n in (16, 2):
        m = reshard(spark, root, new_n)
        assert m.n_shards == new_n
        s1 = Searcher(spark, root)
        assert s1.manifest.n_shards == new_n
        for (t, mode), exp in before.items():
            got = [(r["doc"], r["score"]) for r in s1.search(list(t), 80, mode).collect()]
            assert got == exp, (new_n, t, mode)
        # postings shard column really follows doc % new_n
        pdf = spark.read.parquet(*m.segment_paths(root, "postings")).select(
            "shard", "min_doc", "max_doc").toPandas()
        assert (pdf["min_doc"].to_numpy() % new_n == pdf["shard"].to_numpy()).all()
        assert (pdf["max_doc"].to_numpy() % new_n == pdf["shard"].to_numpy()).all()
        # stored table co-location invariant
        st = spark.read.parquet(
            *[p for p in m.segment_paths(root, "stored")]).select("shard", "doc").toPandas()
        assert (st["doc"].to_numpy() % new_n == st["shard"].to_numpy()).all()
        # boolean path with a numeric doc-values range still works
        hits = s1.search_boolean(
            [{"term": "term00001", "occur": "should"}], k=20, min_should_match=1,
        ).collect()
        assert len(hits) > 0
        off_after = sorted(
            (r["doc"], r["pos"], r["start"], r["end"])
            for r in s1.offsets(["term00001"]).collect()
        )
        assert off_after == off_before

    # no-op on same shard count; validation
    v = IndexCatalog(root).load().version
    assert reshard(spark, root, 2).version == v
    with pytest.raises(ValueError, match="n_shards"):
        reshard(spark, root, 0)


def test_add_indexes_multifield_field_stats(spark, tmp_path_factory):
    """addIndexes of multi-field sources must carry EVERY field's stats
    into the merged manifest (regression: the synthetic parent has no
    segments, so deriving the field domain from manifest.fields()
    collapsed to ['text'] and silently dropped keyword-field stats,
    skewing idf/norms on those fields). Also covers a primary field not
    named 'text' — pre-fix that committed a segment with n_docs=0."""
    r1 = str(tmp_path_factory.mktemp("mf-r1"))
    r2 = str(tmp_path_factory.mktemp("mf-r2"))
    dest = str(tmp_path_factory.mktemp("mf-dest"))
    a = synth.transcripts(spark, n_convs=20)
    b = _conv_range(spark, 20, 32)
    kw = dict(key_cols=["conv_id", "turn_idx"], n_shards=4,
              text_fields={"body": "text"}, keyword_fields={"role": "role"})
    build_index(spark, a, r1, **kw)
    build_index(spark, b, r2, **kw)
    m = add_indexes(spark, dest, [r1, r2])
    m1, m2 = IndexCatalog(r1).load(), IndexCatalog(r2).load()
    # primary field is 'body', not 'text' — top-level n_docs must be real
    assert m.properties["primary_field"] == "body"
    assert m.n_docs == m1.n_docs + m2.n_docs > 0
    seg = m.segments[-1]
    assert set(seg.field_stats) == {"body", "role"}
    # field_stats must equal a single-shot build over the union (docs
    # disjoint -> n_docs/sum_dl/n_postings additive; n_terms dedupes,
    # so compare all four against the union segment, not the sum)
    union_root = str(tmp_path_factory.mktemp("mf-union"))
    union = synth.transcripts(spark, n_convs=32)
    build_index(spark, union, union_root, **kw)
    useg = IndexCatalog(union_root).load().segments[-1]
    for fld in ("body", "role"):
        assert seg.field_stats[fld] == useg.field_stats[fld], fld
    # keyword-field BM25 on the merged index matches the single-shot
    # union build (idf depends on the carried role field_stats)
    got = [(r["doc"], round(r["score"], 5))
           for r in Searcher(spark, dest).search(["assistant"], 50, field="role").collect()]
    exp = [(r["doc"], round(r["score"], 5))
           for r in Searcher(spark, union_root).search(["assistant"], 50, field="role").collect()]
    assert got == exp
    # text-field avgdl for the non-'text' primary is field-correct too
    assert abs(m.avgdl_for("body") - (
        (m1.field_stat("body", "sum_dl") + m2.field_stat("body", "sum_dl"))
        / (m1.field_stat("body", "n_docs") + m2.field_stat("body", "n_docs"))
    )) < 1e-9
