"""Versioned-analyzer pin exercised with a REAL second analyzer.

standard_v2 = standard_v1 + English stopword removal (the classic
Lucene StopFilter over StopAnalyzer's 33-word stop set). The manifest
pins the analyzer at creation (S2 analogue — the reference pins
pageSize the same way, FDBDirectory.java:416-428): cross-analyzer
appends are refused, and query text analyzes with the INDEX's pinned
version, not the caller's default.

Also covers the doc-roster rows (dl=0 sentinel) that make search_all
a true MatchAllDocsQuery: empty / all-stopword docs still exist.
"""

import numpy as np
import pytest

from fdblucene_spark import oracle
from fdblucene_spark.functions.analysis import (
    ANALYZERS, ENGLISH_STOPWORDS, tokenize_text,
)
from fdblucene_spark.operators import build as build_mod
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.merge import merge_segments
from fdblucene_spark.operators.query import Searcher

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a vector index is not a hash index"),
    (2, "to be or not to be that is the question"),
    (3, "the the and of a an"),            # all-stopword -> dl=0 under v2
    (4, ""),                               # empty -> dl=0 under BOTH
    (5, "quick hash lookup with the vector"),
    (6, "!!! ???"),                        # no word chars -> dl=0 under BOTH
    (7, "brown dog and brown fox"),
]


def _corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def v2_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idxv2"))
    m = build_index(
        spark, _corpus(spark), root, doc_col="doc_id", n_shards=4,
        fingerprint="v2", analyzer="standard_v2",
    )
    return root, m


def test_tokenize_text_v2_drops_stopwords():
    assert tokenize_text("the quick fox", "standard_v2") == ["quick", "fox"]
    assert tokenize_text("the quick fox", "standard_v1") == ["the", "quick", "fox"]
    assert tokenize_text("the and of", "standard_v2") == []
    assert "the" in ENGLISH_STOPWORDS and len(ANALYZERS["standard_v2"]) == 33


def test_v2_postings_have_no_stopwords(spark, v2_index):
    root, m = v2_index
    assert m.analyzer == "standard_v2"
    s = Searcher(spark, root)
    td = spark.read.parquet(*m.segment_paths(root, "termdict")).toPandas()
    assert not (set(td["term"]) & ENGLISH_STOPWORDS)
    # a stopword query term simply matches nothing
    assert s.search(["the"], k=10).count() == 0


def test_v2_stats_match_oracle(v2_index):
    _, m = v2_index
    idx = oracle.build_oracle_index(
        [d for d, _ in DOCS], [t for _, t in DOCS], analyzer="standard_v2"
    )
    # docs 3/4/6 analyze to nothing -> docCount excludes them
    assert idx.n_docs == 5
    assert m.n_docs == idx.n_docs
    assert m.sum_dl == idx.sum_ttf
    assert abs(m.avgdl - idx.avgdl) < 1e-12


def test_v2_rank_identity(spark, v2_index):
    root, _ = v2_index
    s = Searcher(spark, root)
    idx = oracle.build_oracle_index(
        [d for d, _ in DOCS], [t for _, t in DOCS], analyzer="standard_v2"
    )
    for terms, mode in [(["quick", "fox"], "or"), (["brown", "fox"], "and"),
                        (["hash", "vector"], "or"), (["question"], "or")]:
        exp = oracle.search(idx, terms, 10, mode)
        got = [(r["doc"], r["score"]) for r in s.search(terms, 10, mode=mode).collect()]
        assert [d for d, _ in exp] == [d for d, _ in got], (terms, mode, exp, got)
        assert all(abs(a - b) < 1e-6 for (_, a), (_, b) in zip(exp, got))


def test_cross_analyzer_append_refused(spark, v2_index):
    root, _ = v2_index
    with pytest.raises(ValueError, match="config mismatch"):
        build_index(spark, _corpus(spark), root, doc_col="doc_id", n_shards=4,
                    append=True, fingerprint="v1-append")  # default v1


def test_v2_append_allowed_and_analyzed_v2(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idxv2app"))
    build_index(spark, _corpus(spark), root, doc_col="doc_id", n_shards=4,
                fingerprint="b1", analyzer="standard_v2")
    extra = spark.createDataFrame(
        [(100, "the quick dog runs")], "doc_id long, text string")
    m2 = build_index(spark, extra, root, doc_col="doc_id", n_shards=4,
                     append=True, fingerprint="b2", analyzer="standard_v2")
    assert m2.analyzer == "standard_v2"
    td = spark.read.parquet(*m2.segment_paths(root, "termdict")).toPandas()
    assert "the" not in set(td["term"])  # append analyzed with v2 too
    s = Searcher(spark, root)
    assert {int(r["doc"]) for r in s.search(["runs"], 10).collect()} == {100}


def test_search_parsed_uses_pinned_analyzer(spark, v2_index):
    root, _ = v2_index
    s = Searcher(spark, root)
    # 'the' analyzes away under the pinned v2 -> same hits as 'quick'
    got = {int(r["doc"]) for r in s.search_parsed("the quick", 10).collect()}
    want = {int(r["doc"]) for r in s.search(["quick"], 10).collect()}
    assert got == want and got
    # phrase: stop terms vanish, surviving tokens are adjacent
    ph = {int(r["doc"]) for r in
          s.search_parsed('"over the lazy"', 10).collect()}
    assert ph == {0}


def test_more_like_this_uses_pinned_analyzer(spark, v2_index):
    root, _ = v2_index
    s = Searcher(spark, root)
    # under v1 'the' (tf=3, df high) would dominate; under the pinned
    # v2 it vanishes and only 'brown' survives min_term_freq=2
    hits = s.more_like_this("the the the brown brown", k=10,
                            min_term_freq=2, min_doc_freq=1)
    docs = {int(r["doc"]) for r in hits.collect()}
    assert docs == {0, 7}  # the docs containing 'brown'


# ---------------------------------------------------------- doc roster


def test_search_all_sees_token_free_docs(spark, v2_index):
    root, _ = v2_index
    s = Searcher(spark, root)
    got = [int(r["doc"]) for r in s.search_all(k=100).collect()]
    assert got == [d for d, _ in DOCS]  # every added doc, docID asc


def test_roster_rows_dl0_and_absent_from_postings(spark, v2_index):
    root, m = v2_index
    dl = spark.read.parquet(*m.segment_paths(root, "doclen")).toPandas()
    text_dl = dl[dl["field"] == "text"].set_index("doc")["dl"]
    assert sorted(text_dl.index) == [d for d, _ in DOCS]
    assert set(text_dl[text_dl == 0].index) == {3, 4, 6}
    blocks = spark.read.parquet(*m.segment_paths(root, "postings")).toPandas()
    assert build_mod.ROSTER_TERM not in set(blocks["term"])


def test_roster_survives_merge_without_inflating_stats(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idxroster"))
    half = len(DOCS) // 2
    mk = lambda rows, fp: build_index(
        spark, spark.createDataFrame(rows, "doc_id long, text string"),
        root, doc_col="doc_id", n_shards=4, fingerprint=fp,
        append=fp != "a", analyzer="standard_v2",
    )
    mk(DOCS[:half], "a")
    m1 = mk(DOCS[half:], "b")
    m2 = merge_segments(spark, root, mode="concat")
    assert len(m2.segments) == 1
    assert m2.n_docs == m1.n_docs == 5     # dl=0 docs never counted
    assert abs(m2.avgdl - m1.avgdl) < 1e-12
    s = Searcher(spark, root)
    assert [int(r["doc"]) for r in s.search_all(k=100).collect()] == \
        [d for d, _ in DOCS]


# ------------------------------------------------- lineage scale guard


def test_lineage_readback_fallback_matches_unrolled(spark, tmp_path_factory, monkeypatch):
    """Above LINEAGE_UNROLL_MAX_SHARDS the per-shard lineage comes from
    a groupBy read-back instead of unrolled Observation aggregates —
    values must be identical."""
    def shard_lineage(m):
        seg = m.segments[-1]
        return sorted(
            (r["shard"], r["n_blocks"], r["n_postings"], r["payload_bytes"])
            for r in seg.lineage if "shard" in r
        )

    r1 = str(tmp_path_factory.mktemp("lu"))
    m_unrolled = build_index(spark, _corpus(spark), r1, doc_col="doc_id",
                             n_shards=8, fingerprint="l1")
    monkeypatch.setattr(build_mod, "LINEAGE_UNROLL_MAX_SHARDS", 4)
    r2 = str(tmp_path_factory.mktemp("lf"))
    m_fallback = build_index(spark, _corpus(spark), r2, doc_col="doc_id",
                             n_shards=8, fingerprint="l2")
    lu, lf = shard_lineage(m_unrolled), shard_lineage(m_fallback)
    assert lu == lf and lu  # same shards, same counts, same bytes
    assert m_unrolled.n_docs == m_fallback.n_docs


# -------------------------------------------------- standard_v3 (min stem)
def test_min_stem_rules():
    from fdblucene_spark.functions.analysis import min_stem

    cases = {
        # plain plural -s dropped
        "dogs": "dog", "tables": "table", "rows": "row", "vectors": "vector",
        # -ies -> -y (unless -aies/-eies)
        "queries": "query", "ponies": "pony", "pies": "py",
        # -es with consonant before: only the s drops (minimal stemmer)
        "boxes": "boxe", "indexes": "indexe",
        # keeps: -ss, -us, -ies-family vowels, short words
        "glass": "glass", "focus": "focus", "goes": "goes", "sees": "sees",
        "is": "is", "as": "as", "gas": "ga",  # n=3 'gas' -> drop s (a not u/s/e)
        "days": "day",
    }
    for w, want in cases.items():
        assert min_stem(w) == want, (w, min_stem(w), want)


def test_min_stem_expr_matches_python(spark):
    # the Catalyst twin must agree with the Python reference on a
    # broad word list (every rule branch + boundary lengths)
    from fdblucene_spark.functions.analysis import min_stem, min_stem_expr
    import pyspark.sql.functions as F

    words = [
        "s", "ss", "us", "es", "ies", "aies", "eies", "oes", "ees", "aes",
        "dogs", "queries", "ponies", "pies", "boxes", "glass", "focus",
        "goes", "sees", "gas", "days", "xs", "abs", "its", "this", "boss",
        "tables", "a", "", "plus", "miss", "lens", "news",
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["s"] for r in
           df.select("w", min_stem_expr(F.col("w")).alias("s")).collect()}
    for w in words:
        assert got[w] == min_stem(w), (w, got[w], min_stem(w))


def test_v3_index_stems_and_folds_df(spark, tmp_path_factory):
    from fdblucene_spark.functions.analysis import tokenize_text

    rows = [
        (0, "the quick dogs and the lazy dog"),
        (1, "queries hit the query planner"),
        (2, "ponies"),
        (3, "glass focus goes"),            # all no-ops under the stemmer
    ]
    root = str(tmp_path_factory.mktemp("idxv3"))
    build_index(
        spark, spark.createDataFrame(rows, "doc_id long, text string"), root,
        doc_col="doc_id", n_shards=2, fingerprint="v3", analyzer="standard_v3",
    )
    s = Searcher(spark, root)
    # "dogs" and "dog" fold into one term with df=1 ttf=2 in doc 0
    st = s.term_stats(["dog", "query", "pony", "dogs", "queries"])
    assert st["dog"] == (1, 2)
    assert st["query"] == (1, 2)   # queries+query both in doc 1 -> df 1, ttf 2
    assert "dogs" not in st and "queries" not in st
    assert st["pony"] == (1, 1)
    # query text analyzed with the pinned v3 analyzer end-to-end
    hits = {r["doc"] for r in s.search_parsed("ponies", k=10).collect()}
    assert hits == {2}
    # tokenize_text v3 = stop + stem
    assert tokenize_text("the queries and ponies", "standard_v3") == ["query", "pony"]
    # cross-analyzer append refused (pin)
    with pytest.raises(ValueError, match="analyzer"):
        build_index(
            spark, spark.createDataFrame(rows, "doc_id long, text string"), root,
            doc_col="doc_id", n_shards=2, append=True, analyzer="standard_v1",
        )
