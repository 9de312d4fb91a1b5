"""standard_v6 EdgeNGram analyzer (Lucene analysis-common
EdgeNGramTokenFilter(minGram=2, maxGram=5, preserveOriginal=true) —
the SearchAsYouTypeField index chain).

Laws pinned here: the gram rule table; index/search analyzer
asymmetry (query text analyzes with plain v1, like Lucene's
SearchAsYouTypeField whose index analyzer differs from its search
analyzer); Catalyst fast path == Python reference; discountOverlaps
norms (dl counts original tokens); rank identity of prefix term
lookups vs the pure-Python oracle; gram positions = original token
ordinals (phrase adjacency survives); manifest pin refusal.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fdblucene_spark import oracle
from fdblucene_spark.functions.analysis import (
    edge_expand,
    search_analyzer,
    tokenize_expr_ascii,
    tokenize_text,
)
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

WORDS = ["alpha", "alphabet", "alpine", "beta", "betamax", "be",
         "gamma", "gam", "delta", "x"]


def _zipf(n):
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


def _mk_rows(n=220, seed=11):
    rng = np.random.default_rng(seed)
    return [
        {"doc_id": i,
         "text": " ".join(rng.choice(WORDS, size=int(rng.integers(2, 20)),
                                     p=_zipf(len(WORDS))))}
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def edge_index(spark, tmp_path_factory):
    rows = _mk_rows()
    root = str(tmp_path_factory.mktemp("edge") / "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id",
                n_shards=4, analyzer="standard_v6")
    return rows, Searcher(spark, root)


# ------------------------------------------------------------ analyzer laws

def test_edge_expand_rule_table():
    assert edge_expand("x") == ["x"]                      # < minGram
    assert edge_expand("be") == ["be"]                    # == minGram
    assert edge_expand("gam") == ["ga", "gam"]
    assert edge_expand("alpha") == ["al", "alp", "alph", "alpha"]
    # longer than maxGram: grams + preserved original
    assert edge_expand("alphabet") == [
        "al", "alp", "alph", "alpha", "alphabet"]


def test_tokenize_v6_and_search_asymmetry():
    assert tokenize_text("be alpha", "standard_v6") == [
        "be", "al", "alp", "alph", "alpha"]
    # query side: the typed prefix IS the term (no expansion)
    assert search_analyzer("standard_v6") == "standard_v1"
    assert search_analyzer("standard_v1") == "standard_v1"
    assert search_analyzer("standard_v3") == "standard_v3"
    with pytest.raises(ValueError):
        search_analyzer("standard_v99")


def test_catalyst_matches_python(spark):
    texts = [" ".join(WORDS), "x be gam", "", "alphabet betamax x"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["ts"] for r in df.select(
        tokenize_expr_ascii(F.col("text"), "standard_v6").alias("ts")
    ).collect()]
    exp = [tokenize_text(t, "standard_v6") for t in texts]
    assert got == exp


# -------------------------------------------------------------- engine laws

def test_prefix_lookup_rank_identity(spark, edge_index):
    rows, s = edge_index
    oidx = oracle.build_oracle_index(
        [r["doc_id"] for r in rows], [r["text"] for r in rows],
        analyzer="standard_v6")
    for terms, mode in [
        (["alp"], "or"),            # prefix gram: alpha+alphabet+alpine
        (["alpha"], "or"),          # exact word that is also a gram
        (["alphabet"], "or"),       # preserved original beyond maxGram
        (["be"], "or"),             # whole short word == gram of betamax
        (["alp", "bet"], "or"),
        (["alp", "bet"], "and"),
        (["ga", "de"], "or"),
    ]:
        exp = oracle.search(oidx, terms, 50, mode)
        got = [(r["doc"], r["score"])
               for r in s.search(terms, 50, mode=mode).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], (terms, mode)
        for (_, a), (_, b) in zip(got, exp):
            assert float(np.float32(a)) == float(np.float32(b))


def test_dl_counts_original_tokens(spark, edge_index):
    rows, s = edge_index
    dl = spark.read.parquet(*s.manifest.segment_paths(s.root, "doclen"))
    got = {r["doc"]: r["dl"] for r in dl.filter(F.col("field") == "text").collect()}
    for i, r in enumerate(rows):
        assert got[i] == len(r["text"].split()), i


def test_gram_positions_are_token_ordinals(spark, edge_index):
    rows, s = edge_index
    # a doc's phrase adjacency is over ORIGINAL ordinals, so a
    # two-word exact phrase still matches on a v6 index
    target = next(r for r in rows if "alpha beta" in " " + r["text"] + " ")
    hits = s.search(["alpha", "beta"], k=500, mode="phrase").collect()
    assert target["doc_id"] in {r["doc"] for r in hits}
    # and a gram shares its source token's position: phrase
    # ("alp", "beta") matches wherever ("alpha...", "beta") is adjacent
    hits2 = {r["doc"] for r in s.search(["alp", "beta"], k=500, mode="phrase").collect()}
    assert target["doc_id"] in hits2


def test_search_parsed_uses_search_analyzer(spark, edge_index):
    _, s = edge_index
    # "alp" must stay ONE term under the v6 search analyzer — equal to
    # the direct term lookup, NOT an OR over its own grams
    got = [(r["doc"], r["score"]) for r in s.search_parsed("alp", k=30).collect()]
    exp = [(r["doc"], r["score"]) for r in s.search(["alp"], k=30).collect()]
    assert got == exp and len(got) > 0


def test_pin_refuses_cross_analyzer_append(spark, edge_index, tmp_path):
    rows, s = edge_index
    df = spark.createDataFrame(rows[:5])
    with pytest.raises(ValueError, match="analyzer"):
        build_index(spark, df, s.root, doc_col="doc_id", n_shards=4,
                    append=True, analyzer="standard_v1")


def test_edge_composes_with_nothing(spark, tmp_path):
    df_rows = [{"doc_id": 0, "text": "alpha beta"}]
    import pyspark.sql

    spark_df = spark.createDataFrame(df_rows)
    with pytest.raises(ValueError, match="edge"):
        build_index(spark, spark_df, str(tmp_path / "i1"), doc_col="doc_id",
                    n_shards=2, analyzer="standard_v6", store_offsets=True)
