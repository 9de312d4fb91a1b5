"""Surround query parser (queryparser/surround module).

The parser's unit laws live inline below; the engine laws pin
search_surround to the surfaces it compiles onto — every dispatch must
be (doc, score)-identical to the directly-constructed query, since the
parser is a pure front-end (the Lucene module builds the same
SpanQuery/BooleanQuery objects a user would construct by hand).
"""

import numpy as np
import pytest

from fdblucene_spark.functions.queryparser import QueryParseError
from fdblucene_spark.functions.surround import compile_boolean, parse_surround
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

WORDS = ["alpha", "beta", "gamma", "delta", "prefab", "prefix", "tent", "test"]


@pytest.fixture(scope="module")
def sr_index(spark, tmp_path_factory):
    rng = np.random.default_rng(41)
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(WORDS, size=int(rng.integers(3, 14))))}
        for i in range(250)
    ]
    root = str(tmp_path_factory.mktemp("surround") / "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=4)
    return Searcher(spark, root)


def _hits(df):
    return [(r["doc"], r["score"]) for r in df.collect()]


# ------------------------------------------------------------- parser laws
def test_precedence_or_loosest():
    assert parse_surround("a OR b AND c") == {
        "or": [{"term": "a"}, {"and": [{"term": "b"}, {"term": "c"}]}]}
    # NOT binds tighter than AND, distance ops tighter than NOT
    assert parse_surround("a NOT b 2w c") == {
        "not": [{"term": "a"},
                {"dist": {"n": 2, "ordered": True,
                          "subs": [{"term": "b"}, {"term": "c"}]}}]}


def test_prefix_and_infix_forms_agree():
    assert parse_surround("3w(a, b)") == parse_surround("a 3w b")
    assert parse_surround("AND(a, b)") == parse_surround("a AND b")
    assert parse_surround("N(a, b)") == parse_surround("a n b")  # default 1


def test_parser_errors():
    for bad in ["a 2w b 3w c", "w(a)", "AND", "a )", "(a", "***",
                "not(a, b)", "", "a,b"]:
        with pytest.raises(QueryParseError):
            parse_surround(bad)


def test_distance_nested_in_boolean_only_adjacent():
    assert compile_boolean(parse_surround("a AND w(b, c)"), "text")[1] == {
        "field": "text", "occur": "must", "phrase": ["b", "c"]}
    with pytest.raises(QueryParseError, match="whole query"):
        compile_boolean(parse_surround("a AND 3w(b, c)"), "text")


# ------------------------------------------------------------- engine laws
def test_whole_query_w_is_span_near(sr_index):
    got = _hits(sr_index.search_surround("3w(alpha, beta)", k=300))
    want = _hits(sr_index.search_span_near(["alpha", "beta"], k=300,
                                           slop=2, in_order=True))
    assert got == want and got


def test_whole_query_n_is_unordered(sr_index):
    got = _hits(sr_index.search_surround("alpha 4n beta", k=300))
    want = _hits(sr_index.search_span_near(["alpha", "beta"], k=300,
                                           slop=3, in_order=False))
    assert got == want and got


def test_or_inside_distance_is_span_or(sr_index):
    got = _hits(sr_index.search_surround("2w(alpha, or(beta, gamma))", k=300))
    want = _hits(sr_index.search_span_near(["alpha", ["beta", "gamma"]], k=300,
                                           slop=1, in_order=True))
    assert got == want and got


def test_truncation_inside_distance_is_span_multi(sr_index):
    got = _hits(sr_index.search_surround("2w(pre*, alpha)", k=300))
    want = _hits(sr_index.search_span_multi([{"prefix": "pre"}, "alpha"], k=300,
                                            slop=1, in_order=True))
    assert got == want and got


def test_boolean_compilation(sr_index):
    got = _hits(sr_index.search_surround(
        "and(or(alpha, beta), w(gamma, delta))", k=300))
    want = _hits(sr_index.search_boolean([
        {"occur": "must", "clauses": [
            {"field": "text", "term": "alpha", "occur": "should"},
            {"field": "text", "term": "beta", "occur": "should"}]},
        {"field": "text", "occur": "must", "phrase": ["gamma", "delta"]},
    ], k=300))
    assert got == want and got


def test_not_is_must_plus_must_not(sr_index):
    got = _hits(sr_index.search_surround("alpha NOT beta", k=300))
    want = _hits(sr_index.search_boolean([
        {"field": "text", "term": "alpha", "occur": "must"},
        {"field": "text", "term": "beta", "occur": "must_not"},
    ], k=300))
    assert got == want and got


def test_truncation_inside_boolean_expands(sr_index):
    """te?t matches tent/test; the compiled query must equal the
    hand-built nested SHOULD group over the expansion."""
    exp = sorted(sr_index.expand_terms(wildcard="te?t"))
    assert exp == ["tent", "test"]
    got = _hits(sr_index.search_surround("alpha AND te?t", k=300))
    want = _hits(sr_index.search_boolean([
        {"field": "text", "term": "alpha", "occur": "must"},
        {"occur": "must", "clauses": [
            {"field": "text", "term": t, "occur": "should"} for t in exp]},
    ], k=300))
    assert got == want and got


def test_unsupported_shapes_raise(sr_index):
    with pytest.raises(QueryParseError, match="distance operands"):
        sr_index.search_surround("2w(alpha, and(beta, gamma))", k=10)
    with pytest.raises(QueryParseError, match="whole query"):
        sr_index.search_surround("alpha OR 3w(beta, gamma)", k=10)
