"""SimpleQueryParser: tolerant syntax, left-fold semantics.

Two oracles: (a) hand-built search_boolean clause trees must produce
float-identical hits for the same query string; (b) hypothesis
property — parse_simple NEVER raises for any input string (the
parser's defining contract), and always emits well-formed clause
dicts.
"""

import string

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fdblucene_spark.functions.simpleparser import parse_simple
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi",
]


@pytest.fixture(scope="module")
def sq_index(spark, tmp_path_factory):
    rng = np.random.default_rng(91)
    w = 1.0 / np.arange(1, len(WORDS) + 1)
    p = w / w.sum()
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(WORDS, size=int(rng.integers(4, 30)), p=p))}
        for i in range(300)
    ]
    root = str(tmp_path_factory.mktemp("sq") / "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id",
                n_shards=4, text_fields={"text": "text"})
    return Searcher(spark, root)


def _hits(df):
    return [(int(r["doc"]), np.float32(r["score"])) for r in df.collect()]


# (query string, equivalent search_boolean clause tree)
EQUIV = [
    ("alpha beta",
     [{"field": "text", "term": "alpha", "occur": "should"},
      {"field": "text", "term": "beta", "occur": "should"}]),
    ("alpha + beta",
     [{"field": "text", "term": "alpha", "occur": "must"},
      {"field": "text", "term": "beta", "occur": "must"}]),
    ("alpha -beta",
     [{"field": "text", "term": "alpha", "occur": "should"},
      {"field": "text", "term": "beta", "occur": "must_not"}]),
    # same-op runs stay FLAT (Lucene): one level, not a left-nest
    ("alpha -beta gamma",
     [{"field": "text", "term": "alpha", "occur": "should"},
      {"field": "text", "term": "beta", "occur": "must_not"},
      {"field": "text", "term": "gamma", "occur": "should"}]),
    ("alpha + beta + gamma",
     [{"field": "text", "term": "alpha", "occur": "must"},
      {"field": "text", "term": "beta", "occur": "must"},
      {"field": "text", "term": "gamma", "occur": "must"}]),
    # left fold: (alpha AND beta) OR gamma
    ("alpha + beta | gamma",
     [{"clauses": [{"field": "text", "term": "alpha", "occur": "must"},
                   {"field": "text", "term": "beta", "occur": "must"}],
       "occur": "should"},
      {"field": "text", "term": "gamma", "occur": "should"}]),
    # grouping beats the fold
    ("alpha + (beta | gamma)",
     [{"field": "text", "term": "alpha", "occur": "must"},
      {"clauses": [{"field": "text", "term": "beta", "occur": "should"},
                   {"field": "text", "term": "gamma", "occur": "should"}],
       "occur": "must"}]),
    ('"alpha beta" gamma',
     [{"field": "text", "phrase": ["alpha", "beta"], "occur": "should"},
      {"field": "text", "term": "gamma", "occur": "should"}]),
]


@pytest.mark.parametrize("case", range(len(EQUIV)))
def test_simple_matches_hand_boolean(spark, sq_index, case):
    q, clauses = EQUIV[case]
    got = _hits(sq_index.search_simple(q, k=80))
    want = _hits(sq_index.search_boolean(clauses, k=80))
    assert got == want
    assert len(want) > 0


def test_simple_prefix_and_fuzzy_match_classic(spark, sq_index):
    # leaves that need termdict expansion: the classic parser compiles
    # the same subset, so results must agree exactly
    for q in ("alp*", "gamm~1", "alp* | gamm~1"):
        got = _hits(sq_index.search_simple(q, k=60))
        want = _hits(sq_index.search_parsed(q.replace("+", "AND"), k=60))
        assert got == want and len(got) > 0


def test_simple_sloppy_phrase_dispatch(spark, sq_index):
    got = _hits(sq_index.search_simple('"alpha gamma"~3', k=30))
    want = _hits(sq_index.search_span_near(["alpha", "gamma"], 30, slop=3,
                                           in_order=False))
    assert got == want and len(got) > 0


TOLERANT = [
    '((("alpha', 'alpha + ', '| alpha', 'alpha )', ')', '"', '~', '***',
    'alpha ) beta', '-alpha', '"alpha beta', 'alpha \\+ beta', '+|-',
]


def test_simple_tolerance_never_empty_handed(spark, sq_index):
    # every malformed string parses; the ones holding a real term match
    for q in TOLERANT:
        parsed = parse_simple(q)  # must not raise
        if "alpha" in q and "-alpha" not in q:
            assert sq_index.search_simple(q, k=5).count() > 0
    # lone negation and operator soup match nothing, still no error
    assert sq_index.search_simple("-alpha", k=5).count() == 0
    assert sq_index.search_simple("+|-(", k=5).count() == 0
    # stray ')' must not drop the remainder of the query
    a = _hits(sq_index.search_simple("alpha ) beta", k=50))
    b = _hits(sq_index.search_simple("alpha beta", k=50))
    assert a == b


OCCURS = {"must", "should", "filter", "must_not"}


def _check_clause(c):
    assert isinstance(c, dict)
    assert c.get("occur") in OCCURS
    if "clauses" in c:
        assert c["clauses"]
        for sc in c["clauses"]:
            _check_clause(sc)
        return
    assert isinstance(c.get("field"), str)
    if "phrase" in c:
        assert c["phrase"] and all(isinstance(w, str) and w for w in c["phrase"])
    elif "multiterm" in c:
        assert c["multiterm"]["kind"] in {"prefix", "fuzzy"}
    else:
        assert isinstance(c.get("term"), str) and c["term"]


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase + ' +|-()"~*\\123', max_size=40))
def test_simple_parse_never_raises(q):
    parsed = parse_simple(q)
    for c in parsed.clauses:
        _check_clause(c)
