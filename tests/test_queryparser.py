"""Classic QueryParser string surface.

Part 1: pure parse tests (no Spark) — the compiler must reproduce
Lucene QueryParserBase.addClause occur semantics (including the
`a AND b OR c` -> [+a +b c] quirk), modifiers, grouping/unwrap,
boosts, phrases + slop, multi-term leaves, ranges, and escapes.

Part 2: end-to-end — search_parsed(query_string) must return exactly
the same rows as the hand-built spec through search_boolean /
search_prefix / search_fuzzy / search_span_near / search_all, since
parse + dispatch is definitionally just a compiler in front of those
gated surfaces.
"""

import numpy as np
import pytest

from fdblucene_spark.functions.queryparser import (
    ParsedQuery,
    QueryParseError,
    parse_query,
)
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

# ----------------------------------------------------------- pure parse


def _cl(q, **kw):
    return parse_query(q, **kw).clauses


def test_default_or_terms():
    assert _cl("alpha beta") == [
        {"field": "text", "term": "alpha", "occur": "should"},
        {"field": "text", "term": "beta", "occur": "should"},
    ]


def test_modifiers():
    assert _cl("+alpha -beta gamma") == [
        {"field": "text", "term": "alpha", "occur": "must"},
        {"field": "text", "term": "beta", "occur": "must_not"},
        {"field": "text", "term": "gamma", "occur": "should"},
    ]
    assert _cl("!beta") == [{"field": "text", "term": "beta", "occur": "must_not"}]
    assert _cl("NOT beta") == [{"field": "text", "term": "beta", "occur": "must_not"}]


def test_and_promotes_both_sides():
    assert _cl("alpha AND beta") == [
        {"field": "text", "term": "alpha", "occur": "must"},
        {"field": "text", "term": "beta", "occur": "must"},
    ]
    assert _cl("alpha && beta") == _cl("alpha AND beta")


def test_lucene_and_or_quirk():
    # QueryParserBase.addClause: AND promotes the PREVIOUS clause; OR
    # does not demote it under the default OR operator -> [+a +b c]
    assert _cl("alpha AND beta OR gamma") == [
        {"field": "text", "term": "alpha", "occur": "must"},
        {"field": "text", "term": "beta", "occur": "must"},
        {"field": "text", "term": "gamma", "occur": "should"},
    ]


def test_or_then_and_promotes_middle():
    # classic grammar: `a OR b AND c` -> AND promotes the PREVIOUS
    # clause (b) and requires c -> [a, +b, +c]
    assert _cl("alpha OR beta AND gamma") == [
        {"field": "text", "term": "alpha", "occur": "should"},
        {"field": "text", "term": "beta", "occur": "must"},
        {"field": "text", "term": "gamma", "occur": "must"},
    ]


def test_and_never_promotes_prohibited():
    # AND's previous-clause promotion skips prohibited clauses
    assert _cl("-alpha AND beta") == [
        {"field": "text", "term": "alpha", "occur": "must_not"},
        {"field": "text", "term": "beta", "occur": "must"},
    ]


def test_and_not():
    assert _cl("alpha AND NOT beta") == [
        {"field": "text", "term": "alpha", "occur": "must"},
        {"field": "text", "term": "beta", "occur": "must_not"},
    ]


def test_default_operator_and():
    assert _cl("alpha beta", default_operator="and") == [
        {"field": "text", "term": "alpha", "occur": "must"},
        {"field": "text", "term": "beta", "occur": "must"},
    ]
    assert _cl("alpha OR beta", default_operator="and") == [
        {"field": "text", "term": "alpha", "occur": "should"},
        {"field": "text", "term": "beta", "occur": "should"},
    ]


def test_fields_and_analysis():
    kw = {"keyword_fields": {"role"}}
    assert _cl("role:Assistant", **kw) == [
        {"field": "role", "term": "Assistant", "occur": "should"}
    ]
    # non-keyword fields run the index analyzer (lowercase)
    assert _cl("title:Alpha") == [
        {"field": "title", "term": "alpha", "occur": "should"}
    ]


def test_field_scoped_group():
    assert _cl("role:(a b)", keyword_fields={"role"}) == [
        {
            "clauses": [
                {"field": "role", "term": "a", "occur": "should"},
                {"field": "role", "term": "b", "occur": "should"},
            ],
            "occur": "should",
        }
    ]


def test_group_and_unwrap():
    assert _cl("alpha AND (beta OR gamma)") == [
        {"field": "text", "term": "alpha", "occur": "must"},
        {
            "clauses": [
                {"field": "text", "term": "beta", "occur": "should"},
                {"field": "text", "term": "gamma", "occur": "should"},
            ],
            "occur": "must",
        },
    ]
    # single-SHOULD group unwraps (Lucene simplification), boost kept
    assert _cl("(alpha)^2 beta") == [
        {"field": "text", "term": "alpha", "boost": 2.0, "occur": "should"},
        {"field": "text", "term": "beta", "occur": "should"},
    ]


def test_boosts():
    assert _cl("alpha^2") == [
        {"field": "text", "term": "alpha", "boost": 2.0, "occur": "should"}
    ]
    assert _cl('"alpha beta"^1.5') == [
        {"field": "text", "phrase": ["alpha", "beta"], "boost": 1.5,
         "occur": "should"}
    ]


def test_phrases():
    assert _cl('"alpha beta"') == [
        {"field": "text", "phrase": ["alpha", "beta"], "occur": "should"}
    ]
    # one-word phrase is just a term
    assert _cl('"alpha"') == [
        {"field": "text", "term": "alpha", "occur": "should"}
    ]
    assert _cl('"alpha beta"~2') == [
        {"field": "text", "phrase": ["alpha", "beta"], "slop": 2,
         "occur": "should"}
    ]


def test_multi_token_term_becomes_should_group():
    assert _cl("foo-bar") == [
        {
            "clauses": [
                {"field": "text", "term": "foo", "occur": "should"},
                {"field": "text", "term": "bar", "occur": "should"},
            ],
            "occur": "should",
        }
    ]


def test_term_analyzing_to_nothing_is_dropped():
    assert _cl("§§ alpha") == [
        {"field": "text", "term": "alpha", "occur": "should"}
    ]


def test_multiterm_leaves():
    assert _cl("alp*") == [
        {"field": "text", "multiterm": {"kind": "prefix", "prefix": "alp"},
         "occur": "should"}
    ]
    assert _cl("al*a") == [
        {"field": "text", "multiterm": {"kind": "wildcard", "pattern": "al*a"},
         "occur": "should"}
    ]
    assert _cl("te?t") == [
        {"field": "text", "multiterm": {"kind": "wildcard", "pattern": "te?t"},
         "occur": "should"}
    ]
    assert _cl("roam~1") == [
        {"field": "text",
         "multiterm": {"kind": "fuzzy", "term": "roam", "max_edits": 1},
         "occur": "should"}
    ]
    assert _cl("roam~") == [
        {"field": "text",
         "multiterm": {"kind": "fuzzy", "term": "roam", "max_edits": 2},
         "occur": "should"}
    ]
    assert _cl("roam~0") == [
        {"field": "text", "term": "roam", "occur": "should"}
    ]
    assert _cl("/al.a/") == [
        {"field": "text", "multiterm": {"kind": "regexp", "pattern": "al.a"},
         "occur": "should"}
    ]
    assert _cl("[Alpha TO Gamma]") == [
        {"field": "text",
         "multiterm": {"kind": "term_range", "lo": "alpha", "hi": "gamma",
                       "lo_inc": True, "hi_inc": True},
         "occur": "should"}
    ]
    assert _cl("{alpha TO *}") == [
        {"field": "text",
         "multiterm": {"kind": "term_range", "lo": "alpha", "hi": None,
                       "lo_inc": False, "hi_inc": False},
         "occur": "should"}
    ]


def test_match_all():
    assert _cl("*:*") == [{"match_all": True, "occur": "should"}]


def test_numeric_range_lifted():
    p = parse_query("alpha +n_chars:[50 TO 160]", numeric_fields={"n_chars"})
    assert p.clauses == [{"field": "text", "term": "alpha", "occur": "should"}]
    assert p.numeric == [{"field": "n_chars", "lo": 50.0, "hi": 160.0}]
    # default_operator='and' makes every clause required — also legal
    p2 = parse_query("alpha n_chars:[50 TO 160]", numeric_fields={"n_chars"},
                     default_operator="and")
    assert p2.numeric == [{"field": "n_chars", "lo": 50.0, "hi": 160.0}]
    # a bare (should-occur) range under OR would be an optional clause
    # in classic Lucene but a mandatory filter here: rejected, the
    # engine never silently changes the string's meaning
    with pytest.raises(QueryParseError, match="required"):
        parse_query("alpha n_chars:[50 TO 160]", numeric_fields={"n_chars"})
    with pytest.raises(QueryParseError):
        parse_query("n_chars:{50 TO 160}", numeric_fields={"n_chars"})
    with pytest.raises(QueryParseError):
        parse_query("-n_chars:[50 TO 160]", numeric_fields={"n_chars"})
    with pytest.raises(QueryParseError):
        parse_query("(alpha n_chars:[50 TO 160])", numeric_fields={"n_chars"})


def test_escapes():
    assert _cl("role:a\\:b", keyword_fields={"role"}) == [
        {"field": "role", "term": "a:b", "occur": "should"}
    ]
    # escaped star is literal -> not a wildcard (keyword field keeps it)
    assert _cl("role:a\\*", keyword_fields={"role"}) == [
        {"field": "role", "term": "a*", "occur": "should"}
    ]


def test_parse_errors():
    for bad in ['"open phrase', "(unbalanced", "unbalanced)", "alpha AND",
                "/open regex", "[a TO", "[a b c]", "alpha^"]:
        with pytest.raises(QueryParseError):
            parse_query(bad)


def test_parsed_query_dataclass():
    p = parse_query("")
    assert isinstance(p, ParsedQuery) and p.clauses == [] and p.numeric == []


def test_multifield_fan_out():
    # MultiFieldQueryParser: unfielded leaves fan out across the
    # default fields as a SHOULD group with per-field boosts
    assert _cl("alpha", default_field=["body", "title"]) == [
        {
            "clauses": [
                {"field": "body", "term": "alpha", "occur": "should"},
                {"field": "title", "term": "alpha", "occur": "should"},
            ],
            "occur": "should",
        }
    ]
    assert _cl("alpha", default_field={"body": 1.0, "title": 2.0}) == [
        {
            "clauses": [
                {"field": "body", "term": "alpha", "occur": "should"},
                {"field": "title", "term": "alpha", "boost": 2.0,
                 "occur": "should"},
            ],
            "occur": "should",
        }
    ]


def test_multifield_explicit_field_wins():
    assert _cl("title:alpha", default_field=["body", "title"]) == [
        {"field": "title", "term": "alpha", "occur": "should"}
    ]


def test_multifield_keyword_mix():
    # analysis is per target field: text fields lowercase, keyword
    # fields keep the raw token
    assert _cl("Alpha", default_field=["body", "uid"],
               keyword_fields={"uid"}) == [
        {
            "clauses": [
                {"field": "body", "term": "alpha", "occur": "should"},
                {"field": "uid", "term": "Alpha", "occur": "should"},
            ],
            "occur": "should",
        }
    ]


def test_multifield_single_entry_is_plain():
    assert _cl("alpha", default_field=["body"]) == [
        {"field": "body", "term": "alpha", "occur": "should"}
    ]


def test_multifield_phrase_and_prefix():
    assert _cl('"alpha beta"', default_field=["body", "title"]) == [
        {
            "clauses": [
                {"field": "body", "phrase": ["alpha", "beta"], "occur": "should"},
                {"field": "title", "phrase": ["alpha", "beta"], "occur": "should"},
            ],
            "occur": "should",
        }
    ]
    assert _cl("alp*", default_field=["body", "title"]) == [
        {
            "clauses": [
                {"field": "body",
                 "multiterm": {"kind": "prefix", "prefix": "alp"},
                 "occur": "should"},
                {"field": "title",
                 "multiterm": {"kind": "prefix", "prefix": "alp"},
                 "occur": "should"},
            ],
            "occur": "should",
        }
    ]


# ----------------------------------------------------------- end-to-end

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi",
]


def _zipf(n):
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


@pytest.fixture(scope="module")
def qp_index(spark, tmp_path_factory):
    rng = np.random.default_rng(17)
    rows = []
    for i in range(200):
        ln = int(rng.integers(3, 40))
        text = " ".join(rng.choice(WORDS, size=ln, p=_zipf(len(WORDS))))
        rows.append({"doc_id": i, "text": text,
                     "role": ["user", "assistant", "tool"][i % 3],
                     "n_chars": len(text)})
    root = str(tmp_path_factory.mktemp("qp") / "idx")
    df = spark.createDataFrame(rows)
    build_index(
        spark, df, root, doc_col="doc_id", n_shards=4,
        text_fields={"text": "text"}, keyword_fields={"role": "role"},
        stored_fields={"n_chars": "n_chars"},
    )
    return Searcher(spark, root)


def _rows(df):
    return [(r["doc"], round(float(r["score"]), 5))
            for r in df.collect()]


def test_parsed_equals_boolean(qp_index):
    s = qp_index
    got = s.search_parsed("alpha AND beta -gamma", 10)
    want = s.search_boolean(
        [{"field": "text", "term": "alpha", "occur": "must"},
         {"field": "text", "term": "beta", "occur": "must"},
         {"field": "text", "term": "gamma", "occur": "must_not"}], 10)
    assert _rows(got) == _rows(want)


def test_parsed_group_boost_keyword(qp_index):
    s = qp_index
    got = s.search_parsed('role:tool AND (alpha OR beta)^2 kappa', 10)
    want = s.search_boolean(
        [{"field": "role", "term": "tool", "occur": "must"},
         {"clauses": [
             {"field": "text", "term": "alpha", "occur": "should"},
             {"field": "text", "term": "beta", "occur": "should"}],
          "boost": 2.0, "occur": "must"},
         {"field": "text", "term": "kappa", "occur": "should"}], 10)
    assert _rows(got) == _rows(want)


def test_parsed_phrase(qp_index):
    s = qp_index
    got = s.search_parsed('"alpha beta"', 10)
    want = s.search_boolean(
        [{"field": "text", "phrase": ["alpha", "beta"], "occur": "should"}], 10)
    assert _rows(got) == _rows(want)


def test_parsed_sloppy_phrase_dispatches_span_near(qp_index):
    s = qp_index
    got = s.search_parsed('"alpha beta"~3', 10)
    want = s.search_span_near(["alpha", "beta"], 10, slop=3, in_order=False)
    assert _rows(got) == _rows(want)


def test_parsed_prefix(qp_index):
    s = qp_index
    got = s.search_parsed("ka*", 10)
    want = s.search_prefix("ka", 10)
    assert _rows(got) == _rows(want)


def test_parsed_fuzzy(qp_index):
    s = qp_index
    got = s.search_parsed("alphaa~1", 10)
    want = s.search_fuzzy("alphaa", 10, max_edits=1, transpositions=True)
    assert _rows(got) == _rows(want)


def test_parsed_numeric(qp_index):
    s = qp_index
    got = s.search_parsed("alpha +n_chars:[50 TO 160]", 10,
                          numeric_fields={"n_chars"})
    want = s.search_boolean(
        [{"field": "text", "term": "alpha", "occur": "should"}], 10,
        numeric=[{"field": "n_chars", "lo": 50.0, "hi": 160.0}])
    assert _rows(got) == _rows(want)


def test_parsed_empty_expansion(qp_index):
    s = qp_index
    assert s.search_parsed("zzzz*", 10).count() == 0
    # a must clause whose expansion is empty kills the whole query
    assert s.search_parsed("alpha AND zzzz*", 10).count() == 0
    # a should clause whose expansion is empty is just dropped
    got = s.search_parsed("alpha zzzz*", 10)
    want = s.search(["alpha"], 10)
    assert _rows(got) == _rows(want)


def test_parsed_match_all(qp_index):
    s = qp_index
    assert _rows(s.search_parsed("*:*", 7)) == _rows(s.search_all(7))


def test_parsed_empty_query(qp_index):
    assert qp_index.search_parsed("", 5).count() == 0


@pytest.fixture(scope="module")
def mf_index(spark, tmp_path_factory):
    rng = np.random.default_rng(31)
    rows = []
    for i in range(120):
        body = " ".join(rng.choice(WORDS, size=int(rng.integers(3, 30)),
                                   p=_zipf(len(WORDS))))
        title = " ".join(rng.choice(WORDS[:8], size=3))
        rows.append({"doc_id": i, "body": body, "title": title})
    root = str(tmp_path_factory.mktemp("qpmf") / "idx")
    build_index(
        spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=2,
        text_fields={"body": "body", "title": "title"},
    )
    return Searcher(spark, root)


def test_parsed_multifield_end_to_end(mf_index):
    s = mf_index
    got = s.search_parsed("alpha beta", 10,
                          default_field={"body": 1.0, "title": 2.0})
    want = s.search_boolean(
        [{"clauses": [
            {"field": "body", "term": "alpha", "occur": "should"},
            {"field": "title", "term": "alpha", "boost": 2.0, "occur": "should"}],
          "occur": "should"},
         {"clauses": [
             {"field": "body", "term": "beta", "occur": "should"},
             {"field": "title", "term": "beta", "boost": 2.0, "occur": "should"}],
          "occur": "should"}], 10)
    assert _rows(got) == _rows(want)


def test_parsed_rejects_nested_markers(qp_index):
    with pytest.raises(QueryParseError):
        qp_index.search_parsed('alpha AND "beta gamma"~2', 5)
    with pytest.raises(QueryParseError):
        qp_index.search_parsed("alpha (*:*)", 5)
