"""Lucene XML query parser (queryparser/xml CoreParser).

Parser laws pin the compile from XML elements to search_boolean
clause dicts; engine laws pin search_xml to the surfaces it dispatches
onto — every dispatch must be (doc, score)-identical to the
directly-constructed query, since the parser is a pure front-end
(Lucene's CoreParser builds the same Query objects a user would
construct by hand)."""

import numpy as np
import pytest

from fdblucene_spark.functions.queryparser import QueryParseError
from fdblucene_spark.functions.xmlparser import (
    XmlParseError,
    parse_xml_query,
)
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu",
]


def _zipf(n):
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


@pytest.fixture(scope="module")
def xml_index(spark, tmp_path_factory):
    rng = np.random.default_rng(23)
    rows = []
    for i in range(260):
        ln = int(rng.integers(3, 30))
        text = " ".join(rng.choice(WORDS, size=ln, p=_zipf(len(WORDS))))
        rows.append({
            "doc_id": i, "text": text,
            "role": ["user", "assistant", "tool"][i % 3],
            "n_chars": len(text),
        })
    root = str(tmp_path_factory.mktemp("xmlq") / "idx")
    build_index(
        spark, spark.createDataFrame(rows), root, doc_col="doc_id",
        n_shards=4, text_fields={"text": "text"},
        keyword_fields={"role": "role"},
        stored_fields={"n_chars": "n_chars"},
    )
    return rows, Searcher(spark, root)


def _hits(df):
    return [(r["doc"], float(np.float32(r["score"]))) for r in df.collect()]


# ------------------------------------------------------------- parser laws

def test_term_query_verbatim():
    q = parse_xml_query('<TermQuery fieldName="text">Alpha</TermQuery>')
    # TermQueryBuilder does NOT analyze: text is the index-form term
    assert q.clauses == [{"field": "text", "term": "Alpha", "occur": "should"}]
    assert q.numeric == [] and q.span is None and q.const is None


def test_terms_query_analyzes():
    q = parse_xml_query("<TermsQuery>Alpha, beta!</TermsQuery>")
    assert q.clauses == [{
        "clauses": [
            {"field": "text", "term": "alpha", "occur": "should"},
            {"field": "text", "term": "beta", "occur": "should"},
        ],
        "occur": "should",
    }]
    single = parse_xml_query("<TermsQuery>Alpha</TermsQuery>")
    assert single.clauses == [
        {"field": "text", "term": "alpha", "occur": "should"}]


def test_boolean_occurs_and_msm():
    q = parse_xml_query("""
      <BooleanQuery minimumNumberShouldMatch="2">
        <Clause occurs="must"><TermQuery>alpha</TermQuery></Clause>
        <Clause occurs="mustNot"><TermQuery>beta</TermQuery></Clause>
        <Clause><TermQuery>gamma</TermQuery></Clause>
        <Clause occurs="filter">
          <TermQuery fieldName="role">user</TermQuery>
        </Clause>
      </BooleanQuery>""")
    # root msm rides on a wrapper node so the evaluator sees it
    assert len(q.clauses) == 1
    node = q.clauses[0]
    assert node["min_should_match"] == 2 and node["occur"] == "must"
    occs = [c["occur"] for c in node["clauses"]]
    assert occs == ["must", "must_not", "should", "filter"]


def test_nested_boolean_and_boost_fold():
    q = parse_xml_query("""
      <BooleanQuery>
        <Clause occurs="must">
          <BooleanQuery boost="2.0">
            <Clause><TermQuery boost="3.0">alpha</TermQuery></Clause>
          </BooleanQuery>
        </Clause>
      </BooleanQuery>""")
    sub = q.clauses[0]
    assert sub["boost"] == 2.0 and sub["occur"] == "must"
    assert sub["clauses"][0]["boost"] == 3.0


def test_dismax_compiles_to_tie_node():
    q = parse_xml_query("""
      <DisjunctionMaxQuery tieBreaker="0.4">
        <TermQuery>alpha</TermQuery>
        <TermQuery>beta</TermQuery>
      </DisjunctionMaxQuery>""")
    assert q.clauses == [{
        "clauses": [
            {"field": "text", "term": "alpha", "occur": "should"},
            {"field": "text", "term": "beta", "occur": "should"},
        ],
        "dismax_tie": 0.4,
        "occur": "should",
    }]


def test_range_query_marker():
    q = parse_xml_query(
        '<RangeQuery fieldName="role" lowerTerm="a" upperTerm="m" '
        'includeUpper="false"/>')
    assert q.clauses == [{
        "field": "role",
        "multiterm": {"kind": "term_range", "lo": "a", "hi": "m",
                      "lo_inc": True, "hi_inc": False},
        "occur": "should",
    }]


def test_point_range_lifts_to_numeric():
    q = parse_xml_query("""
      <BooleanQuery>
        <Clause occurs="must"><TermQuery>alpha</TermQuery></Clause>
        <Clause occurs="filter">
          <PointRangeQuery fieldName="n_chars" lowerTerm="50" upperTerm="160"/>
        </Clause>
      </BooleanQuery>""", numeric_fields={"n_chars"})
    assert q.numeric == [{"field": "n_chars", "lo": 50.0, "hi": 160.0}]
    assert q.clauses == [{"field": "text", "term": "alpha", "occur": "must"}]


def test_user_query_delegates_to_classic():
    q = parse_xml_query("<UserQuery>alpha +beta -gamma</UserQuery>")
    assert {c["term"]: c["occur"] for c in q.clauses[0]["clauses"]} == {
        "alpha": "should", "beta": "must", "gamma": "must_not"}


def test_match_all_and_constant_score():
    assert parse_xml_query("<MatchAllDocsQuery/>").match_all
    q = parse_xml_query("""
      <ConstantScoreQuery boost="2.5">
        <TermQuery>alpha</TermQuery>
      </ConstantScoreQuery>""")
    assert q.const == 2.5
    assert q.clauses == [{"field": "text", "term": "alpha", "occur": "should"}]


def test_span_compile():
    q = parse_xml_query("""
      <SpanNear slop="1" inOrder="true">
        <SpanTerm>alpha</SpanTerm>
        <SpanOr><SpanTerm>beta</SpanTerm><SpanTerm>gamma</SpanTerm></SpanOr>
      </SpanNear>""")
    assert q.span == {"kind": "near", "clauses": ["alpha", ["beta", "gamma"]],
                      "slop": 1, "in_order": True, "field": "text"}
    q = parse_xml_query(
        '<SpanFirst end="3"><SpanTerm>alpha</SpanTerm></SpanFirst>')
    assert q.span == {"kind": "first", "term": "alpha", "end": 3,
                      "field": "text"}
    q = parse_xml_query("""
      <SpanNot>
        <Include><SpanTerm>alpha</SpanTerm></Include>
        <Exclude><SpanTerm>beta</SpanTerm></Exclude>
      </SpanNot>""")
    assert q.span == {"kind": "not", "include": "alpha", "exclude": "beta",
                      "field": "text"}
    # root SpanTerm / SpanOrTerms carry no positional constraint ->
    # ordinary term / OR queries
    assert parse_xml_query("<SpanTerm>alpha</SpanTerm>").clauses == [
        {"field": "text", "term": "alpha", "occur": "should"}]
    assert parse_xml_query("<SpanOrTerms>Alpha beta</SpanOrTerms>").clauses == [
        {"field": "text", "term": "alpha", "occur": "should"},
        {"field": "text", "term": "beta", "occur": "should"}]


def test_extension_elements_compile():
    q = parse_xml_query(
        '<LikeThisQuery maxQueryTerms="10" minTermFreq="1" minDocFreq="2">'
        "sample text here</LikeThisQuery>")
    assert q.special == {"kind": "mlt", "field": "text",
                         "text": "sample text here", "max_query_terms": 10,
                         "min_term_freq": 1, "min_doc_freq": 2}
    q = parse_xml_query("""
      <FuzzyLikeThisQuery maxNumTerms="3" maxEdits="1" prefixLength="1">
        <Field fieldName="text">alpha beta</Field>
      </FuzzyLikeThisQuery>""")
    assert q.special == {"kind": "flt", "field": "text",
                         "text": "alpha beta", "max_num_terms": 3,
                         "max_edits": 1, "prefix_length": 1}
    q = parse_xml_query(
        '<BoostingTermQuery fieldName="body">alpha</BoostingTermQuery>')
    assert q.special == {"kind": "payload_term", "field": "body",
                         "term": "alpha"}


def test_parse_errors():
    bad = [
        "<Bogus>x</Bogus>",
        "<BooleanQuery><TermQuery>a</TermQuery></BooleanQuery>",
        '<BooleanQuery><Clause occurs="perhaps"><TermQuery>a</TermQuery>'
        "</Clause></BooleanQuery>",
        "<BooleanQuery><Clause><TermQuery>a</TermQuery>"
        "<TermQuery>b</TermQuery></Clause></BooleanQuery>",
        "<TermQuery></TermQuery>",
        "not xml at all <",
        '<!DOCTYPE foo [<!ENTITY x "y">]><TermQuery>&x;</TermQuery>',
        # nested whole-query-only elements
        "<BooleanQuery><Clause><MatchAllDocsQuery/></Clause></BooleanQuery>",
        "<BooleanQuery><Clause><ConstantScoreQuery><TermQuery>a</TermQuery>"
        "</ConstantScoreQuery></Clause></BooleanQuery>",
        '<BooleanQuery><Clause><SpanNear slop="0"><SpanTerm>a</SpanTerm>'
        "<SpanTerm>b</SpanTerm></SpanNear></Clause></BooleanQuery>",
        # should-occur numeric range: rejected, not coerced
        '<BooleanQuery><Clause><PointRangeQuery fieldName="n_chars" '
        'lowerTerm="1" upperTerm="9"/></Clause></BooleanQuery>',
        # numeric range with no text clause
        '<BooleanQuery><Clause occurs="must"><PointRangeQuery '
        'fieldName="n_chars" lowerTerm="1" upperTerm="9"/></Clause>'
        "</BooleanQuery>",
        # span clauses on different fields
        '<SpanNear slop="0"><SpanTerm fieldName="a">x</SpanTerm>'
        '<SpanTerm fieldName="b">y</SpanTerm></SpanNear>',
        '<SpanNear slop="0"><SpanTerm>x</SpanTerm></SpanNear>',
        '<ConstantScoreQuery><MatchAllDocsQuery/></ConstantScoreQuery>',
        # extension elements are whole-query only
        "<BooleanQuery><Clause><LikeThisQuery>x y</LikeThisQuery>"
        "</Clause></BooleanQuery>",
        "<ConstantScoreQuery><BoostingTermQuery>a</BoostingTermQuery>"
        "</ConstantScoreQuery>",
        # FLT needs exactly one Field child
        '<FuzzyLikeThisQuery>text</FuzzyLikeThisQuery>',
    ]
    for x in bad:
        with pytest.raises(QueryParseError):
            parse_xml_query(x, numeric_fields={"n_chars"})
    # XmlParseError is a QueryParseError subclass (one except branch
    # covers every parser family)
    assert issubclass(XmlParseError, QueryParseError)


# ------------------------------------------------------------- engine laws

def test_xml_boolean_matches_direct(spark, xml_index):
    _, s = xml_index
    got = _hits(s.search_xml("""
      <BooleanQuery>
        <Clause occurs="must"><TermsQuery>alpha beta</TermsQuery></Clause>
        <Clause occurs="mustNot"><TermQuery>kappa</TermQuery></Clause>
        <Clause occurs="should"><TermQuery boost="2.0">gamma</TermQuery></Clause>
        <Clause occurs="filter">
          <TermQuery fieldName="role">user</TermQuery>
        </Clause>
      </BooleanQuery>""", k=50))
    exp = _hits(s.search_boolean([
        {"clauses": [{"field": "text", "term": "alpha", "occur": "should"},
                     {"field": "text", "term": "beta", "occur": "should"}],
         "occur": "must"},
        {"field": "text", "term": "kappa", "occur": "must_not"},
        {"field": "text", "term": "gamma", "occur": "should", "boost": 2.0},
        {"field": "role", "term": "user", "occur": "filter"},
    ], k=50))
    assert got == exp and len(got) > 0


def test_xml_dismax_and_numeric(spark, xml_index):
    _, s = xml_index
    got = _hits(s.search_xml("""
      <BooleanQuery>
        <Clause occurs="must"><TermQuery>alpha</TermQuery></Clause>
        <Clause occurs="should">
          <DisjunctionMaxQuery tieBreaker="0.3">
            <TermQuery>beta</TermQuery>
            <TermQuery>gamma</TermQuery>
          </DisjunctionMaxQuery>
        </Clause>
        <Clause occurs="filter">
          <PointRangeQuery fieldName="n_chars" lowerTerm="40" upperTerm="120"/>
        </Clause>
      </BooleanQuery>""", k=40, numeric_fields=("n_chars",)))
    exp = _hits(s.search_boolean([
        {"field": "text", "term": "alpha", "occur": "must"},
        {"clauses": [{"field": "text", "term": "beta", "occur": "should"},
                     {"field": "text", "term": "gamma", "occur": "should"}],
         "dismax_tie": 0.3, "occur": "should"},
    ], k=40, numeric=[{"field": "n_chars", "lo": 40, "hi": 120}]))
    assert got == exp and len(got) > 0


def test_xml_user_query_matches_search_parsed(spark, xml_index):
    _, s = xml_index
    qs = "alpha +bet* -kappa"
    got = _hits(s.search_xml(f"<UserQuery>{qs}</UserQuery>", k=30))
    exp = _hits(s.search_parsed(qs, k=30))
    assert got == exp and len(got) > 0


def test_xml_range_query_expands(spark, xml_index):
    _, s = xml_index
    got = _hits(s.search_xml(
        '<RangeQuery fieldName="text" lowerTerm="delta" upperTerm="eta"/>',
        k=60))
    exp = _hits(s.search_parsed("text:[delta TO eta]", k=60))
    assert got == exp and len(got) > 0


def test_xml_span_dispatch(spark, xml_index):
    _, s = xml_index
    got = _hits(s.search_xml("""
      <SpanNear slop="1" inOrder="true">
        <SpanTerm>alpha</SpanTerm>
        <SpanOrTerms>beta gamma</SpanOrTerms>
      </SpanNear>""", k=30))
    exp = _hits(s.search_span_near(
        ["alpha", ["beta", "gamma"]], k=30, slop=1, in_order=True))
    assert got == exp and len(got) > 0

    got = _hits(s.search_xml("""
      <SpanNear slop="2" inOrder="false">
        <SpanTerm>alpha</SpanTerm>
        <SpanTerm>beta</SpanTerm>
      </SpanNear>""", k=30))
    exp = _hits(s.search_span_near(["alpha", "beta"], k=30, slop=2,
                                   in_order=False))
    assert got == exp and len(got) > 0

    got = _hits(s.search_xml(
        '<SpanFirst end="2"><SpanTerm>alpha</SpanTerm></SpanFirst>', k=30))
    exp = _hits(s.search_span_first("alpha", k=30, end=2))
    assert got == exp and len(got) > 0

    got = _hits(s.search_xml("""
      <SpanNot>
        <Include><SpanTerm>alpha</SpanTerm></Include>
        <Exclude><SpanTerm>beta</SpanTerm></Exclude>
      </SpanNot>""", k=30))
    exp = _hits(s.search_span_not("alpha", "beta", k=30))
    assert got == exp and len(got) > 0


def test_xml_constant_score_and_match_all(spark, xml_index):
    rows, s = xml_index
    got = _hits(s.search_xml("""
      <ConstantScoreQuery boost="2.5">
        <BooleanQuery>
          <Clause occurs="must"><TermQuery>alpha</TermQuery></Clause>
          <Clause occurs="mustNot"><TermQuery>beta</TermQuery></Clause>
        </BooleanQuery>
      </ConstantScoreQuery>""", k=40))
    exp = _hits(s.search_constant_score([
        {"clauses": [
            {"field": "text", "term": "alpha", "occur": "must"},
            {"field": "text", "term": "beta", "occur": "must_not"},
        ], "occur": "must"},
    ], k=40, boost=2.5))
    assert got == exp and len(got) > 0 and all(sc == 2.5 for _, sc in got)

    got = _hits(s.search_xml("<MatchAllDocsQuery/>", k=500))
    exp = _hits(s.search_all(k=500))
    assert got == exp and len(got) == len(rows)


def test_xml_like_this_matches_mlt(spark, xml_index):
    rows, s = xml_index
    sample = rows[0]["text"]
    got = _hits(s.search_xml(
        f'<LikeThisQuery maxQueryTerms="5" minTermFreq="1" minDocFreq="2">'
        f"{sample}</LikeThisQuery>", k=25))
    exp = _hits(s.more_like_this(sample, k=25, max_query_terms=5,
                                 min_term_freq=1, min_doc_freq=2))
    assert got == exp and len(got) > 0


def test_xml_fuzzy_like_this_selection_law(spark, xml_index):
    rows, s = xml_index
    # hand oracle for the FLT selection: per-token Damerau<=1
    # variants drawn from the actual vocabulary, ranked rarest-first
    # (df asc, term asc), cut to max_num_terms
    from collections import Counter

    df = Counter()
    for r in rows:
        df.update(set(r["text"].split()))

    def dmr(a, b):
        # unrestricted Damerau-Levenshtein, tiny inputs
        INF = len(a) + len(b)
        da = {}
        d = {(-1, -1): INF}
        for i in range(len(a) + 1):
            d[(i, -1)], d[(i, 0)] = INF, i
        for j in range(len(b) + 1):
            d[(-1, j)], d[(0, j)] = INF, j
        for i in range(1, len(a) + 1):
            db = 0
            for j in range(1, len(b) + 1):
                k, l = da.get(b[j - 1], 0), db
                cost = 0 if a[i - 1] == b[j - 1] else 1
                if cost == 0:
                    db = j
                d[(i, j)] = min(
                    d[(i - 1, j - 1)] + cost, d[(i, j - 1)] + 1,
                    d[(i - 1, j)] + 1,
                    d[(k - 1, l - 1)] + (i - k - 1) + 1 + (j - l - 1))
            da[a[i - 1]] = i
        return d[(len(a), len(b))]

    variants = {t for t in df for q in ("beta", "mu") if dmr(t, q) <= 1}
    ranked = sorted(variants, key=lambda t: (df[t], t))
    expected_terms = ranked[:3]
    got = _hits(s.search_xml("""
      <FuzzyLikeThisQuery maxNumTerms="3" maxEdits="1">
        <Field fieldName="text">beta mu</Field>
      </FuzzyLikeThisQuery>""", k=30))
    exp = _hits(s.search(expected_terms, k=30, mode="or"))
    assert got == exp and len(got) > 0
    # and the XML front-end equals the direct surface verbatim
    direct = _hits(s.search_fuzzy_like_this(
        "beta mu", k=30, max_num_terms=3, max_edits=1))
    assert got == direct


def test_xml_boosting_term_query(spark, tmp_path_factory):
    rows = [
        {"doc_id": 0, "text": "alpha alpha beta"},
        {"doc_id": 1, "text": "alphabet alpha"},
        {"doc_id": 2, "text": "beta gamma"},
    ]
    root = str(tmp_path_factory.mktemp("xmlpay") / "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id",
                n_shards=2, store_payloads=True)
    s = Searcher(spark, root)
    got = _hits(s.search_xml(
        "<BoostingTermQuery>alpha</BoostingTermQuery>", k=10))
    exp = _hits(s.search_payload_score("alpha", k=10, func="avg"))
    assert got == exp and len(got) > 0


def test_xml_search_after_pages(spark, xml_index):
    _, s = xml_index
    xml = "<TermsQuery>alpha beta</TermsQuery>"
    full = s.search_xml(xml, k=20).collect()
    cursor = (float(full[9]["score"]), int(full[9]["doc"]))
    page2 = s.search_xml(xml, k=10, after=cursor).collect()
    assert [(r["doc"], r["score"]) for r in page2] == [
        (r["doc"], r["score"]) for r in full[10:20]]


def test_span_or_terms_uses_index_analyzer():
    # SpanOrTerms analyzes with the PINNED analyzer: under the v2
    # stop chain 'the' vanishes, leaving one alternative
    q = parse_xml_query(
        "<SpanOrTerms>the alpha</SpanOrTerms>", analyzer="standard_v2")
    assert q.clauses == [{"field": "text", "term": "alpha", "occur": "should"}]
    q = parse_xml_query("""
      <SpanNear slop="0" inOrder="true">
        <SpanTerm>beta</SpanTerm>
        <SpanOrTerms>the alpha gamma</SpanOrTerms>
      </SpanNear>""", analyzer="standard_v2")
    assert q.span["clauses"] == ["beta", ["alpha", "gamma"]]
