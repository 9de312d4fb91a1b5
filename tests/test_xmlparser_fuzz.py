"""Property tests for the XML query compiler.

Same totality contract as the classic parser's fuzz suite: for ANY
input string, parse_xml_query either returns a well-formed XmlQuery
or raises QueryParseError (XmlParseError) — no ParseError /
KeyError / AttributeError / RecursionError leaking from ElementTree
or the element walk. Well-formed means every clause dict type-checks
against the search_boolean contract, span specs carry the shapes the
span kernels accept, and special (MLT/FLT/payload) specs are fully
typed.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from fdblucene_spark.functions.queryparser import QueryParseError
from fdblucene_spark.functions.xmlparser import XmlQuery, parse_xml_query

OCCURS = {"must", "should", "filter", "must_not"}
MT_KINDS = {"prefix", "wildcard", "fuzzy", "regexp", "term_range"}


def _check_clause(c):
    assert isinstance(c, dict)
    assert c.get("occur") in OCCURS
    if "boost" in c:
        assert isinstance(c["boost"], float)
    if "clauses" in c:
        assert c["clauses"], "empty nested group escaped the parser"
        if "dismax_tie" in c:
            assert 0.0 <= c["dismax_tie"] <= 1.0
        if "min_should_match" in c:
            assert isinstance(c["min_should_match"], int)
        for sc in c["clauses"]:
            _check_clause(sc)
        return
    assert isinstance(c.get("field"), str) and c["field"]
    if "phrase" in c:
        assert len(c["phrase"]) >= 2 and all(t for t in c["phrase"])
    elif "multiterm" in c:
        assert c["multiterm"]["kind"] in MT_KINDS
    else:
        assert isinstance(c.get("term"), str) and c["term"]


def _check_xml_query(q):
    assert isinstance(q, XmlQuery)
    if q.match_all:
        assert not q.clauses and q.span is None and q.special is None
        return
    if q.span is not None:
        assert q.span["kind"] in {"near", "first", "not"}
        assert isinstance(q.span["field"], str) and q.span["field"]
        if q.span["kind"] == "near":
            assert len(q.span["clauses"]) >= 2
            for cl in q.span["clauses"]:
                assert (isinstance(cl, str) and cl) or (
                    isinstance(cl, list) and cl and all(cl))
        return
    if q.special is not None:
        k = q.special["kind"]
        assert k in {"mlt", "flt", "payload_term"}
        assert isinstance(q.special["field"], str) and q.special["field"]
        return
    if q.const is not None:
        assert isinstance(q.const, float)
    for c in q.clauses:
        _check_clause(c)
    for n in q.numeric:
        assert set(n) == {"field", "lo", "hi"}


# weighted toward XML structure so the element walk actually gets hit
_ALPHABET = string.ascii_letters + string.digits + ' <>/"=!&;:^.~[]'


@settings(max_examples=500, deadline=None)
@given(st.text(alphabet=_ALPHABET, max_size=80))
def test_xml_parser_total_on_arbitrary_input(q):
    try:
        out = parse_xml_query(q, numeric_fields={"num"})
    except QueryParseError:
        return
    _check_xml_query(out)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=50))
def test_xml_parser_total_on_unicode(q):
    try:
        out = parse_xml_query(q)
    except QueryParseError:
        return
    _check_xml_query(out)


_word = st.sampled_from(["alpha", "beta", "gamma", "Foo", "bar7", "a_b"])
_occ = st.sampled_from(["must", "mustNot", "should", "filter"])


@st.composite
def _element(draw, depth=0):
    kind = draw(st.integers(0, 6 if depth < 2 else 3))
    w = draw(_word)
    if kind == 0:
        return f"<TermQuery>{w}</TermQuery>"
    if kind == 1:
        return f"<TermsQuery>{w} {draw(_word)}</TermsQuery>"
    if kind == 2:
        b = draw(st.integers(1, 9))
        return f'<TermQuery boost="{b}">{w}</TermQuery>'
    if kind == 3:
        return (f'<RangeQuery fieldName="text" lowerTerm="{w}" '
                f'upperTerm="{draw(_word)}"/>')
    if kind == 4:
        subs = "".join(
            f'<Clause occurs="{draw(_occ)}">{draw(_element(depth=depth + 1))}'
            "</Clause>"
            for _ in range(draw(st.integers(1, 3)))
        )
        return f"<BooleanQuery>{subs}</BooleanQuery>"
    if kind == 5:
        subs = "".join(draw(_element(depth=depth + 1))
                       for _ in range(draw(st.integers(1, 3))))
        tie = draw(st.sampled_from(["0.0", "0.3", "1.0"]))
        return f'<DisjunctionMaxQuery tieBreaker="{tie}">{subs}</DisjunctionMaxQuery>'
    return f"<UserQuery>{w} +{draw(_word)}</UserQuery>"


@settings(max_examples=300, deadline=None)
@given(_element())
def test_well_formed_xml_always_parses(xml):
    out = parse_xml_query(xml)
    _check_xml_query(out)
    # the result reaches the boolean dispatch shape: non-empty clause
    # list (every generated element yields at least one clause)
    assert out.clauses
