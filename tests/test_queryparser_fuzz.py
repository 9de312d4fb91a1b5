"""Property tests for the query-string compiler.

A parser fed user input must never escape its own error type: for
ANY string, parse_query either returns a well-formed ParsedQuery or
raises QueryParseError — no IndexError/KeyError/RecursionError
leaking from the lexer or the recursive-descent walk. Well-formed
means every clause dict type-checks against the search_boolean
contract (valid occur, string fields, non-empty terms/phrases,
recursively valid sub-clauses, known multiterm kinds).
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from fdblucene_spark.functions.queryparser import (
    ParsedQuery,
    QueryParseError,
    parse_query,
)

OCCURS = {"must", "should", "filter", "must_not"}
MT_KINDS = {"prefix", "wildcard", "fuzzy", "regexp", "term_range"}


def _check_clause(c):
    assert isinstance(c, dict)
    assert c.get("occur") in OCCURS
    if "boost" in c:
        assert isinstance(c["boost"], float)
    if c.get("match_all"):
        return
    if "clauses" in c:
        assert c["clauses"], "empty nested group escaped the parser"
        for sc in c["clauses"]:
            _check_clause(sc)
        return
    assert isinstance(c.get("field"), str) and c["field"]
    if "phrase" in c:
        assert len(c["phrase"]) >= 2 and all(t for t in c["phrase"])
        assert c.get("slop", 0) >= 0
    elif "multiterm" in c:
        mt = c["multiterm"]
        assert mt["kind"] in MT_KINDS
    else:
        assert isinstance(c.get("term"), str) and c["term"]


def _check_parsed(p):
    assert isinstance(p, ParsedQuery)
    for c in p.clauses:
        _check_clause(c)
    for n in p.numeric:
        assert set(n) == {"field", "lo", "hi"}


# printable chars, weighted toward the parser's special characters so
# deep grammar paths actually get hit
_ALPHABET = string.ascii_letters + string.digits + ' +-!&|()[]{}"~^:*?/\\.TO_'


@settings(max_examples=500, deadline=None)
@given(st.text(alphabet=_ALPHABET, max_size=60))
def test_parser_total_on_arbitrary_input(q):
    try:
        p = parse_query(q, keyword_fields={"kw"}, numeric_fields={"num"})
    except QueryParseError:
        return
    _check_parsed(p)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=40))
def test_parser_total_on_unicode(q):
    try:
        p = parse_query(q)
    except QueryParseError:
        return
    _check_parsed(p)


_word = st.sampled_from(["alpha", "beta", "gamma", "Foo", "bar7", "a_b"])


@st.composite
def _well_formed(draw, depth=0):
    kind = draw(st.integers(0, 7 if depth < 2 else 6))
    w = draw(_word)
    if kind == 0:
        return w
    if kind == 1:
        return f"{w}~{draw(st.integers(0, 2))}"
    if kind == 2:
        return f"{w}*"
    if kind == 3:
        return f'"{w} {draw(_word)}"'
    if kind == 4:
        return f"{w}^{draw(st.integers(1, 9))}"
    if kind == 5:
        return f"kw:{w}"
    if kind == 6:
        return f"[{w} TO {draw(_word)}]"
    parts = [draw(_well_formed(depth=depth + 1))
             for _ in range(draw(st.integers(1, 3)))]
    return "(" + " ".join(parts) + ")"


@settings(max_examples=300, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(["", "+", "-", "NOT "]),
              st.sampled_from(["", "AND ", "OR "]),
              _well_formed()),
    min_size=1, max_size=5))
def test_well_formed_queries_always_parse(parts):
    q = " ".join(f"{conj}{mod}{atom}" for mod, conj, atom in parts)
    p = parse_query(q, keyword_fields={"kw"},
                    default_operator="and" if len(parts) % 2 else "or")
    _check_parsed(p)
