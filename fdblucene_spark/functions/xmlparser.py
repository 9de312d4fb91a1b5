"""Lucene XML query parser (queryparser/xml CoreParser).

Lucene's `queryparser/xml` module parses an XML document into a Query
via a registry of element builders (CoreParser: TermQuery, TermsQuery,
BooleanQuery, UserQuery, MatchAllDocsQuery, ConstantScoreQuery,
DisjunctionMaxQuery, RangeQuery, PointRangeQuery, SpanTerm, SpanNear,
SpanOr, SpanOrTerms, SpanFirst, SpanNot). The reference delegates all
query construction to Lucene 8.1 (reference: README.md:53 "a subset of
Lucene's features"; pom.xml pulls lucene-queryparser transitively), so
the XML surface is part of the parser family this engine mirrors
alongside the classic string parser (functions/queryparser.py), the
simple parser and the surround parser.

This module is a pure-Python compiler from the XML syntax to the SAME
clause-dict algebra `Searcher.search_boolean` evaluates — no Spark
dependency, unit-testable, zero plan-time cost. `Searcher.search_xml`
dispatches the compiled query exactly the way `search_parsed` does:
multiterm markers expand against the term dictionary under the
scoring-boolean rewrite, whole-query span trees run the span kernels,
and everything else evaluates in ONE composable boolean job.

Element semantics (mirroring the Lucene builders):

  <TermQuery fieldName="f">term</TermQuery>
      verbatim index-form term (TermQueryBuilder does NOT analyze).
  <TermsQuery fieldName="f">free text</TermsQuery>
      analyzed with the index's pinned analyzer; each token a SHOULD
      clause (TermsQueryBuilder).
  <BooleanQuery minimumNumberShouldMatch="n">
    <Clause occurs="must|mustNot|should|filter"> ONE sub-query </Clause>
  </BooleanQuery>
      composable boolean, nested to any depth. occurs defaults to
      "should" (DOMUtils.getAttribute default); accepted spellings:
      must, mustNot/mustnot/must_not, should, filter.
  <UserQuery fieldName="f">classic query string</UserQuery>
      delegated to the classic parser (functions/queryparser.py) with
      the same analyzer/keyword/numeric routing as search_parsed.
  <MatchAllDocsQuery/>                    root only
  <ConstantScoreQuery boost="b"> sub </ConstantScoreQuery>
      root only — the engine scores constant queries whole-query
      (search_constant_score); Lucene allows nesting, where the inner
      constant leaks into the sum — out of scope, rejected loudly.
  <DisjunctionMaxQuery tieBreaker="t"> sub-queries </DisjunctionMaxQuery>
      disjuncts combine as max + t * (sum - max); composes as a clause
      at any depth (the engine's nested dismax_tie node).
  <RangeQuery fieldName="f" lowerTerm="a" upperTerm="b"
              includeLower="true" includeUpper="true"/>
      TermRangeQuery -> term-dictionary expansion marker.
  <PointRangeQuery fieldName="f" lowerTerm="1" upperTerm="9"/>
      numeric doc-values range; like the classic parser's rule it must
      be a REQUIRED (must/filter) clause of the root boolean — a
      should-occur numeric range would silently change meaning under
      the engine's AND-filter application, so it is rejected.
  <SpanTerm fieldName="f">term</SpanTerm>     (verbatim, like Lucene)
  <SpanOr><SpanTerm>..</SpanTerm>..</SpanOr>
  <SpanOrTerms fieldName="f">analyzed text</SpanOrTerms>
  <SpanNear slop="n" inOrder="true|false"> span clauses </SpanNear>
  <SpanFirst end="n"><SpanTerm>..</SpanTerm></SpanFirst>
  <SpanNot><Include>span</Include><Exclude>span</Exclude></SpanNot>
      span queries are whole-query surfaces (root only), dispatching
      to search_span_near / search_span_range / search_span_not with
      the span-family scoring convention those kernels document.
      SpanNear accepts SpanTerm and SpanOr/SpanOrTerms clauses;
      SpanFirst/SpanNot operands must be single SpanTerms (the
      kernels' supported shapes). inOrder defaults to false like
      Lucene's SpanNearBuilder.

`boost` attributes are accepted on any scoring query element and fold
multiplicatively (BoostQuery), exactly as in the classic parser.

CorePlusExtensionsParser elements (root only — each is a whole-query
surface in this engine):

  <LikeThisQuery fieldName="f" maxQueryTerms="25" minTermFreq="2"
                 minDocFreq="5">sample text</LikeThisQuery>
      MoreLikeThis (Searcher.more_like_this).
  <FuzzyLikeThisQuery maxNumTerms="50" maxEdits="2" prefixLength="0">
    <Field fieldName="f">sample text</Field>
  </FuzzyLikeThisQuery>
      FuzzyLikeThisQuery (Searcher.search_fuzzy_like_this); one Field
      child (the engine queries one field per search). maxEdits
      replaces the legacy minSimilarity attribute, as in Lucene 8's
      FuzzyQuery API.
  <BoostingTermQuery fieldName="f">term</BoostingTermQuery>
      PayloadScoreQuery(SpanTermQuery, AveragePayloadFunction) —
      Searcher.search_payload_score(func="avg"); requires an index
      built with store_payloads=True.

DTDs are rejected outright (no <!DOCTYPE/<!ENTITY): entity expansion
has no place in a query string.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field as dc_field

from .analysis import ANALYZER_VERSION, tokenize_text
from .queryparser import _DEAD_TERM, QueryParseError, parse_query


class XmlParseError(QueryParseError):
    pass


@dataclass
class XmlQuery:
    """Compiler output. Exactly one of the three shapes is populated:
    clauses+numeric (boolean dispatch), span (whole-query span
    dispatch), or match_all. `const` wraps the boolean shape in
    ConstantScoreQuery semantics."""

    clauses: list = dc_field(default_factory=list)
    numeric: list = dc_field(default_factory=list)
    span: dict | None = None
    const: float | None = None
    match_all: bool = False
    special: dict | None = None


_OCCURS = {
    "must": "must",
    "mustnot": "must_not",
    "must_not": "must_not",
    "should": "should",
    "filter": "filter",
}

_SPAN_TAGS = {"SpanTerm", "SpanOr", "SpanOrTerms", "SpanNear", "SpanFirst",
              "SpanNot"}
_SPECIAL_TAGS = {"LikeThisQuery", "FuzzyLikeThisQuery", "BoostingTermQuery"}


def _text(el: ET.Element) -> str:
    t = (el.text or "").strip()
    if not t:
        raise XmlParseError(f"<{el.tag}> requires text content")
    return t


def _attr(el: ET.Element, name: str, default: str | None = None) -> str:
    v = el.get(name, default)
    if v is None:
        raise XmlParseError(f"<{el.tag}> requires a {name} attribute")
    return v


def _bool_attr(el: ET.Element, name: str, default: bool) -> bool:
    v = el.get(name)
    if v is None:
        return default
    if v.lower() in ("true", "1"):
        return True
    if v.lower() in ("false", "0"):
        return False
    raise XmlParseError(f"<{el.tag}> {name} must be true or false, got {v!r}")


def _float_attr(el: ET.Element, name: str) -> float | None:
    v = el.get(name)
    if v is None:
        return None
    try:
        return float(v)
    except ValueError:
        raise XmlParseError(f"<{el.tag}> {name} must be a number, got {v!r}")


def _with_boost(node: dict, el: ET.Element) -> dict:
    b = _float_attr(el, "boost")
    if b is not None and b != 1.0:
        node = dict(node)
        # fold into an existing boost (BoostQuery(BoostQuery(q)))
        node["boost"] = b * node.get("boost", 1.0)
    return node


class _Compiler:
    def __init__(self, default_field, default_operator, keyword_fields,
                 numeric_fields, analyzer):
        self.default_field = default_field
        self.default_operator = default_operator
        self.keyword_fields = keyword_fields
        self.numeric_fields = numeric_fields
        self.analyzer = analyzer
        self.numeric: list[dict] = []

    # `top` is True only for direct children of the ROOT BooleanQuery
    # (or the root itself): the positions where a numeric constraint
    # may legally appear, mirroring parse_query's top-level-must rule.
    def compile(self, el: ET.Element, occur: str, top: bool = False) -> dict | None:
        tag = el.tag
        if tag == "TermQuery":
            f = el.get("fieldName", self._primary_field())
            node = {"field": f, "term": _text(el), "occur": occur}
            return _with_boost(node, el)
        if tag == "TermsQuery":
            f = el.get("fieldName", self._primary_field())
            if f in self.keyword_fields:
                toks = [_text(el)]
            else:
                toks = tokenize_text(_text(el), self.analyzer)
            if not toks:
                node = {"field": f, "term": _DEAD_TERM, "occur": occur}
            elif len(toks) == 1:
                node = {"field": f, "term": toks[0], "occur": occur}
            else:
                node = {
                    "clauses": [{"field": f, "term": t, "occur": "should"}
                                for t in toks],
                    "occur": occur,
                }
            return _with_boost(node, el)
        if tag == "BooleanQuery":
            subs: list[dict] = []
            for child in el:
                if child.tag != "Clause":
                    raise XmlParseError(
                        f"<BooleanQuery> children must be <Clause>, got "
                        f"<{child.tag}>")
                occ_raw = child.get("occurs", "should")
                occ = _OCCURS.get(occ_raw.lower().replace("-", "_"))
                if occ is None:
                    raise XmlParseError(
                        f"unknown occurs value {occ_raw!r} (must | mustNot "
                        f"| should | filter)")
                kids = list(child)
                if len(kids) != 1:
                    raise XmlParseError(
                        "<Clause> must wrap exactly one query element")
                sub = self.compile(
                    kids[0], occ,
                    top=top and occ in ("must", "filter"),
                )
                if sub is not None:
                    subs.append(sub)
            if not subs:
                return None
            node: dict = {"clauses": subs, "occur": occur}
            msm = el.get("minimumNumberShouldMatch")
            if msm is not None:
                node["min_should_match"] = int(msm)
            return _with_boost(node, el)
        if tag == "DisjunctionMaxQuery":
            tie = _float_attr(el, "tieBreaker")
            tie = 0.0 if tie is None else tie
            if not (0.0 <= tie <= 1.0):
                raise XmlParseError("tieBreaker must be in [0, 1]")
            subs = []
            for child in el:
                sub = self.compile(child, "should")
                if sub is not None:
                    subs.append(sub)
            if not subs:
                return None
            node = {"clauses": subs, "dismax_tie": tie, "occur": occur}
            return _with_boost(node, el)
        if tag == "UserQuery":
            f = el.get("fieldName", None)
            parsed = parse_query(
                _text(el),
                default_field=f if f is not None else self.default_field,
                default_operator=self.default_operator,
                keyword_fields=self.keyword_fields,
                numeric_fields=self.numeric_fields,
                analyzer=self.analyzer,
            )
            if parsed.numeric:
                if not top or occur not in ("must", "filter"):
                    raise XmlParseError(
                        "a UserQuery with a numeric range must be a required "
                        "clause of the root BooleanQuery")
                self.numeric.extend(parsed.numeric)
            if not parsed.clauses:
                return None
            if len(parsed.clauses) == 1 and "boost" not in el.attrib:
                node = dict(parsed.clauses[0])
                node["occur"] = occur
                return node
            node = {"clauses": parsed.clauses, "occur": occur}
            return _with_boost(node, el)
        if tag == "RangeQuery":
            f = el.get("fieldName", self._primary_field())
            node = {
                "field": f,
                "multiterm": {
                    "kind": "term_range",
                    "lo": _attr(el, "lowerTerm"),
                    "hi": _attr(el, "upperTerm"),
                    "lo_inc": _bool_attr(el, "includeLower", True),
                    "hi_inc": _bool_attr(el, "includeUpper", True),
                },
                "occur": occur,
            }
            return _with_boost(node, el)
        if tag == "PointRangeQuery":
            f = _attr(el, "fieldName")
            if f not in self.numeric_fields:
                raise XmlParseError(
                    f"PointRangeQuery field {f!r} is not in numeric_fields")
            if not top or occur not in ("must", "filter"):
                raise XmlParseError(
                    "a PointRangeQuery must be a required (must/filter) "
                    "clause of the root BooleanQuery — a should-occur "
                    "numeric range would be applied as an AND filter, "
                    "changing the query's meaning")
            lo = _attr(el, "lowerTerm")
            hi = _attr(el, "upperTerm")
            try:
                lo_v, hi_v = float(lo), float(hi)
            except ValueError:
                raise XmlParseError("PointRangeQuery bounds must be numeric")
            self.numeric.append({"field": f, "lo": lo_v, "hi": hi_v})
            return None
        if tag == "MatchAllDocsQuery":
            raise XmlParseError(
                "MatchAllDocsQuery is supported only as the whole query")
        if tag == "ConstantScoreQuery":
            raise XmlParseError(
                "ConstantScoreQuery is supported only as the whole query "
                "(the engine scores constant queries whole-query)")
        if tag in _SPAN_TAGS:
            raise XmlParseError(
                f"<{tag}> is supported only as the whole query (span "
                f"kernels are whole-query surfaces)")
        if tag in _SPECIAL_TAGS:
            raise XmlParseError(
                f"<{tag}> is supported only as the whole query")
        raise XmlParseError(f"unknown query element <{tag}>")

    def _primary_field(self) -> str:
        if isinstance(self.default_field, str):
            return self.default_field
        raise XmlParseError(
            "an element without fieldName needs a single default_field")


# ------------------------------------------------------------- span compile

def _span_field(el: ET.Element, default_field) -> str:
    f = el.get("fieldName")
    if f is not None:
        return f
    if isinstance(default_field, str):
        return default_field
    raise XmlParseError("span elements need fieldName or a single "
                        "default_field")


def _span_clause(
    el: ET.Element, default_field, analyzer: str = ANALYZER_VERSION
) -> tuple[object, str]:
    """A SpanNear operand -> (clause, field): a term (SpanTerm) or a
    list of alternative terms (SpanOr / SpanOrTerms). SpanOrTerms
    analyzes with the index's pinned analyzer (the same version the
    postings were built with), like TermsQuery."""
    if el.tag == "SpanTerm":
        return _text(el), _span_field(el, default_field)
    if el.tag == "SpanOr":
        terms, fields = [], set()
        for child in el:
            if child.tag != "SpanTerm":
                raise XmlParseError(
                    "<SpanOr> operands must be <SpanTerm> (nested span "
                    "structure inside an OR alternative is unsupported)")
            terms.append(_text(child))
            fields.add(_span_field(child, default_field))
        if not terms:
            raise XmlParseError("<SpanOr> requires at least one SpanTerm")
        if len(fields) != 1:
            raise XmlParseError("span clauses must share one field")
        return terms, fields.pop()
    if el.tag == "SpanOrTerms":
        f = _span_field(el, default_field)
        toks = tokenize_text(_text(el), analyzer)
        if not toks:
            raise XmlParseError("<SpanOrTerms> analyzed to no tokens")
        return (toks if len(toks) > 1 else toks[0]), f
    raise XmlParseError(
        f"unsupported span operand <{el.tag}> (SpanTerm | SpanOr | "
        f"SpanOrTerms)")


def _compile_span(el: ET.Element, default_field, analyzer: str) -> dict:
    tag = el.tag
    if tag == "SpanNear":
        slop_s = _attr(el, "slop")
        try:
            slop = int(slop_s)
        except ValueError:
            raise XmlParseError("SpanNear slop must be an integer")
        in_order = _bool_attr(el, "inOrder", False)
        clauses, fields = [], set()
        for child in el:
            c, f = _span_clause(child, default_field, analyzer)
            clauses.append(c)
            fields.add(f)
        if len(clauses) < 2:
            raise XmlParseError("SpanNear requires >= 2 clauses")
        if len(fields) != 1:
            raise XmlParseError("span clauses must share one field")
        return {"kind": "near", "clauses": clauses, "slop": slop,
                "in_order": in_order, "field": fields.pop()}
    if tag == "SpanFirst":
        end_s = _attr(el, "end")
        try:
            end = int(end_s)
        except ValueError:
            raise XmlParseError("SpanFirst end must be an integer")
        kids = list(el)
        if len(kids) != 1 or kids[0].tag != "SpanTerm":
            raise XmlParseError(
                "SpanFirst operand must be a single SpanTerm")
        return {"kind": "first", "term": _text(kids[0]), "end": end,
                "field": _span_field(kids[0], default_field)}
    if tag == "SpanNot":
        inc = exc = None
        for child in el:
            if child.tag == "Include":
                inc = child
            elif child.tag == "Exclude":
                exc = child
            else:
                raise XmlParseError(
                    "SpanNot children must be <Include> and <Exclude>")
        if inc is None or exc is None:
            raise XmlParseError("SpanNot requires <Include> and <Exclude>")
        ops = []
        for wrap in (inc, exc):
            kids = list(wrap)
            if len(kids) != 1 or kids[0].tag != "SpanTerm":
                raise XmlParseError(
                    "SpanNot operands must be single SpanTerms")
            ops.append(kids[0])
        fields = {_span_field(o, default_field) for o in ops}
        if len(fields) != 1:
            raise XmlParseError("span clauses must share one field")
        return {"kind": "not", "include": _text(ops[0]),
                "exclude": _text(ops[1]), "field": fields.pop()}
    # SpanTerm / SpanOr / SpanOrTerms at the root: positions don't
    # constrain anything, so they are ordinary term / OR queries — the
    # caller routes them through the boolean path instead.
    raise XmlParseError(f"<{tag}> is not a root span operator")


# --------------------------------------------------------------- entrypoint

def parse_xml_query(
    xml: str,
    default_field: str | dict | list = "text",
    default_operator: str = "or",
    keyword_fields: set[str] | frozenset[str] = frozenset(),
    numeric_fields: set[str] | frozenset[str] = frozenset(),
    analyzer: str = ANALYZER_VERSION,
) -> XmlQuery:
    """Compile a Lucene XML query document to an XmlQuery. See the
    module docstring for the element registry and semantics."""
    low = xml.lower()
    if "<!doctype" in low or "<!entity" in low:
        raise XmlParseError("DTDs are not allowed in query XML")
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as e:
        raise XmlParseError(f"malformed XML: {e}") from None
    out = XmlQuery()
    if root.tag == "MatchAllDocsQuery":
        out.match_all = True
        return out
    if root.tag == "LikeThisQuery":
        f = root.get("fieldName")
        if f is None and isinstance(default_field, str):
            f = default_field
        if f is None:
            raise XmlParseError("LikeThisQuery needs fieldName or a "
                                "single default_field")
        out.special = {
            "kind": "mlt", "field": f, "text": _text(root),
            "max_query_terms": int(root.get("maxQueryTerms", "25")),
            "min_term_freq": int(root.get("minTermFreq", "2")),
            "min_doc_freq": int(root.get("minDocFreq", "5")),
        }
        return out
    if root.tag == "FuzzyLikeThisQuery":
        kids = list(root)
        if len(kids) != 1 or kids[0].tag != "Field":
            raise XmlParseError(
                "FuzzyLikeThisQuery must wrap exactly one <Field> (the "
                "engine queries one field per search)")
        fld = kids[0]
        out.special = {
            "kind": "flt",
            "field": _attr(fld, "fieldName"),
            "text": _text(fld),
            "max_num_terms": int(root.get("maxNumTerms", "50")),
            "max_edits": int(root.get("maxEdits", "2")),
            "prefix_length": int(root.get("prefixLength", "0")),
        }
        return out
    if root.tag == "BoostingTermQuery":
        f = root.get("fieldName")
        if f is None and isinstance(default_field, str):
            f = default_field
        if f is None:
            raise XmlParseError("BoostingTermQuery needs fieldName or a "
                                "single default_field")
        out.special = {"kind": "payload_term", "field": f,
                       "term": _text(root)}
        return out
    if root.tag in ("SpanNear", "SpanFirst", "SpanNot"):
        out.span = _compile_span(root, default_field, analyzer)
        return out
    comp = _Compiler(default_field, default_operator, keyword_fields,
                     numeric_fields, analyzer)
    if root.tag == "ConstantScoreQuery":
        kids = list(root)
        if len(kids) != 1:
            raise XmlParseError(
                "ConstantScoreQuery must wrap exactly one query element")
        b = _float_attr(root, "boost")
        out.const = 1.0 if b is None else b
        root = kids[0]
        if root.tag in ("MatchAllDocsQuery", "ConstantScoreQuery") or (
                root.tag in _SPAN_TAGS or root.tag in _SPECIAL_TAGS):
            raise XmlParseError(
                f"ConstantScoreQuery cannot wrap <{root.tag}>")
    # SpanTerm / SpanOr / SpanOrTerms at the root carry no positional
    # constraint -> ordinary term / OR-group query (Lucene rewrites
    # them to the same scorer shape)
    if root.tag == "SpanTerm":
        f = _span_field(root, default_field)
        out.clauses = [{"field": f, "term": _text(root), "occur": "should"}]
        return out
    if root.tag in ("SpanOr", "SpanOrTerms"):
        c, f = _span_clause(root, default_field, analyzer)
        terms = c if isinstance(c, list) else [c]
        out.clauses = [{"field": f, "term": t, "occur": "should"}
                       for t in terms]
        return out
    top = root.tag == "BooleanQuery"
    node = comp.compile(root, "should" if not top else "must", top=top)
    out.numeric = comp.numeric
    if node is None:
        if out.numeric:
            raise XmlParseError(
                "a numeric range needs at least one text/keyword clause")
        return out
    if top:
        # splice the root boolean's own clauses (its occur is void)
        out.clauses = node["clauses"]
        if "min_should_match" in node or "boost" in node:
            # root-level msm/boost must ride on a wrapper node so the
            # evaluator sees them
            node["occur"] = "must"
            out.clauses = [node]
    else:
        out.clauses = [node]
    return out
