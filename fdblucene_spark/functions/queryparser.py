"""Lucene classic QueryParser for the composable search surface.

The reference is driven through Lucene's query API, and the classic
QueryParser string syntax is how most Lucene users author queries
(reference: pom.xml pulls lucene-queryparser transitively via
lucene-core's test harness; fdblucene's README delegates "a subset of
Lucene's features", /root/reference/README.md:53). This module
re-implements the classic grammar as a pure-Python compiler from a
query string to the clause-spec dicts `Searcher.search_boolean`
evaluates — no Spark dependency, so parsing is unit-testable and
costs nothing at plan time.

Supported syntax (classic QueryParser):
  term                          analyzed term (standard_v1 analyzer)
  field:term                    explicit field
  field:(a b c)                 field scoped over a group
  "a b c"                       phrase (analyzed per word)
  "a b"~2                       sloppy phrase -> span-near (slop=2)
  (a OR b) AND c                grouping + boolean operators
  +term -term !term NOT term    required / prohibited modifiers
  a AND b / a && b              conjunction (classic addClause rules)
  a OR b / a || b               disjunction
  term^2  "a b"^3  (a b)^0.5    boosts (BoostQuery, multiplicative)
  te?t  tes*                    wildcard (WildcardQuery)
  tes*                          trailing-star-only -> PrefixQuery
  roam~ roam~1                  fuzzy (Damerau, Lucene default)
  /[mb]oat/                     regexp (RegexpQuery, anchored)
  field:[a TO b]  {a TO b}      term range (TermRangeQuery); on a
                                numeric doc-values field -> numeric
                                range constraint; * = open bound
  *:*                           MatchAllDocsQuery

Occur resolution copies Lucene's QueryParserBase.addClause exactly
(including the asymmetric AND/OR promotion of the PREVIOUS clause and
the default_operator="and" variant), so `a AND b OR c` parses to
[+a +b c] just as it does in Lucene.

Multi-token analyzed text (e.g. `foo-bar` under standard_v1) becomes
a nested SHOULD group, Lucene's default (autoGeneratePhraseQueries
off). A term that analyzes to nothing is a dropped clause, like a
stopword in Lucene.

Multi-term leaves (wildcard/prefix/fuzzy/regexp/range) are emitted as
`{"multiterm": {...}}` markers; `Searcher.search_parsed` rewrites
them against the term dictionary (scoring-boolean rewrite, the same
expansion path as search_prefix/search_fuzzy) before dispatching.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from .analysis import ANALYZER_VERSION, tokenize_text

_DEAD_TERM = "\x00__no_match__"  # impossible term (analyzer strips \x00):
                                 # stands in for an empty multi-term
                                 # expansion so occur semantics flow
                                 # through _boolean_spec's absent-term
                                 # handling unchanged

# chars that end a bare term run (classic _TERM_CHAR complement;
# + - are term chars MID-term, modifiers only at a clause boundary)
_TERM_STOP = set(' \t\n\r()":^[]{}~/')

_NUM_RE = re.compile(r"[0-9]+(?:\.[0-9]+)?")


@dataclass
class ParsedQuery:
    """Compiler output: search_boolean clause dicts (possibly holding
    multiterm/slop-phrase/match-all markers for the Searcher rewrite)
    plus top-level numeric range constraints."""

    clauses: list = dc_field(default_factory=list)
    numeric: list = dc_field(default_factory=list)


class QueryParseError(ValueError):
    pass


# ---------------------------------------------------------------- lexer

def _lex(q: str) -> list[tuple]:
    """Token stream: (kind, *payload). Kinds: LPAREN RPAREN AND OR NOT
    PLUS MINUS FIELD(name) TERM(text, has_wild, fuzzy_edits, boost)
    PHRASE(words, slop, boost) RANGE(lo, hi, lo_inc, hi_inc, boost)
    REGEXP(pattern, boost) CARET handled inline."""
    toks: list[tuple] = []
    i, n = 0, len(q)

    def _suffixes(i: int) -> tuple[int, int | None, float | None]:
        """Optional ~edits and ^boost after an atom (either order)."""
        edits = boost = None
        while i < n and q[i] in "~^":
            c = q[i]
            i += 1
            m = _NUM_RE.match(q, i)
            if c == "~":
                edits = int(float(m.group())) if m else -1  # -1 = default
            else:
                if not m:
                    raise QueryParseError("boost ^ needs a number")
                boost = float(m.group())
            if m:
                i = m.end()
        return i, edits, boost

    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            continue
        if c == "(":
            toks.append(("LPAREN",))
            i += 1
            continue
        if c == ")":
            i += 1
            i, _, boost = _suffixes(i)
            toks.append(("RPAREN", boost))
            continue
        if c == "+":
            toks.append(("PLUS",))
            i += 1
            continue
        if c == "-":
            toks.append(("MINUS",))
            i += 1
            continue
        if c == "!":
            toks.append(("NOT",))
            i += 1
            continue
        if q.startswith("&&", i):
            toks.append(("AND",))
            i += 2
            continue
        if q.startswith("||", i):
            toks.append(("OR",))
            i += 2
            continue
        if c == '"':
            j = i + 1
            buf = []
            while j < n and q[j] != '"':
                if q[j] == "\\" and j + 1 < n:
                    buf.append(q[j + 1])
                    j += 2
                else:
                    buf.append(q[j])
                    j += 1
            if j >= n:
                raise QueryParseError("unterminated phrase quote")
            i = j + 1
            i, edits, boost = _suffixes(i)
            slop = 0 if edits in (None, -1) else edits
            toks.append(("PHRASE", "".join(buf).split(), slop, boost))
            continue
        if c == "/":
            j = i + 1
            buf = []
            while j < n and q[j] != "/":
                if q[j] == "\\" and j + 1 < n and q[j + 1] == "/":
                    buf.append("/")
                    j += 2
                else:
                    buf.append(q[j])
                    j += 1
            if j >= n:
                raise QueryParseError("unterminated /regexp/")
            i = j + 1
            i, _, boost = _suffixes(i)
            toks.append(("REGEXP", "".join(buf), boost))
            continue
        if c in "[{":
            lo_inc = c == "["
            j = q.find("]", i)
            j2 = q.find("}", i)
            if j == -1 or (j2 != -1 and j2 < j):
                j = j2
            if j == -1:
                raise QueryParseError("unterminated range")
            hi_inc = q[j] == "]"
            inner = q[i + 1 : j].split()
            if len(inner) != 3 or inner[1].upper() != "TO":
                raise QueryParseError("range must be [lo TO hi]")
            lo = None if inner[0] == "*" else inner[0]
            hi = None if inner[2] == "*" else inner[2]
            i = j + 1
            i, _, boost = _suffixes(i)
            toks.append(("RANGE", lo, hi, lo_inc, hi_inc, boost))
            continue
        # bare term run (may be AND/OR/NOT keyword or a field: prefix)
        j = i
        buf = []
        has_wild = False
        while j < n and q[j] not in _TERM_STOP:
            if q.startswith("&&", j) or q.startswith("||", j):
                break
            if q[j] == "\\" and j + 1 < n:
                buf.append(q[j + 1])
                j += 2
                continue
            if q[j] in "*?":
                has_wild = True
            buf.append(q[j])
            j += 1
        word = "".join(buf)
        if not word:
            raise QueryParseError(f"unexpected character {q[j]!r}")
        if word == "AND":
            toks.append(("AND",))
            i = j
            continue
        if word == "OR":
            toks.append(("OR",))
            i = j
            continue
        if word == "NOT":
            toks.append(("NOT",))
            i = j
            continue
        if j < n and q[j] == ":":
            toks.append(("FIELD", word))
            i = j + 1
            continue
        i = j
        i, edits, boost = _suffixes(i)
        toks.append(("TERM", word, has_wild, edits, boost))
    return toks


# --------------------------------------------------------------- parser

def _add_clause(clauses: list, conj: str | None, mods: str | None,
                node: dict | None, default_and: bool) -> None:
    """Lucene QueryParserBase.addClause, verbatim semantics."""
    if clauses and conj == "AND":
        last = clauses[-1]
        if last["occur"] != "must_not":
            last["occur"] = "must"
    if clauses and default_and and conj == "OR":
        last = clauses[-1]
        if last["occur"] != "must_not":
            last["occur"] = "should"
    if node is None:
        return
    prohibited = mods == "NOT"
    if not default_and:
        required = mods == "REQ" or (conj == "AND" and not prohibited)
    else:
        required = not prohibited and conj != "OR"
    node["occur"] = (
        "must" if required and not prohibited
        else "must_not" if prohibited
        else "should"
    )
    clauses.append(node)


def _apply_boost(node: dict, boost: float | None) -> dict:
    if boost is not None and boost != 1.0:
        node["boost"] = float(node.get("boost", 1.0)) * boost
    return node


def _apply_boost_opt(node: dict | None, boost: float | None) -> dict | None:
    return None if node is None else _apply_boost(node, boost)


class _Parser:
    def __init__(self, toks, default_field, default_and,
                 keyword_fields, numeric_fields,
                 analyzer: str = ANALYZER_VERSION):
        self.toks = toks
        self.pos = 0
        self.analyzer = analyzer
        # default_field: one field name, or a MultiFieldQueryParser
        # spec — list of fields / {field: boost} — fanning every
        # unfielded leaf out across the fields as a SHOULD group with
        # per-field boosts (Lucene MultiFieldQueryParser semantics)
        if isinstance(default_field, str):
            self.default_fields = [(default_field, 1.0)]
        elif isinstance(default_field, dict):
            self.default_fields = [(f, float(b)) for f, b in default_field.items()]
        else:
            self.default_fields = [(f, 1.0) for f in default_field]
        if not self.default_fields:
            raise QueryParseError("default_field must name at least one field")
        self.default_and = default_and
        self.keyword_fields = set(keyword_fields)
        self.numeric_fields = set(numeric_fields)

    def _fan_out(self, fld: str | None, mk) -> dict | None:
        """Build an atom's clause node: mk(field) -> node | None. With
        an explicit field (or a single default) this is just mk; with
        multiple default fields the per-field nodes combine as a
        SHOULD group carrying the per-field boosts (MultiFieldQuery-
        Parser's BooleanQuery-per-term expansion)."""
        if fld is not None:
            return mk(fld)
        if len(self.default_fields) == 1:
            return mk(self.default_fields[0][0])
        subs = []
        for f, b in self.default_fields:
            node = mk(f)
            if node is None:
                continue
            node = _apply_boost(node, b)
            node["occur"] = "should"
            subs.append(node)
        if not subs:
            return None
        if len(subs) == 1:
            node = dict(subs[0])
            node.pop("occur", None)
            return node
        return {"clauses": subs}

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def parse_group(self, field_ctx: str | None, top: bool) -> list:
        clauses: list = []
        while True:
            t = self.peek()
            if t is None or t[0] == "RPAREN":
                if t is None and not top:
                    raise QueryParseError("missing )")
                return clauses
            conj = mods = None
            while self.peek() and self.peek()[0] in ("AND", "OR"):
                conj = self.next()[0]
            while self.peek() and self.peek()[0] in ("PLUS", "MINUS", "NOT"):
                mods = {"PLUS": "REQ", "MINUS": "NOT", "NOT": "NOT"}[self.next()[0]]
            t = self.peek()
            if t is None or t[0] == "RPAREN":
                # trailing operator/modifier with no clause: Lucene
                # raises ParseException here too
                if conj is None and mods is None:
                    continue
                raise QueryParseError("dangling operator")
            node = self.parse_clause(field_ctx)
            _add_clause(clauses, conj, mods, node, self.default_and)

    def parse_clause(self, field_ctx: str | None) -> dict | None:
        t = self.next()
        fld = field_ctx
        if t[0] == "FIELD":
            fld = t[1]
            if self.peek() is None or self.peek()[0] == "RPAREN":
                raise QueryParseError(f"field '{fld}:' with no value")
            t = self.next()
        if t[0] == "LPAREN":
            inner = self.parse_group(fld, top=False)
            closing = self.next()  # RPAREN (parse_group stopped on it)
            boost = closing[1]
            if not inner:
                return None
            if len(inner) == 1 and inner[0]["occur"] == "should":
                # Lucene unwraps a single-SHOULD boolean group
                node = dict(inner[0])
                node.pop("occur", None)
                return _apply_boost(node, boost)
            node = {"clauses": inner}
            return _apply_boost(node, boost)
        if t[0] == "PHRASE":
            words, slop, boost = t[1], t[2], t[3]

            def mk_phrase(f):
                if f in self.keyword_fields:
                    terms = [" ".join(words)] if words else []
                else:
                    terms = [tok for w in words
                             for tok in tokenize_text(w, self.analyzer)]
                if not terms:
                    return None
                if len(terms) == 1:
                    return {"field": f, "term": terms[0]}
                node = {"field": f, "phrase": terms}
                if slop:
                    node["slop"] = int(slop)
                return node

            return _apply_boost_opt(self._fan_out(fld, mk_phrase), boost)
        if t[0] == "REGEXP":
            pattern, boost = t[1], t[2]
            return _apply_boost_opt(
                self._fan_out(fld, lambda f: {
                    "field": f, "multiterm": {"kind": "regexp", "pattern": pattern}}),
                boost,
            )
        if t[0] == "RANGE":
            lo, hi, lo_inc, hi_inc, boost = t[1], t[2], t[3], t[4], t[5]

            def mk_range(f):
                if f in self.numeric_fields:
                    return {"field": f, "numeric_range": (
                        None if lo is None else float(lo),
                        None if hi is None else float(hi),
                        lo_inc, hi_inc)}
                rlo, rhi = lo, hi
                if f not in self.keyword_fields:
                    rlo = rlo.lower() if rlo is not None else None
                    rhi = rhi.lower() if rhi is not None else None
                return {"field": f, "multiterm": {
                    "kind": "term_range", "lo": rlo, "hi": rhi,
                    "lo_inc": lo_inc, "hi_inc": hi_inc}}

            return _apply_boost_opt(self._fan_out(fld, mk_range), boost)
        if t[0] == "TERM":
            word, has_wild, edits, boost = t[1], t[2], t[3], t[4]
            if word == "*" and fld == "*":
                return {"match_all": True}
            if has_wild:
                def mk_wild(f):
                    # Lucene does not analyze wildcard terms — lowercase only
                    pat = word if f in self.keyword_fields else word.lower()
                    core = pat[:-1]
                    if pat.endswith("*") and "*" not in core and "?" not in core and core:
                        return {"field": f, "multiterm": {"kind": "prefix", "prefix": core}}
                    return {"field": f, "multiterm": {"kind": "wildcard", "pattern": pat}}

                return _apply_boost_opt(self._fan_out(fld, mk_wild), boost)
            if edits is not None:
                def mk_fuzzy(f):
                    term = word if f in self.keyword_fields else word.lower()
                    max_edits = 2 if edits == -1 else min(int(edits), 2)
                    if max_edits == 0:
                        return {"field": f, "term": term}
                    return {"field": f, "multiterm": {
                        "kind": "fuzzy", "term": term, "max_edits": max_edits}}

                return _apply_boost_opt(self._fan_out(fld, mk_fuzzy), boost)

            def mk_term(f):
                if f in self.keyword_fields:
                    return {"field": f, "term": word}
                toks = tokenize_text(word, self.analyzer)
                if not toks:
                    return None
                if len(toks) == 1:
                    return {"field": f, "term": toks[0]}
                # multi-token analysis -> SHOULD group (Lucene default,
                # autoGeneratePhraseQueries=false)
                return {"clauses": [
                    {"field": f, "term": tk, "occur": "should"} for tk in toks
                ]}

            return _apply_boost_opt(self._fan_out(fld, mk_term), boost)
        raise QueryParseError(f"unexpected token {t[0]}")


def parse_query(
    q: str,
    default_field: str | dict | list = "text",
    default_operator: str = "or",
    keyword_fields: set[str] | frozenset[str] = frozenset(),
    numeric_fields: set[str] | frozenset[str] = frozenset(),
    analyzer: str = ANALYZER_VERSION,
) -> ParsedQuery:
    """Compile a classic-QueryParser string to search_boolean clause
    dicts. `analyzer` names the versioned analyzer used on term and
    phrase text (Searcher.search_parsed passes the index's pinned
    version, so query text always analyzes the way the corpus did —
    e.g. under standard_v2 the stopword 'the' vanishes from phrases
    exactly as it did from the postings). default_field may be one
    field name, or a
    MultiFieldQueryParser spec (list of fields or {field: boost}):
    every leaf without an explicit field then fans out across the
    fields as a SHOULD group with the per-field boosts.
    Numeric ranges on fields listed in `numeric_fields` are
    lifted out of the clause tree into ParsedQuery.numeric (they are
    doc-values constraints, not postings queries) — legal only at the
    top level as a REQUIRED clause (`+field:[lo TO hi]`, or any clause
    under default_operator='and'), like Lucene's common practice of
    AND-ing a numeric filter onto a text query. A should-occur numeric
    range (a bare `field:[lo TO hi]` under default_operator='or') is
    REJECTED rather than silently coerced to a mandatory filter: the
    classic Lucene parser would treat it as an optional SHOULD clause
    (either sub-query suffices), and this engine applies
    ParsedQuery.numeric as an AND filter — accepting the string would
    change its meaning. Write `+field:[lo TO hi]` to state the filter
    intent explicitly."""
    if default_operator not in ("or", "and"):
        raise QueryParseError("default_operator must be 'or' or 'and'")
    toks = _lex(q)
    p = _Parser(toks, default_field, default_operator == "and",
                keyword_fields, numeric_fields, analyzer)
    clauses = p.parse_group(None, top=True)
    if p.peek() is not None:
        raise QueryParseError("unbalanced )")
    out = ParsedQuery()
    for c in clauses:
        if "numeric_range" in c:
            if c["occur"] != "must":
                # 'should' would be an optional clause in classic
                # Lucene but a mandatory AND filter here — reject the
                # ambiguity instead of changing the query's meaning
                raise QueryParseError(
                    "a numeric range must be a required clause: write "
                    "+field:[lo TO hi] (or use default_operator='and')")
            lo, hi, lo_inc, hi_inc = c["numeric_range"]
            if not lo_inc or not hi_inc:
                raise QueryParseError(
                    "numeric ranges are inclusive: use [lo TO hi]")
            out.numeric.append({"field": c["field"], "lo": lo, "hi": hi})
            continue
        _reject_nested_numeric(c)
        out.clauses.append(c)
    return out


def _reject_nested_numeric(node: dict) -> None:
    for sub in node.get("clauses", ()):
        if "numeric_range" in sub:
            raise QueryParseError(
                "numeric range clauses must be at the top level")
        _reject_nested_numeric(sub)
