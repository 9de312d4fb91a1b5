"""Lucene surround query parser (queryparser/surround module): the
span-first query language — infix and prefix AND/OR/NOT plus ordered
(W) / unordered (N) distance operators with an optional integer
distance, and truncation (`*` / `?`) leaves — compiled onto this
engine's existing surfaces exactly the way Lucene's surround module
lowers onto SpanQuery/BooleanQuery:

- ``nW(a, b, ...)`` / ``a nW b``  -> SpanNear(slop = n-1, inOrder)
- ``nN(...)``                     -> SpanNear(slop = n-1, unordered)
- OR inside a distance op         -> SpanOr alternative set
- truncation inside a distance op -> SpanMultiTermQueryWrapper pattern
- AND / OR / NOT                  -> BooleanQuery occurs
  (NOT is Lucene surround's binary a-AND-NOT-b, infix only)
- truncation inside a boolean     -> the classic parser's multiterm
  markers (SCORING_BOOLEAN rewrite via Searcher._expand_parsed)

Grammar follows the reference module (surround/parser/QueryParser.jj
precedence: OR loosest, then AND, NOT, N, W, primary; prefix-operator
forms OR()/AND()/nW()/nN(); operator names case-insensitive; default
distance 1; W/N/AND/OR/NOT are reserved words, not terms). Like
Lucene's surround parser, leaf terms are NOT analyzed — the user
writes index-form (lowercased) terms; this module only lowercases.

Engine-documented divergences:
- a distance op nests inside AND/OR/NOT only as the adjacent ordered
  case (W, distance 1, plain terms == a phrase clause); larger
  distances are whole-query dispatches — the same rule search_parsed
  applies to sloppy phrases (query.py: sloppy phrases are whole-query).
- an infix distance chain must use ONE distance (`a 3W b 3W c`);
  Lucene silently takes the last token's distance, which reorders
  meaning — rejected here instead.
"""

from __future__ import annotations

import re

from .queryparser import QueryParseError

_TOKEN = re.compile(r"\(|\)|,|[^\s(),]+", re.UNICODE)
_DIST = re.compile(r"^([0-9]+)?([wn])$", re.IGNORECASE)
_WORD = re.compile(r"^[\w*?]+$", re.UNICODE)
_RESERVED = ("and", "or", "not")


class _P:
    def __init__(self, toks: list[str]):
        self.toks, self.i = toks, 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def pop(self) -> str | None:
        t = self.peek()
        self.i += 1
        return t


def _dist_of(tok: str | None) -> tuple[int, bool] | None:
    """(distance, ordered) for a W/N operator token, else None."""
    m = _DIST.match(tok or "")
    if not m:
        return None
    return int(m.group(1) or 1), m.group(2).lower() == "w"


def _is_kw(tok: str | None, name: str) -> bool:
    return tok is not None and tok.lower() == name


def parse_surround(q: str) -> dict:
    """Surround string -> AST dict: {"term"|"prefix"|"wildcard": str}
    | {"and"|"or": [subs]} | {"not": [a, b]}
    | {"dist": {"n": int, "ordered": bool, "subs": [subs]}}."""
    p = _P(_TOKEN.findall(q))
    if p.peek() is None:
        raise QueryParseError("empty surround query")
    node = _or_q(p)
    if p.peek() is not None:
        raise QueryParseError(f"unexpected token {p.peek()!r}")
    return node


def _or_q(p: _P) -> dict:
    subs = [_and_q(p)]
    while _is_kw(p.peek(), "or"):
        p.pop()
        subs.append(_and_q(p))
    return subs[0] if len(subs) == 1 else {"or": subs}


def _and_q(p: _P) -> dict:
    subs = [_not_q(p)]
    while _is_kw(p.peek(), "and"):
        p.pop()
        subs.append(_not_q(p))
    return subs[0] if len(subs) == 1 else {"and": subs}


def _not_q(p: _P) -> dict:
    left = _dist_q(p, ordered=False)
    while _is_kw(p.peek(), "not"):
        p.pop()
        left = {"not": [left, _dist_q(p, ordered=False)]}
    return left


def _dist_q(p: _P, ordered: bool) -> dict:
    sub = _dist_q(p, True) if not ordered else _primary(p)
    subs, dist = [sub], None
    while True:
        d = _dist_of(p.peek())
        if d is None or d[1] != ordered:
            break
        p.pop()
        if dist is not None and dist != d[0]:
            raise QueryParseError(
                "an infix distance chain must use one distance "
                f"(got {dist} then {d[0]})")
        dist = d[0]
        subs.append(_dist_q(p, True) if not ordered else _primary(p))
    if len(subs) == 1:
        return subs[0]
    return {"dist": {"n": dist, "ordered": ordered, "subs": subs}}


def _primary(p: _P) -> dict:
    tok = p.pop()
    if tok is None:
        raise QueryParseError("unexpected end of query")
    if tok in (")", ","):
        raise QueryParseError(f"unexpected {tok!r}")
    if tok == "(":
        node = _or_q(p)
        if p.pop() != ")":
            raise QueryParseError("expected )")
        return node
    low = tok.lower()
    d = _dist_of(low)
    if p.peek() == "(" and (low in ("and", "or") or d is not None):
        p.pop()
        args = [_or_q(p)]
        while p.peek() == ",":
            p.pop()
            args.append(_or_q(p))
        if p.pop() != ")":
            raise QueryParseError(f"expected ) closing {tok}(...)")
        if len(args) < 2:
            raise QueryParseError(f"{tok}(...) needs >= 2 arguments")
        if low == "and":
            return {"and": args}
        if low == "or":
            return {"or": args}
        return {"dist": {"n": d[0], "ordered": d[1], "subs": args}}
    if low in _RESERVED or d is not None:
        raise QueryParseError(f"operator {tok!r} in term position")
    return _leaf(tok)


def _leaf(tok: str) -> dict:
    t = tok.lower()
    if not _WORD.match(t):
        raise QueryParseError(f"bad term {tok!r}")
    if "*" in t or "?" in t:
        if set(t) <= {"*", "?"}:
            raise QueryParseError(f"bare truncation {tok!r}")
        if t.endswith("*") and "*" not in t[:-1] and "?" not in t:
            return {"prefix": t[:-1]}
        return {"wildcard": t}
    return {"term": t}


def compile_boolean(node: dict, field: str) -> list[dict]:
    """AST (no whole-query distance op) -> search_boolean clause dicts
    with the classic parser's multiterm markers for truncations."""

    def clause(nd: dict, occur: str) -> dict:
        if "term" in nd:
            return {"field": field, "term": nd["term"], "occur": occur}
        if "prefix" in nd:
            return {"field": field, "occur": occur,
                    "multiterm": {"kind": "prefix", "prefix": nd["prefix"]}}
        if "wildcard" in nd:
            return {"field": field, "occur": occur,
                    "multiterm": {"kind": "wildcard", "pattern": nd["wildcard"]}}
        if "and" in nd:
            return {"occur": occur,
                    "clauses": [clause(s, "must") for s in nd["and"]]}
        if "or" in nd:
            return {"occur": occur,
                    "clauses": [clause(s, "should") for s in nd["or"]]}
        if "not" in nd:
            a, b = nd["not"]
            return {"occur": occur,
                    "clauses": [clause(a, "must"), clause(b, "must_not")]}
        d = nd["dist"]
        if d["ordered"] and d["n"] == 1 and all("term" in s for s in d["subs"]):
            return {"field": field, "occur": occur,
                    "phrase": [s["term"] for s in d["subs"]]}
        raise QueryParseError(
            "a distance operator nests inside AND/OR/NOT only as the "
            "adjacent ordered case (W, distance 1, plain terms); run "
            "larger distances as the whole query")

    if "and" in node:
        return [clause(s, "must") for s in node["and"]]
    if "or" in node:
        return [clause(s, "should") for s in node["or"]]
    if "not" in node:
        a, b = node["not"]
        return [clause(a, "must"), clause(b, "must_not")]
    return [clause(node, "must")]
