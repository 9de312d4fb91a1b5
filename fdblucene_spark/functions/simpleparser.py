"""SimpleQueryParser — Lucene's tolerant end-user query syntax.

The classic QueryParser (functions/queryparser.py) throws on malformed
input; Lucene ships a second parser for raw search-box text,
`SimpleQueryParser` (lucene/queryparser/simple), whose contract is the
opposite: NEVER throw a parse error — degrade gracefully and search
with whatever could be understood. Syntax (the parser's default
feature set):

    +   AND            |   OR           -   NOT (prefix)
    "quoted phrase"    phrase~N (slop)  term~N (fuzzy, edits <= 2)
    term*  prefix      ( ... ) grouping \\x escapes x

Whitespace joins clauses with the default operator. Operators bind
LEFT-ASSOCIATIVELY in input order (Lucene's parser folds left to
right, no precedence): `a + b | c` is `(a AND b) OR c`.

Tolerance rules (each mirrors the upstream behavior of "use what can
be parsed"): an unmatched `"` quotes to end-of-string; an unmatched
`(` groups to end-of-string; a stray `)` is ignored; dangling
operators (`a +`, leading `|`) are ignored; `~` with no digits means
2 (edits or slop); `*` is a prefix operator only at the end of a
term, literal (and analyzer-stripped) elsewhere.

The compile target is the same ParsedQuery / clause-dict algebra the
classic parser emits, so `Searcher.search_simple` reuses the whole
multiterm rewrite + one-job boolean evaluation path. "Never throws"
covers SYNTAX, exactly like Lucene; engine capability limits (a
sloppy phrase nested inside a boolean) still fail loudly rather than
silently change meaning.
"""

from __future__ import annotations

from .analysis import ANALYZER_VERSION, tokenize_text
from .queryparser import ParsedQuery, _DEAD_TERM

_OPS = {"+": "and", "|": "or"}


def _lex_simple(q: str) -> list[tuple]:
    """Token stream: ('LP',) ('RP',) ('OP', 'and'|'or') ('NEG',)
    ('PHRASE', text, slop) ('TERM', text, prefix?, fuzzy_or_None)."""
    toks: list[tuple] = []
    i, n = 0, len(q)

    def _tilde(i: int) -> tuple[int, int | None]:
        if i < n and q[i] == "~":
            i += 1
            d = ""
            while i < n and q[i].isdigit():
                d += q[i]
                i += 1
            return i, (int(d) if d else 2)
        return i, None

    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
        elif c == "(":
            toks.append(("LP",))
            i += 1
        elif c == ")":
            toks.append(("RP",))
            i += 1
        elif c in _OPS:
            toks.append(("OP", _OPS[c]))
            i += 1
        elif c == "-":
            toks.append(("NEG",))
            i += 1
        elif c == '"':
            j, buf = i + 1, []
            while j < n and q[j] != '"':
                if q[j] == "\\" and j + 1 < n:
                    buf.append(q[j + 1])
                    j += 2
                else:
                    buf.append(q[j])
                    j += 1
            j = j + 1 if j < n else j  # unmatched quote: phrase to EOS
            j, tilde = _tilde(j)
            toks.append(("PHRASE", "".join(buf), tilde or 0))
            i = j
        else:
            j, buf = i, []
            # '-' terminates nothing mid-word ("wi-fi" is one token;
            # NOT applies only clause-leading, handled above)
            while j < n and not q[j].isspace() and q[j] not in '()|+"~':
                if q[j] == "\\" and j + 1 < n:
                    buf.append(q[j + 1])
                    j += 2
                else:
                    buf.append(q[j])
                    j += 1
            word = "".join(buf)
            prefix = word.endswith("*")
            if prefix:
                word = word[:-1]
            j, tilde = _tilde(j)
            if word:
                toks.append(("TERM", word, prefix, tilde))
            i = j
    return toks


def _leaf(tok: tuple, field: str, analyzer: str) -> dict | None:
    """TERM/PHRASE token -> clause dict (no occur yet); None = the
    token analyzed away (pure punctuation / stopwords)."""
    if tok[0] == "PHRASE":
        words = tokenize_text(tok[1], analyzer)
        if not words:
            return None
        if len(words) == 1 and tok[2] == 0:
            return {"field": field, "term": words[0]}
        out = {"field": field, "phrase": list(words)}
        if tok[2]:
            out["slop"] = int(tok[2])
        return out
    _, word, prefix, fuzzy = tok
    words = tokenize_text(word, analyzer)
    if prefix:
        core = words[0] if words else ""
        if not core:
            return {"field": field, "term": _DEAD_TERM}
        return {"field": field, "multiterm": {"kind": "prefix", "prefix": core}}
    if not words:
        return None
    if fuzzy is not None and len(words) == 1:
        return {"field": field, "multiterm": {
            "kind": "fuzzy", "term": words[0],
            "max_edits": max(0, min(int(fuzzy), 2))}}
    if len(words) == 1:
        return {"field": field, "term": words[0]}
    return {"field": field, "phrase": list(words)}  # analyzer split the token


def _with_occur(node: dict, occ: str) -> dict:
    out = dict(node)
    out["occur"] = occ
    return out


def _parse_seq(toks: list[tuple], i: int, field: str, analyzer: str,
               default_op: str) -> tuple[dict | None, int]:
    """Parse until RP/end; left-fold entries with their joining ops.
    Returns (node, next_i) — node is a leaf dict, a group dict, or
    None (nothing parseable)."""
    entries: list[tuple[str, bool, dict]] = []
    pending_op, pending_neg = None, False
    while i < len(toks):
        t = toks[i]
        if t[0] == "RP":
            i += 1
            break
        if t[0] == "OP":
            pending_op = t[1]
            i += 1
            continue
        if t[0] == "NEG":
            pending_neg = True
            i += 1
            continue
        if t[0] == "LP":
            node, i = _parse_seq(toks, i + 1, field, analyzer, default_op)
        else:
            node = _leaf(t, field, analyzer)
            i += 1
        if node is not None:
            entries.append((pending_op or default_op, pending_neg, node))
        pending_op, pending_neg = None, False
    if not entries:
        return None, i

    # Lucene's fold: clauses joined by the SAME operator share one
    # flat BooleanQuery level ("a -b c" = one query with a SHOULD,
    # b MUST_NOT, c SHOULD); when the operator CHANGES the level so
    # far closes into a single clause of the new level, nesting LEFT
    # ("a + b | c" = (a AND b) OR c). Negation marks its clause
    # MUST_NOT without affecting the level's operator.
    def _occ(op: str) -> str:
        return "must" if op == "and" else "should"

    _PEND = "__pending__"  # first clause's occur resolves with the level op

    def _resolve(cur: list, level_op: str | None) -> list[dict]:
        occ = _occ(level_op) if level_op else "should"
        return [_with_occur(n, occ if o == _PEND else o) for o, n in cur]

    _, neg0, node0 = entries[0]
    cur: list = [("must_not" if neg0 else _PEND, node0)]
    level_op: str | None = None
    for op, neg, node in entries[1:]:
        if level_op is None or op == level_op:
            level_op = op
            cur.append(("must_not" if neg else _occ(op), node))
        else:
            closed = {"clauses": _resolve(cur, level_op)}
            level_op = op
            cur = [(_occ(op), closed), ("must_not" if neg else _occ(op), node)]
    resolved = _resolve(cur, level_op)
    if len(resolved) == 1:
        only = dict(resolved[0])
        occ = only.pop("occur")
        if occ == "must_not":
            # a lone negation: keep the group so it matches nothing
            return {"clauses": resolved}, i
        return only, i
    return {"clauses": resolved}, i


def parse_simple(
    q: str,
    default_field: str = "text",
    default_operator: str = "or",
    analyzer: str = ANALYZER_VERSION,
) -> ParsedQuery:
    """Compile SimpleQueryParser syntax to search_boolean clause
    dicts. Tolerant by contract: any string yields a ParsedQuery
    (possibly empty) — this function raises only on invalid ARGUMENTS
    (unknown default_operator), never on query syntax."""
    if default_operator not in ("or", "and"):
        raise ValueError("default_operator must be 'or' or 'and'")
    toks = _lex_simple(q)
    node, i = _parse_seq(toks, 0, default_field, analyzer, default_operator)
    while node is not None and i < len(toks):
        # stray ')' closed us early: keep folding the remainder in
        # (tolerance: the paren is ignored, not the rest of the query)
        rest, i = _parse_seq(toks, i, default_field, analyzer, default_operator)
        if rest is None:
            break
        locc = "must" if default_operator == "and" else "should"
        node = {"clauses": [_with_occur(node, locc), _with_occur(rest, locc)]}
    out = ParsedQuery()
    if node is None:
        return out
    if "clauses" in node and "field" not in node:
        out.clauses = node["clauses"]
    else:
        out.clauses = [_with_occur(node, "should")]
    return out
