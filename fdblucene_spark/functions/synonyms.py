"""Query-time synonym graph expansion (Lucene SynonymGraphFilter +
QueryBuilder graph queries, analysis-common SolrSynonymParser rules).

Reference parity: the reference delegates all analysis to Lucene 8.1
(/root/reference/README.md — FDBDirectory hosts stock Lucene analyzers
and query builders). Lucene's query-time synonym path is:
SolrSynonymParser parses rules into a SynonymMap; SynonymGraphFilter
rewrites the query token stream with greedy maximal-match lookups,
emitting a token GRAPH when a rule side spans multiple tokens; and
QueryBuilder.analyzeGraphBoolean compiles that graph per position
group — a SynonymQuery when every alternative at the position is a
single token, otherwise a disjunction of per-path term/phrase queries.

Re-expressed Spark-first: a pure-Python query compiler producing the
clause dicts `Searcher.search_boolean` evaluates in ONE Spark job
(term / phrase / synonym / nested-sub clause types all exist in the
kernel). Synonym expansion never touches the corpus — it is bounded by
query length x rule fan-out, so the plan shape is identical to any
other boolean query: one pruned postings scan + per-shard kernels.
Index-time synonym injection is deliberately NOT offered: Lucene's own
docs steer multi-word synonyms to query time (index-time graphs
flatten and corrupt phrase positions), and query-time rules can change
without a rebuild — the right trade at 100 TB.

Rule syntax (SolrSynonymParser):
  "a, b c"        equivalence: every member expands to ALL members
                  (expand=true, the Lucene default)
  "a => b, c d"   explicit: each LHS alternative is REPLACED by the
                  RHS list (LHS survives only if repeated on the RHS)
Sides are analyzed with the index analyzer, so rules written in any
case/punctuation match the indexed tokens.
"""

from __future__ import annotations

from .analysis import ANALYZER_VERSION, tokenize_text

# input token-tuple -> set of output paths (token tuples)
SynonymMap = dict[tuple[str, ...], set[tuple[str, ...]]]


def parse_synonym_rules(
    rules: list[str], analyzer: str = ANALYZER_VERSION
) -> SynonymMap:
    """Solr-format synonym rules -> SynonymMap. Multiple rules for the
    same input merge their outputs (SynonymMap.Builder semantics).
    Empty sides (tokens that analyze away entirely) raise — a rule
    that cannot match is a configuration error, not a no-op."""
    smap: SynonymMap = {}

    def _side(s: str) -> list[tuple[str, ...]]:
        out = []
        for part in s.split(","):
            toks = tuple(tokenize_text(part, analyzer))
            if not toks:
                raise ValueError(f"synonym rule side analyzes to nothing: {part!r}")
            out.append(toks)
        return out

    for rule in rules:
        if "=>" in rule:
            lhs_s, rhs_s = rule.split("=>", 1)
            lhs, rhs = _side(lhs_s), _side(rhs_s)
            for inp in lhs:
                smap.setdefault(inp, set()).update(rhs)
        else:
            grp = _side(rule)
            for inp in grp:
                smap.setdefault(inp, set()).update(grp)
    return smap


def expand_graph(
    tokens: list[str], smap: SynonymMap
) -> list[list[tuple[str, ...]]]:
    """Greedy maximal-match scan (SynonymGraphFilter's match policy):
    at each position take the LONGEST rule input starting there; the
    group's alternatives are the rule outputs (equivalence rules
    include the input itself by construction). Unmatched tokens pass
    through as single-path groups. Returns one group per position:
    a sorted list of alternative paths (token tuples)."""
    max_len = max((len(k) for k in smap), default=1)
    groups: list[list[tuple[str, ...]]] = []
    i = 0
    n = len(tokens)
    while i < n:
        matched = None
        for ln in range(min(max_len, n - i), 0, -1):
            key = tuple(tokens[i : i + ln])
            if key in smap:
                matched = (ln, smap[key])
                break
        if matched is None:
            groups.append([(tokens[i],)])
            i += 1
        else:
            ln, outs = matched
            groups.append(sorted(outs))
            i += ln
    return groups


def graph_clauses(
    groups: list[list[tuple[str, ...]]],
    field: str = "text",
    occur: str = "should",
) -> list[dict]:
    """Position groups -> search_boolean clause dicts, the
    QueryBuilder.analyzeGraphBoolean compilation:
    - one single-token path        -> TermQuery
    - one multi-token path         -> PhraseQuery
    - several all-single-token paths -> SynonymQuery (blended df,
      summed tf — the `synonym` kernel clause)
    - mixed paths                  -> disjunction of per-path
      term/phrase queries (nested sub, min_should_match=1)
    Every group carries the SAME outer occur: the default operator
    applies per position, exactly as QueryBuilder adds each graph
    interval as one clause."""
    clauses: list[dict] = []
    for paths in groups:
        if len(paths) == 1:
            p = paths[0]
            if len(p) == 1:
                clauses.append({"term": p[0], "occur": occur, "field": field})
            else:
                clauses.append({"phrase": list(p), "occur": occur, "field": field})
        elif all(len(p) == 1 for p in paths):
            clauses.append(
                {"synonym": [p[0] for p in paths], "occur": occur, "field": field}
            )
        else:
            inner = [
                {"term": p[0], "occur": "should", "field": field}
                if len(p) == 1
                else {"phrase": list(p), "occur": "should", "field": field}
                for p in paths
            ]
            clauses.append({"clauses": inner, "occur": occur, "min_should_match": 1})
    return clauses
