"""Reverse search: Lucene monitor / percolator (register queries,
stream documents through them).

Parity target: Lucene's lucene/monitor module (Monitor.register +
Monitor.match, formerly Luwak; Elasticsearch exposes the same shape
as the percolate query). The reference delegates all query semantics
to Lucene 8.1 (reference: pom.xml:35-39), whose distribution ships
the monitor module; an fdblucene user alerting on an indexed feed
would reach for it.

Lucene's architecture is a two-phase match:

  1. *presearcher*: registered queries are themselves indexed by
     their terms, and a document first runs as a query against that
     query-index, so only queries sharing a term with the document
     are evaluated;
  2. *verify*: each surviving query runs against a single-doc
     MemoryIndex for exact semantics.

The Spark-first re-expression keeps both phases but makes them set
operations over the whole batch instead of a per-document loop:

  1. the registry's (query_id, term, occur) rows are a BROADCAST
     table; an Arrow-tokenized `explode(array_distinct(tokens))`
     stream joins it map-side — only (doc, query) pairs sharing a
     term reach aggregation (the presearcher, as a broadcast hash
     join with zero shuffle on the corpus side);
  2. one partial+final aggregate keyed (doc, query) checks the
     boolean contract — every MUST term present, >= msm SHOULD
     terms, no MUST_NOT term. Phrase clauses run the exact
     consecutive-run check MAP-SIDE as a vectorized JVM expression
     over the token array, injecting a non-tokenizable sentinel
     pseudo-term into the doc's term set when the run occurs — so a
     phrase is just one more MUST term to the aggregate (the
     MemoryIndex phase, folded into the same single pass).

Scale shape at 10^12 docs: the corpus is touched by exactly one
map-only tokenize pass (phrase exprs included); the only shuffle is
the (doc, query) candidate aggregation, whose size is bounded by
matches-per-doc (the presearcher join drops everything else). The
registry is driver-side and broadcast — the same bounded-model-state
contract as the IVF centroid table (similarity.py). Registries
beyond broadcast size would swap the join strategy — and a registry
with a huge phrase population would move the run-check back to a
candidate-keyed verify join — without changing the semantics.

Match semantics (Lucene BooleanQuery, match-only — the monitor's
default QueryMatch; ScoringMatch needs corpus-level idf which a
percolator, running before/without an index, does not have):

  matches(doc, q)  iff  every q.must term is present
                   and  >= q.msm of q.should terms are present
                        (msm defaults to 1 when the query has ONLY
                        should terms, else 0 — BooleanQuery's
                        implicit minimumNumberShouldMatch)
                   and  no q.must_not term is present
                   and  every q.phrase runs consecutively.

Pure-negative queries are rejected, mirroring Lucene monitor's
presearcher contract (a query must expose at least one positive term
to be indexable; MatchAllDocsQuery-style registrations are the
documented exception we do not take).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analysis import (
    ANALYZER_VERSION,
    tokenize_expr_ascii,
    tokenize_text,
    tokens_udf_for,
)

__all__ = ["compile_queries", "match_queries", "match_queries_oracle"]


def compile_queries(queries: list[dict]) -> tuple[list[tuple], list[tuple], dict]:
    """Validate + flatten registered queries.

    Each query dict: {"query_id": str, "must": [..], "should": [..],
    "must_not": [..], "msm": int?, "phrase": [t1, t2, ...]?}.
    Returns (term_rows, req_rows, phrases):
      term_rows  = [(query_id, term, occur)]   occur in must/should/must_not
      req_rows   = [(query_id, n_must, msm)]
      phrases    = {query_id: [terms]}  (phrase terms also emitted as
                   must term_rows — the presearcher prefilter; the
                   consecutive-run check happens in the verify phase)
    """
    term_rows: list[tuple] = []
    req_rows: list[tuple] = []
    phrases: dict[str, list[str]] = {}
    seen_ids: set[str] = set()
    for q in queries:
        qid = q["query_id"]
        if qid in seen_ids:
            raise ValueError(f"duplicate query_id {qid!r}")
        seen_ids.add(qid)
        must = list(dict.fromkeys(q.get("must", ())))
        should = list(dict.fromkeys(q.get("should", ())))
        must_not = list(dict.fromkeys(q.get("must_not", ())))
        phrase = list(q.get("phrase", ()))
        if phrase and len(phrase) < 2:
            raise ValueError(f"{qid}: phrase needs >= 2 terms")
        if not (must or should or phrase):
            raise ValueError(
                f"{qid}: pure-negative query is not registrable (the "
                "presearcher needs at least one positive term)"
            )
        msm = q.get("msm")
        if msm is None:
            msm = 1 if (should and not (must or phrase)) else 0
        if msm > len(should):
            raise ValueError(f"{qid}: msm={msm} > {len(should)} should terms")
        # phrase terms are MUST terms for the candidate phase (a doc
        # lacking any phrase term cannot contain the phrase)
        cand_must = list(dict.fromkeys(must + phrase))
        for t in cand_must:
            term_rows.append((qid, t, "must"))
        for t in should:
            term_rows.append((qid, t, "should"))
        for t in must_not:
            term_rows.append((qid, t, "must_not"))
        req_rows.append((qid, len(cand_must), msm))
        if phrase:
            phrases[qid] = phrase
    return term_rows, req_rows, phrases


def _phrase_sentinel(qid: str) -> str:
    return f"\x00ph:{qid}"


def _phrase_expr(toks: Column, phrase: list[str]) -> Column:
    """True iff `phrase` occurs as a consecutive token run. JVM-only:
    exists over the valid start offsets, element_at is 1-based."""
    n = len(phrase)
    def run_at(s: Column) -> Column:
        cond = F.lit(True)
        for i, w in enumerate(phrase):
            cond = cond & (F.element_at(toks, s + F.lit(i)) == F.lit(w))
        return cond
    return (F.size(toks) >= n) & F.exists(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)), run_at
    )


def match_queries(
    docs_df: DataFrame,
    queries: list[dict],
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = ANALYZER_VERSION,
    ascii_fast: bool = False,
) -> DataFrame:
    """Percolate: which registered queries match which documents.

    Returns DataFrame(id_col, query_id) — one row per match (the
    monitor's QueryMatch). Works identically on a static batch or
    inside foreachBatch of a stream (the registry join is
    stream-static safe: broadcast, stateless).

    ascii_fast=True uses the pure-JVM tokenizer (identical to the
    named analyzer on ASCII-word-char corpora, whole-stage codegen);
    default is the Arrow-batched pandas analyzer UDF.
    """
    spark = docs_df.sparkSession
    term_rows, req_rows, phrases = compile_queries(queries)
    terms_df = F.broadcast(
        spark.createDataFrame(term_rows, "query_id string, term string, occur string")
    )
    reqs_df = F.broadcast(
        spark.createDataFrame(req_rows, "query_id string, n_must int, msm int")
    )
    if ascii_fast:
        toks_col = tokenize_expr_ascii(F.col(text_col), analyzer)
    else:
        toks_col = tokens_udf_for(analyzer)(F.col(text_col))
    from ._spread import spread

    with_toks = spread(docs_df).select(F.col(id_col), toks_col.alias("_toks"))
    term_set = F.array_distinct("_toks")
    if phrases:
        # phrase verify, map-side: when the consecutive run occurs,
        # inject the query's sentinel pseudo-term (\x00 cannot appear
        # in a \w+ token) — the registry carries a matching MUST row,
        # so the aggregate needs no second corpus join
        sentinels = F.array_compact(F.array(*[
            F.when(_phrase_expr(F.col("_toks"), ph),
                   F.lit(_phrase_sentinel(qid))).otherwise(F.lit(None))
            for qid, ph in phrases.items()
        ]))
        term_set = F.concat(term_set, sentinels)
        for qid in phrases:
            term_rows = term_rows + [(qid, _phrase_sentinel(qid), "must")]
        reqs_df = F.broadcast(
            spark.createDataFrame(
                [(qid, nm + (1 if qid in phrases else 0), msm)
                 for qid, nm, msm in req_rows],
                "query_id string, n_must int, msm int",
            )
        )
        terms_df = F.broadcast(
            spark.createDataFrame(
                term_rows, "query_id string, term string, occur string"
            )
        )
    doc_terms = with_toks.select(id_col, F.explode(term_set).alias("term"))
    # presearcher: broadcast hash join — only shared-term pairs survive
    return (
        doc_terms.join(terms_df, "term")
        .groupBy(id_col, "query_id")
        .agg(
            F.sum(F.when(F.col("occur") == "must", 1).otherwise(0)).alias("must_hit"),
            F.sum(F.when(F.col("occur") == "should", 1).otherwise(0)).alias("should_hit"),
            F.max(F.when(F.col("occur") == "must_not", 1).otherwise(0)).alias("neg_hit"),
        )
        .join(reqs_df, "query_id")
        .filter(
            (F.col("must_hit") == F.col("n_must"))
            & (F.col("should_hit") >= F.col("msm"))
            & (F.col("neg_hit") == 0)
        )
        .select(id_col, "query_id")
    )


def match_queries_oracle(
    docs: list[tuple], queries: list[dict], analyzer: str = ANALYZER_VERSION
) -> set[tuple]:
    """Pure-Python twin for pytest: same contract, per-doc loop."""
    term_rows, req_rows, phrases = compile_queries(queries)
    reqs = {qid: (nm, msm) for qid, nm, msm in req_rows}
    by_q: dict[str, dict[str, set[str]]] = {}
    for qid, t, occ in term_rows:
        by_q.setdefault(qid, {"must": set(), "should": set(), "must_not": set()})[
            occ
        ].add(t)
    out = set()
    for doc_id, text in docs:
        toks = tokenize_text(text, analyzer)
        tset = set(toks)
        for qid, groups in by_q.items():
            n_must, msm = reqs[qid]
            if len(groups["must"] & tset) != n_must:
                continue
            if len(groups["should"] & tset) < msm:
                continue
            if groups["must_not"] & tset:
                continue
            ph = phrases.get(qid)
            if ph and not any(
                toks[s : s + len(ph)] == ph for s in range(len(toks) - len(ph) + 1)
            ):
                continue
            out.add((doc_id, qid))
    return out
