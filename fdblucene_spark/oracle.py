"""Brute-force pure-Python BM25 oracle — the pytest referee.

Stands in for "reference Lucene" (no JVM Lucene in this sandbox): a
deliberately naive, obviously-correct implementation of Lucene 8
search semantics over an in-memory corpus, against which the Spark
engine must be rank-identical (BASELINE.json north_rule; reference
end-to-end test shape: SimpleFDBDirectoryTest.java:144-159).

Scoring math is imported from functions.bm25 — the SAME module the
engine kernels use — and a golden test pins that module's constants,
so oracle and engine cannot drift together silently. Everything else
here (postings maps, python loops) is intentionally simple; this
module is never on the engine's execution path.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

import numpy as np

from .functions import bm25
from .functions.analysis import tokenize_text


@dataclass
class OracleIndex:
    doc_keys: list          # position i -> external doc key
    postings: dict          # term -> dict[int docid, (tf, positions tuple)]
    dlq: np.ndarray         # quantized doc length per docid
    n_docs: int
    avgdl: float            # exact sumTotalTermFreq / docCount
    sum_ttf: int
    sum_df: int


def build_oracle_index(
    doc_keys: list, texts: list[str], analyzer: str = "standard_v1"
) -> OracleIndex:
    from .functions.analysis import edge_expand, edge_grams

    postings: dict[str, dict[int, tuple[int, tuple]]] = defaultdict(dict)
    doclens = np.zeros(len(texts), dtype=np.int64)
    edged = edge_grams(analyzer)
    for did, text in enumerate(texts):
        if edged:
            # edge-gram chain (standard_v6): dl counts ORIGINAL tokens
            # (discountOverlaps) and every gram of a token carries the
            # token's ordinal (posinc 0) — same law as the inverter
            orig = tokenize_text(text, "standard_v1")
            doclens[did] = len(orig)
            stream = [(g, i) for i, t in enumerate(orig)
                      for g in edge_expand(t)]
        else:
            toks = tokenize_text(text, analyzer)
            doclens[did] = len(toks)
            stream = list(zip(toks, range(len(toks))))
        occ: dict[str, list[int]] = defaultdict(list)
        for t, pos in stream:
            occ[t].append(pos)
        for t, ps in occ.items():
            postings[t][did] = (len(ps), tuple(ps))
    sum_ttf = int(doclens.sum())
    sum_df = sum(len(v) for v in postings.values())
    # Lucene docCount: docs with >=1 surviving token in the field
    # (a doc whose text analyzes to nothing — empty, or all-stopword
    # under standard_v2 — carries no norm and no avgdl weight)
    n_docs = int((doclens > 0).sum())
    avgdl = sum_ttf / n_docs if n_docs else 0.0
    return OracleIndex(
        doc_keys=list(doc_keys),
        postings=dict(postings),
        dlq=bm25.quantize_doclen(doclens),
        n_docs=n_docs,
        avgdl=avgdl,
        sum_ttf=sum_ttf,
        sum_df=sum_df,
    )


def _term_scores(idx: OracleIndex, term: str) -> dict[int, float]:
    plist = idx.postings.get(term)
    if not plist:
        return {}
    docs = np.fromiter(plist.keys(), dtype=np.int64, count=len(plist))
    tfs = np.fromiter((v[0] for v in plist.values()), dtype=np.int64, count=len(plist))
    scores = bm25.term_score(tfs, idx.dlq[docs], len(plist), idx.n_docs, idx.avgdl)
    return dict(zip(docs.tolist(), scores.tolist()))


def search(
    idx: OracleIndex,
    terms: list[str],
    k: int,
    mode: str = "or",
    not_terms: list[str] | None = None,
    after: tuple[float, int] | None = None,
    dismax_tie: float | None = None,
) -> list[tuple]:
    """Top-k [(doc_key, float32 score)] — score desc, docid asc ties.

    Scoring uses the deduplicated term set (the engine contract:
    BooleanQuery of unique terms). Phrase matching uses the terms in
    the caller's order, duplicates allowed — the phrase IS the order.
    after: searchAfter cursor (score, docid), strictly-after paging.
    dismax_tie: DisjunctionMax scoring max + tie * (sum - max).
    """
    seq = list(terms)
    terms = sorted(set(terms))
    per_term = [_term_scores(idx, t) for t in terms]
    if mode == "and":
        live = None
        for m in per_term:
            keys = set(m.keys())
            live = keys if live is None else (live & keys)
        live = live or set()
    elif mode == "phrase":
        live = _phrase_match(idx, seq)
    else:
        live = set()
        for m in per_term:
            live |= m.keys()
    for nt in not_terms or []:
        live -= set(idx.postings.get(nt, {}).keys())  # MUST_NOT
    acc: dict[int, float] = {}
    mx: dict[int, float] = {}
    for m in per_term:
        for d, s in m.items():
            if d in live:
                acc[d] = acc.get(d, 0.0) + s  # float64 sum of float32 addends
                mx[d] = max(mx.get(d, 0.0), s)
    if dismax_tie is not None:
        acc = {d: mx[d] + float(dismax_tie) * (acc[d] - mx[d]) for d in acc}
    items = list(acc.items())
    if after is not None:
        a_s, a_d = np.float32(after[0]), int(after[1])
        items = [
            (d, s) for d, s in items
            if np.float32(s) < a_s or (np.float32(s) == a_s and d > a_d)
        ]
    ranked = sorted(items, key=lambda kv: (-np.float32(kv[1]), kv[0]))
    return [(idx.doc_keys[d], float(np.float32(s))) for d, s in ranked[:k]]


def terms_in_order(terms: list[str]) -> list[str]:
    return list(terms)


def _phrase_match(idx: OracleIndex, terms: list[str]) -> set[int]:
    """Exact-phrase docids: positions of term i+1 == positions of term i + 1."""
    if not terms:
        return set()
    first = idx.postings.get(terms[0], {})
    out = set()
    for d in first:
        starts = set(first[d][1])
        ok = True
        for off, t in enumerate(terms[1:], start=1):
            plist = idx.postings.get(t, {})
            if d not in plist:
                ok = False
                break
            starts &= {p - off for p in plist[d][1]}
            if not starts:
                ok = False
                break
        if ok and starts:
            out.add(d)
    return out


def count_matches(idx: OracleIndex, terms: list[str], mode: str = "or") -> int:
    """totalHits analogue (reference: SimpleFDBDirectoryTest.java:155)."""
    return len(search(idx, terms, k=idx.n_docs or 1, mode=mode))


def boolean_search(
    rows: list[dict],
    key_col: str,
    clauses: list[dict],
    k: int,
    min_should_match: int | None = None,
    numeric: list[dict] | None = None,
    keyword_fields: tuple[str, ...] = (),
    after: tuple[float, int] | None = None,
    dismax_tie: float | None = None,
) -> list[tuple]:
    """Naive multi-field BooleanQuery referee (Lucene semantics) for
    Searcher.search_boolean: occur in must|should|filter|must_not,
    minimum_should_match, numeric range predicates. rows are plain
    dicts; docid = row position (must mirror the engine's docID
    assignment in the test). Per-field stats match the engine/Lucene:
    n_docs and avgdl count only docs that HAVE the field (>=1 token),
    norms are SmallFloat-quantized."""
    fields = sorted({c.get("field", "text") for c in clauses})
    tok: dict[str, list[list[str]]] = {}
    for f in fields:
        if f in keyword_fields:
            tok[f] = [[r[f]] if r.get(f) is not None else [] for r in rows]
        else:
            tok[f] = [tokenize_text(r.get(f) or "") for r in rows]
    stats = {}
    for f in fields:
        dls = np.array([len(ts) for ts in tok[f]], dtype=np.int64)
        nd = int((dls > 0).sum())
        stats[f] = {
            "n_docs": nd,
            "avgdl": float(dls.sum()) / nd if nd else 0.0,
            "dlq": bm25.quantize_doclen(np.maximum(dls, 1)),
            "dls": dls,
        }

    def matches(f: str, t: str) -> dict[int, int]:
        return {
            i: ts.count(t) for i, ts in enumerate(tok[f]) if stats[f]["dls"][i] > 0 and t in ts
        }

    def scores_of(f: str, t: str) -> dict[int, float]:
        m = matches(f, t)
        if not m:
            return {}
        st = stats[f]
        ids = np.fromiter(m.keys(), dtype=np.int64, count=len(m))
        tfs = np.fromiter(m.values(), dtype=np.int64, count=len(m))
        s = bm25.term_score(tfs, st["dlq"][ids], len(m), st["n_docs"], st["avgdl"])
        return dict(zip(ids.tolist(), s.tolist()))

    norm: dict[str, list] = {o: [] for o in ("must", "should", "filter", "must_not")}
    pnorm: dict[str, list] = {o: [] for o in ("must", "should", "filter", "must_not")}
    snorm: dict[str, list] = {o: [] for o in ("must", "should", "filter", "must_not")}
    ynorm: dict[str, list] = {o: [] for o in ("must", "should", "filter", "must_not")}
    for c in clauses:
        if "clauses" in c:
            occ = c.get("occur", "should")
            snorm[occ].append(c)
    # fields referenced only inside nested sub-queries (at any depth)
    # still need stats
    def _walk_fields(cl_list, acc):
        for sc in cl_list:
            acc.add(sc.get("field", "text"))
            if "clauses" in sc:
                _walk_fields(sc["clauses"], acc)

    _subf: set = set()
    for subs in snorm.values():
        for c in subs:
            _walk_fields(c["clauses"], _subf)
    sub_fields = sorted(_subf - set(fields))
    for f in sub_fields:
        if f in keyword_fields:
            tok[f] = [[r[f]] if r.get(f) is not None else [] for r in rows]
        else:
            tok[f] = [tokenize_text(r.get(f) or "") for r in rows]
        dls = np.array([len(ts) for ts in tok[f]], dtype=np.int64)
        nd = int((dls > 0).sum())
        stats[f] = {
            "n_docs": nd,
            "avgdl": float(dls.sum()) / nd if nd else 0.0,
            "dlq": bm25.quantize_doclen(np.maximum(dls, 1)),
            "dls": dls,
        }
    boosts: dict[tuple, float] = {}
    for c in clauses:
        if "clauses" in c:
            continue
        occ = c.get("occur", "should")
        f = c.get("field", "text")
        if "phrase" in c:
            pnorm[occ].append((f, tuple(c["phrase"])))
            if c.get("boost", 1.0) != 1.0:
                boosts[(occ, f, tuple(c["phrase"]))] = float(c["boost"])
            continue
        if "synonym" in c:
            syn = tuple(sorted(set(c["synonym"])))
            ynorm[occ].append((f, syn))
            if c.get("boost", 1.0) != 1.0:
                boosts[(occ, f, syn)] = float(c["boost"])
            continue
        norm[occ].append((f, c["term"]))
        if c.get("boost", 1.0) != 1.0:
            boosts[(occ, f, c["term"])] = float(c["boost"])

    def phrase_matches(f: str, terms: tuple) -> set[int]:
        n = len(terms)
        out = set()
        for i, ts in enumerate(tok[f]):
            if stats[f]["dls"][i] <= 0:
                continue
            for j in range(len(ts) - n + 1):
                if tuple(ts[j : j + n]) == terms:
                    out.add(i)
                    break
        return out

    def phrase_scores(occ: str, f: str, terms: tuple) -> dict[int, float]:
        # PhraseQuery-in-BooleanQuery: doc matches iff the tokens occur
        # consecutively; clause value = float64 sum of the unique
        # terms' float32 BM25 scores on that doc (same as mode=phrase)
        if any(not matches(f, t) for t in set(terms)):
            return {}
        hit = phrase_matches(f, terms)
        if not hit:
            return {}
        b = boosts.get((occ, f, terms))
        per = {}
        for t in dict.fromkeys(terms):
            m = matches(f, t)
            st = stats[f]
            ids = np.fromiter(m.keys(), dtype=np.int64, count=len(m))
            tfs = np.fromiter(m.values(), dtype=np.int64, count=len(m))
            w = np.float32(bm25.idf(float(len(m)), st["n_docs"]))
            if b is not None:
                w = np.float32(np.float32(b) * w)
            sc = (w * bm25.tf_norm(tfs, st["dlq"][ids], st["avgdl"])).astype(np.float32)
            per[t] = dict(zip(ids.tolist(), sc.tolist()))
        return {
            d: float(sum(float(per[t].get(d, 0.0)) for t in dict.fromkeys(terms)))
            for d in hit
        }

    def boosted(occ, f, t):
        # BoostQuery: weight = float32(boost) * float32(idf) is folded
        # BEFORE tf_norm (Lucene precomputes the scorer weight), so the
        # float32 association must match the engine's kernel
        m = matches(f, t)
        if not m:
            return {}
        b = boosts.get((occ, f, t))
        st = stats[f]
        ids = np.fromiter(m.keys(), dtype=np.int64, count=len(m))
        tfs = np.fromiter(m.values(), dtype=np.int64, count=len(m))
        w = np.float32(bm25.idf(float(len(m)), st["n_docs"]))
        if b is not None:
            w = np.float32(np.float32(b) * w)
        sc = (w * bm25.tf_norm(tfs, st["dlq"][ids], st["avgdl"])).astype(np.float32)
        return dict(zip(ids.tolist(), sc.tolist()))

    def synonym_scores(occ: str, f: str, terms: tuple) -> dict[int, float]:
        # SynonymQuery-in-BooleanQuery (Lucene 8 SynonymQuery.
        # createWeight): ONE blended weight f32(boost * idf(MAX member
        # df)); per-doc tf = SUM of member freqs scored through a
        # single BM25 leaf — never a per-member idf sum
        per = {t: matches(f, t) for t in terms}
        dfs = [len(m) for m in per.values() if m]
        if not dfs:
            return {}
        st = stats[f]
        b = boosts.get((occ, f, terms))
        w = np.float32(bm25.idf(float(max(dfs)), st["n_docs"]))
        if b is not None:
            w = np.float32(np.float32(b) * w)
        tsum: dict[int, int] = {}
        for m in per.values():
            for d, tf in m.items():
                tsum[d] = tsum.get(d, 0) + tf
        ids = np.fromiter(tsum.keys(), dtype=np.int64, count=len(tsum))
        tfs = np.fromiter(tsum.values(), dtype=np.int64, count=len(tsum))
        sc = (w * bm25.tf_norm(tfs, st["dlq"][ids], st["avgdl"])).astype(np.float32)
        return dict(zip(ids.tolist(), sc.tolist()))

    def _inner_synonym(f2, terms, tb):
        per = {t: matches(f2, t) for t in terms}
        dfs = [len(m) for m in per.values() if m]
        if not dfs:
            return {}
        st = stats[f2]
        w = np.float32(bm25.idf(float(max(dfs)), st["n_docs"]))
        if tb != 1.0:
            w = np.float32(np.float32(tb) * w)
        tsum: dict[int, int] = {}
        for m in per.values():
            for d, tf in m.items():
                tsum[d] = tsum.get(d, 0) + tf
        ids = np.fromiter(tsum.keys(), dtype=np.int64, count=len(tsum))
        tfs = np.fromiter(tsum.values(), dtype=np.int64, count=len(tsum))
        sc = (w * bm25.tf_norm(tfs, st["dlq"][ids], st["avgdl"])).astype(np.float32)
        return dict(zip(ids.tolist(), sc.tolist()))

    def _inner_term(f2, t2, tb):
        m = matches(f2, t2)
        if not m:
            return {}
        st = stats[f2]
        ids = np.fromiter(m.keys(), dtype=np.int64, count=len(m))
        tfs = np.fromiter(m.values(), dtype=np.int64, count=len(m))
        w = np.float32(bm25.idf(float(len(m)), st["n_docs"]))
        if tb != 1.0:
            w = np.float32(np.float32(tb) * w)
        sc = (w * bm25.tf_norm(tfs, st["dlq"][ids], st["avgdl"])).astype(np.float32)
        return dict(zip(ids.tolist(), sc.tolist()))

    def _inner_phrase(f2, terms, tb):
        # PhraseQuery nested in a sub-query: same contract as
        # phrase_scores but with the accumulated boost product folded
        # into each unique term's float32 weight
        if any(not matches(f2, t) for t in set(terms)):
            return {}
        hit = phrase_matches(f2, tuple(terms))
        if not hit:
            return {}
        per = {}
        for t in dict.fromkeys(terms):
            m = matches(f2, t)
            st = stats[f2]
            ids = np.fromiter(m.keys(), dtype=np.int64, count=len(m))
            tfs = np.fromiter(m.values(), dtype=np.int64, count=len(m))
            w = np.float32(bm25.idf(float(len(m)), st["n_docs"]))
            if tb != 1.0:
                w = np.float32(np.float32(tb) * w)
            sc = (w * bm25.tf_norm(tfs, st["dlq"][ids], st["avgdl"])).astype(np.float32)
            per[t] = dict(zip(ids.tolist(), sc.tolist()))
        return {
            d: float(sum(float(per[t].get(d, 0.0)) for t in dict.fromkeys(terms)))
            for d in hit
        }

    def _eval_node(cl_list, b_out, msm_in, tie_in) -> dict[int, float]:
        """Nested BooleanQuery node, recursive (any depth): membership
        = its own must/filter/must_not/min_should_match evaluation;
        value = float64 sum of matched scoring clauses (or their
        dismax combine when the node carries dismax_tie). The
        accumulated boost product folds into every leaf weight (Lucene
        BoostQuery rewrite)."""
        s_must, s_should, s_filter, s_ex = [], [], [], set()
        for sc_ in cl_list:
            occ2 = sc_.get("occur", "should")
            f2 = sc_.get("field", "text")
            tb = b_out * float(sc_.get("boost", 1.0))
            if "phrase" in sc_:
                m2 = _inner_phrase(f2, tuple(sc_["phrase"]), tb)
            elif "synonym" in sc_:
                m2 = _inner_synonym(f2, tuple(sorted(set(sc_["synonym"]))), tb)
            elif "clauses" in sc_:
                m2 = _eval_node(sc_["clauses"], tb, sc_.get("min_should_match"),
                                sc_.get("dismax_tie"))
            else:
                m2 = _inner_term(f2, sc_["term"], tb)
            if occ2 == "must_not":
                s_ex |= set(m2)
            elif occ2 == "filter":
                s_filter.append(set(m2))
            else:
                (s_must if occ2 == "must" else s_should).append(m2)
        if any(not m for m in s_must) or any(not fs for fs in s_filter):
            return {}
        has_c = bool(s_must or s_filter)
        msm_s = msm_in if msm_in is not None else (0 if has_c else 1)
        member = set(range(len(rows))) - s_ex
        for m in s_must:
            member &= set(m)
        for fs in s_filter:
            member &= fs
        if not has_c:
            union = set()
            for m in s_should:
                union |= set(m)
            member &= union
        out2 = {}
        for d in member:
            sh = sum(1 for m in s_should if d in m)
            if sh < msm_s:
                continue
            vals = [float(m[d]) for m in s_must + s_should if d in m]
            if tie_in is not None and vals:
                mx = max(vals)
                out2[d] = mx + tie_in * (sum(vals) - mx)
            else:
                out2[d] = float(sum(vals))
        return out2

    def sub_scores(c: dict) -> dict[int, float]:
        return _eval_node(c["clauses"], float(c.get("boost", 1.0)),
                          c.get("min_should_match"), c.get("dismax_tie"))
    has_constraint = bool(
        norm["must"] or norm["filter"] or pnorm["must"] or pnorm["filter"]
        or snorm["must"] or snorm["filter"] or ynorm["must"] or ynorm["filter"]
        or numeric
    )
    msm = min_should_match if min_should_match is not None else (0 if has_constraint else 1)

    excluded = set()
    for f, t in norm["must_not"]:
        excluded |= set(matches(f, t))
    for f, terms in pnorm["must_not"]:
        excluded |= set(phrase_scores("must_not", f, terms))
    for c in snorm["must_not"]:
        excluded |= set(sub_scores(c))
    for f, terms in ynorm["must_not"]:
        excluded |= set(synonym_scores("must_not", f, terms))
    allowed = set(range(len(rows)))
    for cl in numeric or []:
        lo, hi = cl.get("lo"), cl.get("hi")
        allowed &= {
            i
            for i, r in enumerate(rows)
            if r.get(cl["field"]) is not None
            and (lo is None or r[cl["field"]] >= lo)
            and (hi is None or r[cl["field"]] <= hi)
        }
    must_scores = (
        [boosted("must", f, t) for f, t in norm["must"]]
        + [phrase_scores("must", f, terms) for f, terms in pnorm["must"]]
        + [sub_scores(c) for c in snorm["must"]]
        + [synonym_scores("must", f, terms) for f, terms in ynorm["must"]]
    )
    if any(not m for m in must_scores):
        return []
    filter_sets = (
        [set(matches(f, t)) for f, t in norm["filter"]]
        + [set(phrase_scores("filter", f, terms)) for f, terms in pnorm["filter"]]
        + [set(sub_scores(c)) for c in snorm["filter"]]
        + [set(synonym_scores("filter", f, terms)) for f, terms in ynorm["filter"]]
    )
    should_scores = (
        [boosted("should", f, t) for f, t in norm["should"]]
        + [phrase_scores("should", f, terms) for f, terms in pnorm["should"]]
        + [sub_scores(c) for c in snorm["should"]]
        + [synonym_scores("should", f, terms) for f, terms in ynorm["should"]]
    )

    cand = allowed - excluded
    for fs in filter_sets:
        cand &= fs
    for m in must_scores:
        cand &= set(m)
    if not has_constraint and numeric is None:
        union = set()
        for m in should_scores:
            union |= set(m)
        cand &= union
    out = []
    for d in cand:
        sh = sum(1 for m in should_scores if d in m)
        if sh < max(msm, 0 if has_constraint else 1):
            continue
        acc = 0.0
        mx = 0.0
        for m in must_scores + should_scores:
            if d in m:
                acc += m[d]  # float64 sum of float32 addends
                mx = max(mx, m[d])
        if dismax_tie is not None:
            acc = mx + float(dismax_tie) * (acc - mx)
        out.append((d, float(np.float32(acc))))
    out.sort(key=lambda kv: (-np.float32(kv[1]), kv[0]))
    if after is not None:
        a_s, a_d = np.float32(after[0]), int(after[1])
        out = [
            (d, s) for d, s in out
            if (np.float32(s) < a_s) or (np.float32(s) == a_s and d > a_d)
        ]
    return [(rows[d][key_col], s) for d, s in out[:k]]
