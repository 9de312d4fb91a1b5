"""Lucene Intervals algebra (org.apache.lucene.queries.intervals —
the modern proximity-query surface that superseded the spans module).

An IntervalsSource yields, per document, its set of MINIMAL matching
intervals (Clarke & Cormack minimal-interval semantics, the contract
Lucene's IntervalIterator documents): every returned interval
contains a match and no proper sub-interval that also matches is
omitted — equivalently the result is the containment-free antichain
of all matching intervals. Sources compose:

    {"term": "x"}                              Intervals.term
    {"ordered": [src, ...]}                    Intervals.ordered
    {"unordered": [term-src, ...]}             Intervals.unordered
    {"or": [src, ...]}                         Intervals.or
    {"phrase": ["a", "b", ...]}                Intervals.phrase
    {"containing": [big, small]}               Intervals.containing
    {"not_containing": [big, small]}           Intervals.notContaining
    {"contained_by": [small, big]}             Intervals.containedBy
    {"not_contained_by": [small, big]}         Intervals.notContainedBy
    {"before": [src, reference]}               Intervals.before
    {"after": [src, reference]}                Intervals.after
    {"overlapping": [src, reference]}          Intervals.overlapping
    {"non_overlapping": [src, reference]}      Intervals.nonOverlapping
    plus "max_gaps": g on any composite        Intervals.maxgaps

The reference-filter ops keep src intervals for which SOME reference
interval satisfies the relation: before = src.end < ref.start;
after = src.start > ref.end; overlapping = the closed intervals
intersect.

Subset limitations (documented, enforced by validate()): `unordered`
children must be plain terms — the same restriction the engine's
SpanNear unordered matcher makes (query.py:_span_near_filter); the
analytic leaves (prefix/wildcard/fuzzed) are served by expanding
against the termdict into an `or` of term sources, exactly how the
MultiTermQuery surfaces already rewrite.

Everything here is vectorized over ALL candidate documents at once
with packed int64 keys (doc << shift | position) — one numpy pass
per operator node, no per-document Python loop. The packing is safe
because `shift` leaves headroom above the corpus max position, so a
(start, end) pair of the same document subtracts to the position
delta and keys of different documents never satisfy a containment
comparison (later docs pack strictly larger).

Interval sets are represented as three parallel int64 arrays
(ps, pe, w): packed start, packed end, and the sum of the child
span lengths `w` used by the max_gaps filter — for an ordered source
gaps = (end - start + 1) - w, Lucene's OrderedIntervalsSource.gaps()
(the sum of the inter-child gaps). Every operator returns arrays
sorted ascending by ps; because a per-document minimal set is a
containment-free antichain, pe is then ascending too — the invariant
each combinator exploits.

Reference: the reference delegates all query semantics to Lucene 8.x
(/root/reference/README.md:53, pom.xml lucene-core dependency);
intervals are part of that delegated surface (lucene queries module).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

_EMPTY = np.empty(0, dtype=np.int64)

_PAIR_OPS = (
    "containing", "not_containing", "contained_by", "not_contained_by",
    "before", "after", "overlapping", "non_overlapping",
)
_OPS = ("term", "ordered", "unordered", "or", "phrase") + _PAIR_OPS


def validate(source) -> None:
    """Structural validation, raising ValueError with the offending
    node — run once driver-side before any Spark job is planned."""
    if not isinstance(source, dict):
        raise ValueError(f"interval source must be a dict, got {type(source).__name__}")
    keys = [k for k in source if k != "max_gaps"]
    if len(keys) != 1 or keys[0] not in _OPS:
        raise ValueError(f"interval source needs exactly one of {_OPS}: {source}")
    op = keys[0]
    if "max_gaps" in source:
        g = source["max_gaps"]
        if op == "term":
            raise ValueError("max_gaps on a term source is meaningless")
        if not isinstance(g, int) or g < 0:
            raise ValueError(f"max_gaps must be an int >= 0, got {g!r}")
    body = source[op]
    if op == "term":
        if not isinstance(body, str) or not body:
            raise ValueError(f"term source needs a non-empty string, got {body!r}")
        return
    if op == "phrase":
        if (not isinstance(body, (list, tuple)) or len(body) < 2
                or not all(isinstance(t, str) and t for t in body)):
            raise ValueError(f"phrase needs >= 2 term strings, got {body!r}")
        return
    if not isinstance(body, (list, tuple)) or not body:
        raise ValueError(f"{op} needs a non-empty child list")
    if op in _PAIR_OPS and len(body) != 2:
        raise ValueError(f"{op} needs exactly 2 children, got {len(body)}")
    if op == "unordered":
        for c in body:
            if not (isinstance(c, dict) and set(c) == {"term"}):
                raise ValueError(
                    f"unordered children must be plain term sources, got {c!r}"
                )
    for c in body:
        validate(c)


def leaf_terms(source) -> list[str]:
    """Every distinct term the source touches, first-seen order."""
    out: dict[str, None] = {}

    def walk(s):
        op = next(k for k in s if k != "max_gaps")
        if op == "term":
            out[s[op]] = None
        elif op == "phrase":
            for t in s[op]:
                out[t] = None
        else:
            for c in s[op]:
                walk(c)

    walk(source)
    return list(out)


def _antichain_tail(ps, pe, w):
    """Minimality for monotone candidate streams (starts asc, ends
    non-decreasing): for each distinct end keep the LAST candidate —
    the max start — which is exactly the containment-free antichain."""
    if ps.size == 0:
        return ps, pe, w
    keep = np.r_[pe[1:] != pe[:-1], True]
    return ps[keep], pe[keep], w[keep]


def _merge_minimal(parts):
    """Union of interval sets -> minimal antichain (Intervals.or).
    Sort (start asc, end desc); a candidate is non-minimal iff some
    LATER candidate has end <= its end (that one starts >= it, so it
    is contained — equal twins keep exactly one survivor)."""
    parts = [p for p in parts if p[0].size]
    if not parts:
        return _EMPTY, _EMPTY, _EMPTY
    ps = np.concatenate([p[0] for p in parts])
    pe = np.concatenate([p[1] for p in parts])
    w = np.concatenate([p[2] for p in parts])
    order = np.lexsort((-pe, ps))
    ps, pe, w = ps[order], pe[order], w[order]
    suf = np.minimum.accumulate(pe[::-1])[::-1]
    keep = np.r_[pe[:-1] < suf[1:], True]
    return ps[keep], pe[keep], w[keep]


def evaluate(source, term_keys: dict[str, np.ndarray], shift: int):
    """Evaluate a validated source against packed, sorted position
    keys (one array per term, np.sort((doc << shift) | pos)). Returns
    (ps, pe, w) — the minimal interval set across every candidate
    document, sorted ascending."""
    op = next(k for k in source if k != "max_gaps")
    body = source[op]
    if op == "phrase":
        ps, pe, w = evaluate(
            {"ordered": [{"term": t} for t in body], "max_gaps": 0}, term_keys, shift
        )
    elif op == "term":
        ks = term_keys.get(body, _EMPTY)
        ps, pe, w = ks, ks, np.ones(ks.size, dtype=np.int64)
    elif op == "or":
        ps, pe, w = _merge_minimal([evaluate(c, term_keys, shift) for c in body])
    elif op == "ordered":
        cs, ce, cw = evaluate(body[0], term_keys, shift)
        # span length of the child interval itself, not its leaf count:
        # the parent's gaps are the holes BETWEEN child intervals
        cw = ce - cs + 1
        ok = np.ones(cs.size, dtype=bool)
        for child in body[1:]:
            if not ok.any():
                break
            s1, e1, _ = evaluate(child, term_keys, shift)
            if s1.size == 0:
                ok[:] = False
                break
            # greedy minimal chain: the first child interval starting
            # strictly after the current end is, in an antichain, also
            # the one with the smallest end
            idx = np.searchsorted(s1, ce + 1, side="left")
            valid = ok & (idx < s1.size)
            ii = np.minimum(idx, s1.size - 1)
            valid &= (s1[ii] >> shift) == (cs >> shift)
            ce = np.where(valid, e1[ii], ce)
            cw = cw + np.where(valid, e1[ii] - s1[ii] + 1, 0)
            ok = valid
        ps, pe, w = _antichain_tail(cs[ok], ce[ok], cw[ok])
    elif op == "unordered":
        need = Counter(c["term"] for c in body)
        arrs = {t: term_keys.get(t, _EMPTY) for t in need}
        if any(arrs[t].size < m for t, m in need.items()):
            ps, pe, w = _EMPTY, _EMPTY, _EMPTY
        else:
            starts = np.unique(np.concatenate([arrs[t] for t in need]))
            end = np.full(starts.size, np.iinfo(np.int64).min, dtype=np.int64)
            ok = np.ones(starts.size, dtype=bool)
            for t, m in need.items():
                kt = arrs[t]
                # the m-th occurrence of t at or after each start
                idx = np.searchsorted(kt, starts, side="left") + (m - 1)
                valid = idx < kt.size
                e = kt[np.minimum(idx, kt.size - 1)]
                valid &= (e >> shift) == (starts >> shift)
                ok &= valid
                end = np.maximum(end, np.where(valid, e, np.iinfo(np.int64).min))
            ps, pe, w = _antichain_tail(
                starts[ok], end[ok], np.full(int(ok.sum()), len(body), dtype=np.int64)
            )
    else:
        a_src, b_src = body
        aps, ape, aw = evaluate(a_src, term_keys, shift)
        bps, bpe, _ = evaluate(b_src, term_keys, shift)
        if op in ("containing", "not_containing"):
            # big contains SOME small: among smalls starting at or
            # after big.start, the minimum end (suffix min; packed
            # keys make cross-document candidates fail the <= check)
            if bps.size == 0:
                hit = np.zeros(aps.size, dtype=bool)
            else:
                suf = np.minimum.accumulate(bpe[::-1])[::-1]
                idx = np.searchsorted(bps, aps, side="left")
                inb = idx < bps.size
                hit = inb & (suf[np.minimum(idx, bps.size - 1)] <= ape)
            keep = hit if op == "containing" else ~hit
        elif op in ("contained_by", "not_contained_by"):
            # small contained by SOME big: among bigs starting at or
            # before small.start, the maximum end (prefix max)
            if bps.size == 0:
                hit = np.zeros(aps.size, dtype=bool)
            else:
                pre = np.maximum.accumulate(bpe)
                idx = np.searchsorted(bps, aps, side="right") - 1
                inb = idx >= 0
                hit = inb & (pre[np.maximum(idx, 0)] >= ape)
            keep = hit if op == "contained_by" else ~hit
        elif op == "before":
            # src ends before SOME reference starts: the first
            # reference start strictly after src.end, same document
            if bps.size == 0:
                keep = np.zeros(aps.size, dtype=bool)
            else:
                idx = np.searchsorted(bps, ape + 1, side="left")
                inb = idx < bps.size
                ii = np.minimum(idx, bps.size - 1)
                keep = inb & ((bps[ii] >> shift) == (aps >> shift))
        elif op == "after":
            # src starts after SOME reference ends: the last
            # reference end strictly before src.start, same document
            if bpe.size == 0:
                keep = np.zeros(aps.size, dtype=bool)
            else:
                idx = np.searchsorted(bpe, aps, side="left") - 1
                inb = idx >= 0
                ii = np.maximum(idx, 0)
                keep = inb & ((bpe[ii] >> shift) == (aps >> shift))
        else:
            # overlapping: SOME reference with ref.start <= src.end
            # and ref.end >= src.start — among references starting at
            # or before src.end, the maximum end (prefix max; packed
            # keys age out cross-document candidates on the >= check)
            if bps.size == 0:
                hit = np.zeros(aps.size, dtype=bool)
            else:
                pre = np.maximum.accumulate(bpe)
                idx = np.searchsorted(bps, ape, side="right") - 1
                inb = idx >= 0
                hit = inb & (pre[np.maximum(idx, 0)] >= aps)
            keep = hit if op == "overlapping" else ~hit
        ps, pe, w = aps[keep], ape[keep], aw[keep]
    if "max_gaps" in source and ps.size:
        keep = (pe - ps + 1 - w) <= source["max_gaps"]
        ps, pe, w = ps[keep], pe[keep], w[keep]
    return ps, pe, w


def match_docs(source, term_keys: dict[str, np.ndarray], shift: int) -> np.ndarray:
    """Distinct docIDs holding at least one interval of the source."""
    ps, _, _ = evaluate(source, term_keys, shift)
    return np.unique(ps >> shift) if ps.size else _EMPTY
