"""Lucene FeatureField scoring functions as FunctionScoreQuery
transforms.

Lucene 8's FeatureField stores static rank signals (pagerank, quality
score, recency) in a postings slot and queries them through three
fixed functions (FeatureField.newSaturationQuery / newLogQuery /
newSigmoidQuery). Here the signal lives in the index-owned STORED
table (the engine's doc-values slot) and the same three functions are
Column transforms for `Searcher.search_function_score(..., 
combine="add", transform=...)` — identical score surfaces, different
storage residency (Lucene trades exactness for impact-skipping by
quantizing the float into a 16-bit freq; the stored slot keeps the
exact value and the kernel's block-max pruning covers the text
clauses instead).

Each returns double (DoubleValuesSource contract); values must be
positive finite like FeatureField's.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def saturation(weight: float = 1.0, pivot: float = 1.0):
    """S(v) = weight * v / (v + pivot) — FeatureField.newSaturationQuery."""
    w, p = float(weight), float(pivot)
    if p <= 0:
        raise ValueError("pivot must be positive")
    return lambda c: F.lit(w) * c.cast("double") / (c.cast("double") + F.lit(p))


def log(weight: float = 1.0, scaling: float = 1.0):
    """S(v) = weight * ln(scaling + v) — FeatureField.newLogQuery."""
    w, s = float(weight), float(scaling)
    if s <= 0:
        raise ValueError("scaling must be positive")
    return lambda c: F.lit(w) * F.log(F.lit(s) + c.cast("double"))


def distance_feature(weight: float, origin: float, pivot: float):
    """S(v) = weight * pivot / (pivot + |v - origin|) — Lucene 8's
    LongPoint.newDistanceFeatureQuery (LongDistanceFeatureQuery):
    boost-by-recency / boost-by-proximity on a numeric slot. The score
    is maximal (= weight) at v == origin and halves at distance ==
    pivot; docs missing the field contribute the add identity (0),
    matching the query's "documents without the field never match"
    contract when composed as a SHOULD clause."""
    w, o, p = float(weight), float(origin), float(pivot)
    if p <= 0:
        raise ValueError("pivot must be positive")
    return lambda c: (
        F.lit(w) * F.lit(p) / (F.lit(p) + F.abs(c.cast("double") - F.lit(o)))
    )


def sigmoid(weight: float = 1.0, pivot: float = 1.0, a: float = 1.0):
    """S(v) = weight * v^a / (v^a + pivot^a) — FeatureField.newSigmoidQuery."""
    w, p, aa = float(weight), float(pivot), float(a)
    if p <= 0 or aa <= 0:
        raise ValueError("pivot and a must be positive")
    return lambda c: (
        F.lit(w) * F.pow(c.cast("double"), F.lit(aa))
        / (F.pow(c.cast("double"), F.lit(aa)) + F.lit(p ** aa))
    )
