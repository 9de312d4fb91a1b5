"""Lucene-8-exact BM25 scoring math (numpy-vectorized).

The reference delegates scoring to Lucene 8.1.0's BM25Similarity
(reference: pom.xml:31); the corpus statistics it consumes are exactly
the reference's logical index stats (reference: DATA.md:33-37,47-48).
We rebuild the math from the published Lucene 8 formulas so our top-k
is rank-identical (BASELINE.json north_rule):

- idf(df, N)   = ln(1 + (N - df + 0.5) / (df + 0.5))
- tf_norm      = tf / (tf + k1 * (1 - b + b * dl / avgdl))
  (the (k1+1) numerator was removed in Lucene 8)
- dl is NOT exact: Lucene stores SmallFloat.intToByte4(field_len) as
  the norm byte and decodes with byte4ToInt before scoring
  (reference analogue: norms keyspace ("nv", field, docID) -> long,
  DATA.md:37). avgdl uses the EXACT sums: sumTotalTermFreq/docCount.
- per-term score is float32(float32(idf) * float32(tf_norm)); a
  disjunction sums per-term float32 scores in float64 and casts the
  total back to float32 (Lucene's DisjunctionSumScorer behavior).
- ties break by docID ascending.

Both the engine kernels and the pytest oracle import THIS module, and
a golden test pins the quantization tables, so an accidental change
breaks loudly.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75

# ---------------------------------------------------------------- SmallFloat
# Re-derivation of org.apache.lucene.util.SmallFloat intToByte4 /
# byte4ToInt (Lucene 8): 4-bit-mantissa float-like encoding of ints,
# with the first NUM_FREE_VALUES ints stored exactly.


def _long_to_int4(i: np.ndarray) -> np.ndarray:
    i = i.astype(np.int64)
    out = np.empty_like(i)
    num_bits = np.zeros_like(i)
    nz = i > 0
    # bit length via log2 is unsafe at 2^53; use frexp-free integer loop
    v = i.copy()
    while np.any(v > 0):
        mask = v > 0
        num_bits[mask] += 1
        v[mask] >>= 1
    sub = num_bits < 4
    out[sub] = i[sub]
    shift = num_bits - 4
    enc = (i >> np.maximum(shift, 0)) & 0x07
    out[~sub] = enc[~sub] | ((shift[~sub] + 1) << 3)
    return out


def _int4_to_long(i: np.ndarray) -> np.ndarray:
    i = i.astype(np.int64)
    bits = i & 0x07
    shift = (i >> 3) - 1
    decoded = np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0))
    return decoded


_MAX_INT4 = int(_long_to_int4(np.array([2**31 - 1]))[0])
NUM_FREE_VALUES = 255 - _MAX_INT4


def int_to_byte4(i: np.ndarray) -> np.ndarray:
    """SmallFloat.intToByte4 — quantize a field length to one byte (0..255)."""
    i = np.ascontiguousarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("only positive lengths")
    free = i < NUM_FREE_VALUES
    out = np.empty(i.shape, dtype=np.int64)
    out[free] = i[free]
    rest = i[~free] - NUM_FREE_VALUES
    out[~free] = NUM_FREE_VALUES + _long_to_int4(rest)
    return out.astype(np.int64)


def byte4_to_int(b: np.ndarray) -> np.ndarray:
    """SmallFloat.byte4ToInt — decode the norm byte back to a length."""
    b = np.ascontiguousarray(b, dtype=np.int64)
    free = b < NUM_FREE_VALUES
    out = np.empty(b.shape, dtype=np.int64)
    out[free] = b[free]
    out[~free] = NUM_FREE_VALUES + _int4_to_long(b[~free] - NUM_FREE_VALUES)
    return out


# length decode table, as Lucene caches it (256 entries)
LENGTH_TABLE = byte4_to_int(np.arange(256))


def quantize_doclen(dl: np.ndarray) -> np.ndarray:
    """field length -> norm byte (what we store in the doclen table)."""
    return int_to_byte4(dl)


# ------------------------------------------------------------------- scoring
def idf(df: np.ndarray | float, n_docs: int) -> np.ndarray:
    """Lucene 8 BM25 idf, float32 like BM25Similarity.idfExplain."""
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)).astype(np.float32)


def norm_cache32(avgdl: float) -> np.ndarray:
    """The 256-entry float[] norm cache of Lucene 8 BM25Similarity,
    reproduced op-for-op in float32: Java evaluates
    `k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl)` with float
    arithmetic at every step, avgdl itself being
    `(float) (sumTotalTermFreq / (double) docCount)`
    (BM25Similarity.scorer / avgFieldLength). Keeping the cache in
    float64 (as we did in round 1) drifts by last-ulp amounts that can
    flip near-tie ranks vs real Lucene — pinned by a golden test."""
    avg32 = np.float32(avgdl)
    lt32 = LENGTH_TABLE.astype(np.float32)  # float[] LENGTH_TABLE: 4-bit mantissa, exact
    return (np.float32(K1) * (np.float32(1.0 - B) + np.float32(B) * lt32 / avg32)).astype(
        np.float32
    )


def tf_norm(tf: np.ndarray, dlq: np.ndarray, avgdl: float) -> np.ndarray:
    """tf / (tf + k1*(1-b+b*dl/avgdl)) with dl = LENGTH_TABLE[dlq], float32.

    Matches Lucene 8 BM25Scorer.score: the k1*(...) factor is the
    float[] cache (norm_cache32); the division `freq / (freq + norm)`
    promotes both float32 operands to double and casts back to float.
    """
    denom_add = norm_cache32(avgdl)[np.asarray(dlq, dtype=np.int64)].astype(np.float64)
    tf = np.asarray(tf, dtype=np.float64)  # freq=(float)termFreq, exact for tf < 2^24
    return (tf / (tf + denom_add)).astype(np.float32)


def term_score(tf: np.ndarray, dlq: np.ndarray, df: int, n_docs: int, avgdl: float) -> np.ndarray:
    """Per-posting float32 BM25 score for one term."""
    w = np.float32(idf(float(df), n_docs))
    return (w * tf_norm(tf, dlq, avgdl)).astype(np.float32)


def max_block_score(max_tf: np.ndarray, min_dlq: np.ndarray, df: np.ndarray, n_docs: int, avgdl: float) -> np.ndarray:
    """Upper bound of any posting score inside a block.

    tf_norm is increasing in tf and decreasing in dl, so
    score(tf_i, dl_i) <= idf * tf_norm(max_tf, min_dl); this is the
    per-block max-score metadata the north rule mandates (the Spark
    analogue of Lucene 8 block-max impacts).
    """
    w = idf(df, n_docs).astype(np.float32)
    return (w * tf_norm(max_tf, min_dlq, avgdl)).astype(np.float32)


def combine_scores(per_term_scores: list[np.ndarray]) -> np.ndarray:
    """Disjunction sum: float64 accumulation of float32 addends -> float32."""
    total = np.zeros(per_term_scores[0].shape, dtype=np.float64)
    for s in per_term_scores:
        total += s.astype(np.float64)
    return total.astype(np.float32)
