"""Golden tests pinning the Lucene-8-exact scoring math.

These constants are the rank-identity contract (SURVEY.md section
7.4): if any of them drifts, engine and oracle would drift together
silently — so the expected values are hard-coded here, independently
derived from the published Lucene 8 SmallFloat/BM25Similarity
algorithms.
"""

import math

import numpy as np

from fdblucene_spark.functions import bm25


def test_smallfloat_free_values():
    # 255 - longToInt4(Integer.MAX_VALUE) = 255 - 231 = 24
    assert bm25.NUM_FREE_VALUES == 24
    x = np.arange(24)
    assert np.array_equal(bm25.int_to_byte4(x), x)
    assert np.array_equal(bm25.byte4_to_int(x), x)


def test_smallfloat_golden_values():
    enc = bm25.int_to_byte4(np.array([24, 25, 26, 40, 100, 1000, 10_000, 2**31 - 1]))
    assert enc.tolist() == [24, 25, 26, 40, 57, 87, 113, 255]
    dec = bm25.byte4_to_int(enc)
    # e.g. 255: 24 + int4ToLong(231) = 24 + (0x0F << 27) = 2013265944
    assert dec.tolist() == [24, 25, 26, 40, 96, 984, 9240, 2013265944]


def test_smallfloat_laws():
    x = np.unique(np.concatenate([
        np.arange(0, 300),
        np.logspace(2, 9, 200).astype(np.int64),
    ]))
    enc = bm25.int_to_byte4(x)
    dec = bm25.byte4_to_int(enc)
    assert np.all(dec <= x)                      # decode never exceeds input
    assert np.all(np.diff(enc) >= 0)             # order-preserving
    assert np.array_equal(bm25.int_to_byte4(dec), enc)  # idempotent fixpoint


def test_length_table():
    assert bm25.LENGTH_TABLE.shape == (256,)
    assert bm25.LENGTH_TABLE[0] == 0
    assert np.all(np.diff(bm25.LENGTH_TABLE) > 0)


def test_idf_formula():
    # ln(1 + (N - df + 0.5)/(df + 0.5)), float32
    n, df = 1000, 7
    expected = math.log(1 + (n - df + 0.5) / (df + 0.5))
    assert abs(float(bm25.idf(df, n)) - expected) < 1e-6


def test_tf_norm_no_k1_plus_1_numerator():
    # Lucene 8 removed the (k1+1) numerator: tf_norm(tf→inf) → 1.0
    big = bm25.tf_norm(np.array([10**9]), np.array([30]), avgdl=50.0)
    assert 0.999 < float(big[0]) <= 1.0


def test_tf_norm_uses_quantized_length():
    # dl=100 quantizes to byte 57 which decodes to 96 — the score must
    # use 96, not 100
    avgdl = 50.0
    got = float(bm25.tf_norm(np.array([3]), bm25.int_to_byte4(np.array([100])), avgdl)[0])
    want = 3.0 / (3.0 + bm25.K1 * (1 - bm25.B + bm25.B * 96 / avgdl))
    assert abs(got - want) < 1e-7


def test_max_block_score_is_upper_bound():
    rng = np.random.default_rng(5)
    n_docs, avgdl, df = 10_000, 64.0, 500
    tf = rng.integers(1, 40, size=1000)
    dlq = rng.integers(0, 200, size=1000)
    scores = bm25.term_score(tf, dlq, df, n_docs, avgdl)
    ub = bm25.max_block_score(
        np.array([tf.max()]), np.array([dlq.min()]), np.array([df]), n_docs, avgdl
    )
    assert float(ub[0]) >= float(scores.max())


def test_combine_scores_float32_of_float64_sum():
    parts = [np.array([0.1], dtype=np.float32), np.array([0.2], dtype=np.float32)]
    got = bm25.combine_scores(parts)
    assert got.dtype == np.float32
    assert abs(float(got[0]) - np.float32(np.float64(np.float32(0.1)) + np.float64(np.float32(0.2)))) == 0


def test_norm_cache_is_float32_like_lucene():
    """Lucene 8 BM25Similarity keeps the per-norm cache in a float[]
    (float32 at every arithmetic step, avgdl itself a float). Golden-
    pins the float32 chain so neither engine nor oracle can silently
    drift back to a float64 cache (which differs by last-ulp amounts
    that flip near-tie ranks vs real Lucene)."""
    avgdl = 57.3219
    cache = bm25.norm_cache32(avgdl)
    assert cache.dtype == np.float32
    # golden bit patterns for a handful of entries (computed once from
    # the float32 chain; a float64 cache rounds differently)
    golden = {
        0: np.float32(1.2) * (np.float32(0.25) + np.float32(0.75) * np.float32(0.0) / np.float32(avgdl)),
        1: np.float32(0.3157008),
        255: np.float32(31609898.0),
    }
    for i, want in golden.items():
        assert cache[i].view(np.int32) == np.float32(want).view(np.int32), i
    # float64 chain must NOT match everywhere (the bug being pinned out)
    f64 = bm25.K1 * (1.0 - bm25.B + bm25.B * bm25.LENGTH_TABLE.astype(np.float64) / avgdl)
    assert (cache != f64.astype(np.float32)).any()
    # tf_norm consumes the float32 cache through a double division
    tfn = bm25.tf_norm(np.array([3]), np.array([1]), avgdl)
    want = np.float32(3.0 / (3.0 + float(cache[1])))
    assert tfn[0].view(np.int32) == want.view(np.int32)
