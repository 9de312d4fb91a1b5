"""Codec property + boundary tests.

Mirrors the reference's page-boundary test strategy
(BoundaryTest.java:43-59: sizes {0,1,P-2..P+2,2P-2..2P+2};
FDBIndexInputTest.java:111-129: randomized geometries) on our
delta+varbyte block codec (FIXTURES.md section 3 vectors).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fdblucene_spark.functions import codec

B = codec.BLOCK_SIZE
BOUNDARY_LENGTHS = [0, 1, B - 2, B - 1, B, B + 1, B + 2, 2 * B - 1, 2 * B, 2 * B + 1]
GAP_PATTERNS = {
    "dense": lambda n: np.ones(n, dtype=np.int64),
    "vb1_edge": lambda n: np.full(n, 127, dtype=np.int64),
    "vb2_lo": lambda n: np.full(n, 128, dtype=np.int64),
    "vb2_edge": lambda n: np.full(n, 16383, dtype=np.int64),
    "vb3_lo": lambda n: np.full(n, 16384, dtype=np.int64),
}


@pytest.mark.parametrize("n", BOUNDARY_LENGTHS)
@pytest.mark.parametrize("pattern", sorted(GAP_PATTERNS))
def test_doc_block_boundaries(n, pattern):
    gaps = GAP_PATTERNS[pattern](n)
    docs = np.cumsum(gaps) if n else np.empty(0, dtype=np.int64)
    assert np.array_equal(codec.decode_doc_block(codec.encode_doc_block(docs)), docs)


@pytest.mark.parametrize("n", BOUNDARY_LENGTHS)
def test_random_docids_in_reference_range(n):
    # docID range [0, 2^31-1) per DATA.md:17
    rng = np.random.default_rng(n)
    docs = np.sort(rng.choice(2**31 - 1, size=n, replace=False)).astype(np.int64)
    assert np.array_equal(codec.decode_doc_block(codec.encode_doc_block(docs)), docs)


@pytest.mark.parametrize("tf_pattern", ["ones", "zipf", "max15"])
def test_tf_block(tf_pattern):
    rng = np.random.default_rng(7)
    n = 257
    if tf_pattern == "ones":
        tfs = np.ones(n, dtype=np.int64)
    elif tf_pattern == "zipf":
        tfs = rng.zipf(1.3, size=n).astype(np.int64)
    else:
        tfs = np.full(n, 2**15, dtype=np.int64)
    assert np.array_equal(codec.decode_tf_block(codec.encode_tf_block(tfs)), tfs)


@given(
    st.lists(st.integers(min_value=0, max_value=2**62 - 1), max_size=400)
)
@settings(max_examples=60, deadline=None)
def test_varbyte_roundtrip_hypothesis(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(codec.varbyte_decode(codec.varbyte_encode(arr)), arr)


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=20),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=40, deadline=None)
def test_positions_roundtrip_hypothesis(pos_lists):
    pos_lists = [sorted(p) for p in pos_lists]
    tfs = np.array([len(p) for p in pos_lists], dtype=np.int64)
    flat = np.array([x for p in pos_lists for x in p], dtype=np.int64)
    enc = codec.encode_positions_block(flat, tfs)
    dec, starts = codec.decode_positions_block(enc, tfs)
    assert np.array_equal(dec, flat)
    assert np.array_equal(starts, np.cumsum(tfs) - tfs)


def test_varbyte_encode_split_matches_individual():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 2**40, size=1000).astype(np.uint64)
    starts = np.sort(rng.choice(np.arange(1, 1000), size=9, replace=False))
    starts = np.concatenate(([0], starts))
    parts = codec.varbyte_encode_split(vals, starts)
    bounds = np.append(starts, 1000)
    for i, p in enumerate(parts):
        assert p == codec.varbyte_encode(vals[bounds[i]: bounds[i + 1]])


def test_pack_blocks_metadata():
    rng = np.random.default_rng(11)
    n = 300
    docs = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n)
    dlq = rng.integers(0, 256, size=n)
    pos_flat = np.sort(rng.integers(0, 1000, size=int(tfs.sum())))
    blocks = codec.pack_blocks(docs, tfs, pos_flat, dlq, block_size=128)
    assert [b["n"] for b in blocks] == [128, 128, 44]
    off = 0
    for b in blocks:
        d = codec.decode_doc_block(b["docs"])
        t = codec.decode_tf_block(b["tfs"])
        q = np.frombuffer(b["dlqs"], dtype=np.uint8)
        assert b["min_doc"] == d[0] and b["max_doc"] == d[-1]
        assert b["max_tf"] == t.max() and b["min_dlq"] == q.min()
        assert np.array_equal(d, docs[off: off + b["n"]])
        assert np.array_equal(t, tfs[off: off + b["n"]])
        off += b["n"]


def test_varbyte_split_cells_matches_per_posting_encoding():
    # The sorted-merge zero-copy path: slicing a block's positions blob
    # at posting boundaries must reproduce the per-posting cells the
    # build writes into the inverted relation (delta restarts at each
    # posting make the slices self-contained).
    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 9, size=200).astype(np.int64)
    total = int(tfs.sum())
    starts = np.cumsum(tfs) - tfs
    flat = np.concatenate([
        np.sort(rng.integers(0, 500, size=t)) for t in tfs
    ]).astype(np.int64)
    blob = codec.encode_positions_block(flat, tfs)
    cells = codec.varbyte_split_cells(blob, tfs)
    gaps = np.empty(total, dtype=np.int64)
    gaps[0] = flat[0]
    np.subtract(flat[1:], flat[:-1], out=gaps[1:])
    gaps[starts] = flat[starts]
    expected = codec.varbyte_encode_split(gaps.astype(np.uint64), starts)
    assert cells == expected
    assert b"".join(cells) == blob


def test_varbyte_split_cells_empty_segments():
    vals = np.array([7, 300, 2], dtype=np.uint64)
    blob = codec.varbyte_encode(vals)
    cells = codec.varbyte_split_cells(blob, np.array([0, 2, 0, 1, 0]))
    assert cells[0] == b"" and cells[2] == b"" and cells[4] == b""
    assert np.array_equal(codec.varbyte_decode(cells[1]), vals[:2])
    assert np.array_equal(codec.varbyte_decode(cells[3]), vals[2:])
