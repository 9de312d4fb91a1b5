"""Delta + varbyte posting-block codec (numpy-vectorized).

From-scratch replacement for the postings compression the reference
delegates to Lucene's Lucene80Codec (reference: pom.xml:31,
SimpleFDBDirectoryTest.java:212). Where the reference stores one FDB
key-value per posting (reference: DATA.md:53-54), we pack B postings
per block into three binary columns (docs, tfs, positions) so segment
merge can operate in the compressed domain and queries prune whole
blocks via (min_doc, max_doc, max_tf, min_dlq) metadata — the
block-max WAND plumbing (BASELINE.json north_rule).

Encoding: classic unsigned varbyte — 7 data bits per byte, little-
endian groups, MSB set = continuation. Doc IDs are delta-encoded
(first value absolute). All encode/decode paths are numpy array-at-a-
time; nothing here is per-row Python.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # postings per block (Lucene's FOR-block size)

_U7 = np.uint64(7)
_MASK7 = np.uint64(0x7F)


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints to a varbyte stream."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    # bytes needed per value: 1 + floor(bit_length-1 / 7)
    nb = np.ones(n, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nb += (tmp > 0).astype(np.int64)
        tmp = tmp >> _U7
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_nb = int(nb.max())
    for j in range(max_nb):
        sel = nb > j
        idx = starts[sel] + j
        byte = ((v[sel] >> np.uint64(7 * j)) & _MASK7).astype(np.uint8)
        cont = (nb[sel] - 1 > j).astype(np.uint8) << 7
        out[idx] = byte | cont
    return out.tobytes()


def varbyte_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a varbyte stream to a uint64 array."""
    a = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if a.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (a & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(lens.max())):
        sel = lens > j
        vals[sel] |= (a[starts[sel] + j].astype(np.uint64) & _MASK7) << np.uint64(7 * j)
    return vals


def varbyte_encode_split(values: np.ndarray, seg_starts: np.ndarray) -> list[bytes]:
    """Encode `values` once, return one bytes object per segment.

    seg_starts are the value-index starts of each segment (first must
    be 0). This is the vectorized bulk path: one numpy encode pass for
    an entire partition, then O(1) slicing per segment — used by the
    block packer so per-block Python work is just a memory slice.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    seg_starts = np.ascontiguousarray(seg_starts, dtype=np.int64)
    if n == 0:
        return [b""] * seg_starts.size
    nb = np.ones(n, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nb += (tmp > 0).astype(np.int64)
        tmp = tmp >> _U7
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(int(nb.max())):
        sel = nb > j
        idx = starts[sel] + j
        byte = ((v[sel] >> np.uint64(7 * j)) & _MASK7).astype(np.uint8)
        cont = (nb[sel] - 1 > j).astype(np.uint8) << 7
        out[idx] = byte | cont
    buf = out.tobytes()
    byte_starts = starts[seg_starts]
    byte_ends = np.append(byte_starts[1:], len(buf))
    return [buf[a:b] for a, b in zip(byte_starts.tolist(), byte_ends.tolist())]


def varbyte_split_cells(buf: bytes, counts: np.ndarray) -> list[bytes]:
    """Slice a varbyte stream into per-segment byte cells WITHOUT
    decoding values: counts[i] = number of varbyte values in segment i.
    Because every per-posting encoding here restarts its delta at the
    posting boundary, a block blob sliced at these boundaries yields
    byte-identical per-posting cells (the inverted relation's layout) —
    the zero-copy path a sorted merge uses to move occurrence payloads
    through a docID remap untouched."""
    a = np.frombuffer(buf, dtype=np.uint8)
    c = np.ascontiguousarray(counts, dtype=np.int64)
    if a.size == 0:
        return [b""] * c.size
    ends = np.flatnonzero((a & 0x80) == 0)  # byte index of each value's last byte
    vc = np.cumsum(c)
    cell_ends = np.where(c > 0, ends[np.maximum(vc - 1, 0)] + 1, 0)
    # empty segments inherit the previous boundary (zero-length cell)
    np.maximum.accumulate(cell_ends, out=cell_ends)
    cell_starts = np.concatenate(([0], cell_ends[:-1]))
    return [buf[s:e] for s, e in zip(cell_starts.tolist(), cell_ends.tolist())]


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Gaps of a sorted non-negative array; first element absolute."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps.astype(np.uint64), dtype=np.uint64)


def encode_doc_block(doc_ids: np.ndarray) -> bytes:
    """Sorted docIDs → delta+varbyte bytes."""
    return varbyte_encode(delta_encode(doc_ids))


def decode_doc_block(buf: bytes) -> np.ndarray:
    return delta_decode(varbyte_decode(buf)).astype(np.int64)


def encode_tf_block(tfs: np.ndarray) -> bytes:
    """Term frequencies (>=1) → varbyte of tf-1 (dense tf=1 runs → zeros)."""
    t = np.ascontiguousarray(tfs, dtype=np.uint64)
    return varbyte_encode(t - np.uint64(1))


def decode_tf_block(buf: bytes) -> np.ndarray:
    return (varbyte_decode(buf) + np.uint64(1)).astype(np.int64)


def encode_positions_block(flat_positions: np.ndarray, tfs: np.ndarray) -> bytes:
    """Concatenated per-posting position lists → per-posting delta + varbyte.

    flat_positions holds each posting's sorted positions back-to-back;
    tfs gives the per-posting lengths (tf == number of positions).
    Deltas restart at each posting boundary (vectorized via a boundary
    correction instead of a Python loop over postings).
    """
    p = np.ascontiguousarray(flat_positions, dtype=np.int64)
    t = np.ascontiguousarray(tfs, dtype=np.int64)
    if p.size == 0:
        return b""
    gaps = np.empty_like(p)
    gaps[0] = p[0]
    np.subtract(p[1:], p[:-1], out=gaps[1:])
    # posting start offsets within the flat array
    starts = np.cumsum(t) - t
    gaps[starts] = p[starts]  # restart delta at each posting
    return varbyte_encode(gaps.astype(np.uint64))


def decode_positions_block(buf: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Returns (flat_positions, start_offsets per posting)."""
    gaps = varbyte_decode(buf).astype(np.int64)
    t = np.ascontiguousarray(tfs, dtype=np.int64)
    starts = np.cumsum(t) - t
    if gaps.size == 0:
        return gaps, starts
    # segmented cumsum: subtract the running prefix at each boundary
    csum = np.cumsum(gaps)
    prev_end = np.zeros(t.size, dtype=np.int64)
    prev_end[1:] = csum[starts[1:] - 1]
    flat = csum - np.repeat(prev_end, t)
    return flat, starts


def encode_offsets_interleaved(
    flat_starts: np.ndarray, flat_lens: np.ndarray, seg_starts: np.ndarray
) -> list[bytes]:
    """Per-posting character-offset cells: (start-gap, length) pairs
    interleaved and varbyte-packed, start deltas restarting at each
    posting (the ("pp", ...) -> (startOffset, endOffset) payload of the
    reference's DATA.md:54, minus payloads). seg_starts indexes
    flat_starts at each posting boundary."""
    s = np.ascontiguousarray(flat_starts, dtype=np.int64)
    ln = np.ascontiguousarray(flat_lens, dtype=np.int64)
    if s.size == 0:
        return []
    gaps = np.empty_like(s)
    gaps[0] = s[0]
    np.subtract(s[1:], s[:-1], out=gaps[1:])
    gaps[seg_starts] = s[seg_starts]  # delta restarts at each posting
    inter = np.empty(2 * s.size, dtype=np.uint64)
    inter[0::2] = gaps.astype(np.uint64)
    inter[1::2] = ln.astype(np.uint64)
    return varbyte_encode_split(inter, 2 * np.ascontiguousarray(seg_starts, dtype=np.int64))


def decode_offsets_block(buf: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Block offsets binary -> (flat_starts, flat_ends, posting_starts)."""
    vals = varbyte_decode(buf).astype(np.int64)
    t = np.ascontiguousarray(tfs, dtype=np.int64)
    starts_idx = np.cumsum(t) - t
    gaps = vals[0::2]
    lens = vals[1::2]
    if gaps.size == 0:
        return gaps, gaps, starts_idx
    csum = np.cumsum(gaps)
    prev_end = np.zeros(t.size, dtype=np.int64)
    prev_end[1:] = csum[starts_idx[1:] - 1]
    flat_starts = csum - np.repeat(prev_end, t)
    return flat_starts, flat_starts + lens, starts_idx


def decode_payloads_block(buf: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Block payloads binary -> (flat_values, posting_starts): one
    unsigned varint payload per occurrence, aligned with the positions
    layout (the payload slot of the reference's ("pp", field, term,
    docID, pos) -> (startOffset, endOffset, payload), DATA.md:55)."""
    vals = varbyte_decode(buf).astype(np.int64)
    t = np.ascontiguousarray(tfs, dtype=np.int64)
    return vals, np.cumsum(t) - t


def pack_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    flat_positions: np.ndarray | None,
    dlq: np.ndarray,
    block_size: int = BLOCK_SIZE,
    flat_off_starts: np.ndarray | None = None,
    flat_off_lens: np.ndarray | None = None,
    flat_payloads: np.ndarray | None = None,
) -> list[dict]:
    """Split one (term[, shard]) posting list into compressed blocks.

    Inputs are docID-sorted. dlq is the SmallFloat-quantized doc length
    per posting (used only for the per-block min_dlq WAND bound — the
    authoritative doclen table lives separately).

    Returns a list of dicts ready to become segment rows:
    block_id, n, min_doc, max_doc, max_tf, min_dlq, docs, tfs, dlqs,
    positions. dlqs is the raw norm byte per posting (the reference's
    ("nv", field, docID) norms, DATA.md:37, stored inline so scoring
    needs no doclen join — the Parquet analogue of Lucene reading the
    .nvd file alongside postings).
    """
    n = int(doc_ids.size)
    out: list[dict] = []
    if n == 0:
        return out
    pos_starts = None
    if flat_positions is not None or flat_off_starts is not None or flat_payloads is not None:
        pos_starts = np.cumsum(tfs) - tfs
    for b, lo in enumerate(range(0, n, block_size)):
        hi = min(lo + block_size, n)
        d = doc_ids[lo:hi]
        t = tfs[lo:hi]
        if flat_positions is not None:
            plo = int(pos_starts[lo])
            phi = int(pos_starts[hi - 1] + tfs[hi - 1])
            pos_bytes = encode_positions_block(flat_positions[plo:phi], t)
        else:
            pos_bytes = b""
        off_bytes = None
        if flat_off_starts is not None:
            plo = int(pos_starts[lo])
            phi = int(pos_starts[hi - 1] + tfs[hi - 1])
            seg = np.cumsum(t) - t
            off_bytes = b"".join(
                encode_offsets_interleaved(
                    flat_off_starts[plo:phi], flat_off_lens[plo:phi], seg
                )
            )
        pay_bytes = None
        if flat_payloads is not None:
            plo = int(pos_starts[lo])
            phi = int(pos_starts[hi - 1] + tfs[hi - 1])
            pay_bytes = varbyte_encode(flat_payloads[plo:phi].astype(np.uint64))
        out.append(
            {
                "block_id": b,
                "n": hi - lo,
                "min_doc": int(d[0]),
                "max_doc": int(d[-1]),
                "max_tf": int(t.max()),
                "min_dlq": int(dlq[lo:hi].min()),
                "docs": encode_doc_block(d),
                "tfs": encode_tf_block(t),
                "dlqs": np.ascontiguousarray(dlq[lo:hi], dtype=np.uint8).tobytes(),
                "positions": pos_bytes,
                "offsets": off_bytes,
                "payloads": pay_bytes,
            }
        )
    return out
