"""Delta-gap + varint posting-list codec, numpy-vectorized (no per-row
Python loops in the hot path — BASELINE.json input_hint mandate).

Layout mirrors what tantivy/Lucene do conceptually (doc-id delta gaps +
LEB128 varints + per-block max metadata) but is an original implementation
designed for Arrow batch transfer: encode/decode operate on whole numpy
arrays with O(max_bytes_per_value)=10 vectorized passes, not per-element
loops.

Reference parity note: ck delegates posting compression to tantivy
(SURVEY.md §1.1 "Inverted index"); this module is the rebuild's explicit
equivalent.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_THRESHOLDS = np.array([1 << (7 * i) for i in range(1, 10)], dtype=_U64)


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array. Vectorized: one pass per byte slot."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b""
    # bytes needed per value: 1 + count of thresholds <= value  (1..10)
    nbytes = np.ones(v.size, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (v >= t).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for i in range(10):
        mask = nbytes > i
        if not mask.any():
            break
        chunk = (v[mask] >> _U64(7 * i)) & _U64(0x7F)
        cont = (nbytes[mask] > i + 1).astype(np.uint8) << 7
        out[starts[mask] + i] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def decode_varint(buf: bytes) -> np.ndarray:
    """Inverse of encode_varint. Vectorized via cumsum grouping."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # value index for every byte
    idx = np.zeros(b.size, dtype=np.int64)
    idx[starts[1:]] = 1
    idx = np.cumsum(idx)
    within = np.arange(b.size, dtype=np.int64) - starts[idx]
    contrib = (b & 0x7F).astype(_U64) << (_U64(7) * within.astype(_U64))
    values = np.zeros(ends.size, dtype=_U64)
    np.add.at(values, idx, contrib)  # shifts are disjoint => add == bitwise-or
    return values


def encode_posting_ids(doc_ids: np.ndarray) -> bytes:
    """Delta-gap + varint encode a strictly-increasing int64/uint64 doc-id
    array (first value stored absolute)."""
    ids = np.ascontiguousarray(doc_ids, dtype=_U64)
    if ids.size == 0:
        return b""
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return encode_varint(gaps)


def decode_posting_ids(buf: bytes) -> np.ndarray:
    gaps = decode_varint(buf)
    return np.cumsum(gaps, dtype=_U64)


def encode_u32s(values: np.ndarray) -> bytes:
    """Varint-encode small non-negative ints (tf, doc_len)."""
    return encode_varint(np.ascontiguousarray(values, dtype=_U64))


def decode_u32s(buf: bytes) -> np.ndarray:
    return decode_varint(buf).astype(np.int64)


def encode_posting_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    k1: float,
    b: float,
    block: int,
) -> dict:
    """Split a sorted posting list into fixed-width blocks, each
    independently delta+varint encoded, with per-block max metadata.

    Independent blocks are what make block-max WAND possible on top of a
    compressed list: the scorer can skip decoding blocks whose score upper
    bound is below the current top-k floor (the rebuild's explicit analogue
    of tantivy's block skip data, SURVEY.md §1.1).

    Returns dict with: ids_blocks, tfs_blocks, dls_blocks (list[bytes]),
    block_max (list[float] — idf-independent BM25 factor upper bound),
    block_last (list[int] — last doc_id per block, for navigation).
    """
    ids = np.ascontiguousarray(doc_ids, dtype=_U64)
    n = ids.size
    nblocks = (n + block - 1) // block
    ids_blocks, tfs_blocks, dls_blocks, block_last = [], [], [], []
    for j in range(nblocks):
        lo, hi = j * block, min((j + 1) * block, n)
        ids_blocks.append(encode_posting_ids(ids[lo:hi]))
        tfs_blocks.append(encode_u32s(tfs[lo:hi]))
        dls_blocks.append(encode_u32s(dls[lo:hi]))
        block_last.append(int(ids[hi - 1]))
    bmax = block_max_partial(np.asarray(tfs), np.asarray(dls), avgdl, k1, b, block)
    return {
        "ids_blocks": ids_blocks,
        "tfs_blocks": tfs_blocks,
        "dls_blocks": dls_blocks,
        "block_max": [float(x) for x in bmax],
        "block_last": block_last,
    }


def decode_all_blocks(blocks) -> np.ndarray:
    """Concatenate-decode a list/array of independently encoded id blocks.
    (len(), not truthiness: Arrow hands multi-element numpy object arrays.)"""
    if len(blocks) == 0:
        return np.empty(0, dtype=_U64)
    return np.concatenate([decode_posting_ids(b) for b in blocks])


def decode_all_u32_blocks(blocks) -> np.ndarray:
    if len(blocks) == 0:
        return np.empty(0, dtype=np.int64)
    return np.concatenate([decode_u32s(b) for b in blocks])


def encode_positions_block(pos_lists) -> bytes:
    """Encode one block's per-doc token-position lists as a single varint
    stream: within each doc the first position is absolute and the rest are
    strictly-positive deltas (positions are strictly increasing within a
    doc). Per-doc boundaries are NOT stored — they are recovered from the
    block's tf values (tf == number of positions for the term in that doc),
    which the postings row already carries. This mirrors how tantivy/Lucene
    lay out their positions stream against the doc/freq stream
    (SURVEY.md §1.1 'Inverted index'; ck's phrase queries resolve against
    tantivy's positions, ck-engine/src/lib.rs:765-775)."""
    arrs = [np.asarray(p, dtype=np.int64) for p in pos_lists]
    lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=len(arrs))
    if lens.sum() == 0:
        return b""
    flat = np.concatenate(arrs)
    deltas = np.empty_like(flat)
    deltas[0] = flat[0]
    np.subtract(flat[1:], flat[:-1], out=deltas[1:])
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    starts = starts[lens > 0]
    deltas[starts] = flat[starts]  # doc-start positions stored absolute
    return encode_varint(deltas)


def decode_positions_block(buf: bytes, tfs: np.ndarray) -> np.ndarray:
    """Inverse of encode_positions_block: flat int64 position array for the
    block's docs, concatenated in doc order; ``tfs`` gives the per-doc
    lengths (slice with cumsum(tfs) boundaries). Vectorized grouped cumsum —
    no per-doc Python loop."""
    deltas = decode_varint(buf).astype(np.int64)
    if deltas.size == 0:
        return deltas
    lens = np.asarray(tfs, dtype=np.int64)
    cs = np.cumsum(deltas)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    # base to subtract per doc: running sum just before the doc's first
    # element (its stored value is absolute, so everything before cancels)
    base = np.where(starts > 0, cs[np.maximum(starts - 1, 0)], 0)
    return cs - np.repeat(base, lens)


def block_max_partial(
    tfs: np.ndarray, doc_lens: np.ndarray, avgdl: float, k1: float, b: float, block: int
) -> np.ndarray:
    """Per-block max of the idf-independent BM25 factor
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).

    Stored at index-build time; the query-time scorer multiplies by idf to
    get a per-block score upper bound for block-max WAND pruning.
    """
    tfs = tfs.astype(np.float64)
    dls = doc_lens.astype(np.float64)
    denom = tfs + k1 * (1.0 - b + b * dls / max(avgdl, 1e-12))
    partial = tfs * (k1 + 1.0) / np.maximum(denom, 1e-12)
    n = partial.size
    nblocks = (n + block - 1) // block
    pad = nblocks * block - n
    if pad:
        partial = np.concatenate([partial, np.zeros(pad)])
    true_max = partial.reshape(nblocks, block).max(axis=1)
    f32 = true_max.astype(np.float32)
    # float32 round-to-nearest can land BELOW the float64 maximum; a stored
    # bound below the true max would make WAND/MaxScore pruning unsound for
    # docs within ~1e-7 of the top-k floor. Round UP when narrowing.
    low = f32.astype(np.float64) < true_max
    if low.any():
        f32[low] = np.nextafter(f32[low], np.float32(np.inf))
    return f32
