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
# continuation-bit patterns by total byte count nb (index 0 unused):
# bytes 0..nb-2 carry 0x80; _CONT_LO covers lanes 0-7, _CONT_HI lanes 8-9
_CONT_LO = np.array(
    [sum(0x80 << (8 * j) for j in range(min(max(nb - 1, 0), 8)))
     for nb in range(11)], dtype=_U64)
_CONT_HI = np.array(
    [0x80 if nb == 10 else 0 for nb in range(11)], dtype=np.uint16)


def _varint_core(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a non-empty uint64 array; returns (bytes as uint8
    array, per-value end offsets).

    Memory-traffic-aware: the encode stage is DRAM-bandwidth-bound under
    executor concurrency (BENCH/membw_probe.jsonl), so the byte-count uses
    ONE searchsorted pass (binary search against 9 thresholds) instead of
    nine >=-comparisons with int64 temporaries, byte slot 0 — which every
    value has — is written unmasked (``starts`` ascends, so it is a
    sequential write), and slots >= 1 touch a progressively narrowed
    integer index set: for delta-gap/tf/doc-len streams the bulk of values
    is 1-2 bytes, so later passes shrink geometrically. Output is
    byte-identical to the per-slot masked loop it replaced."""
    # bytes needed per value: 1 + count of thresholds <= value  (1..10)
    nbytes = np.searchsorted(_THRESHOLDS, v, side="right")
    nbytes += 1
    ends = np.cumsum(nbytes)
    m = int(nbytes.max())  # widest value in this stream (1..10)
    n = v.size
    # pack each value's LEB128 bytes into one uint64 lane (bytes 0-7; a
    # second uint16 lane covers bytes 8-9 of >=2^56 values): byte j =
    # ((v >> 7j) & 0x7F) | continuation. Every op is a SEQUENTIAL pass —
    # the former per-slot masked scatter moved ~8 B of int64 index per
    # written byte through DRAM, and the encode stage is bandwidth-bound
    # under executor concurrency (BENCH/membw_probe.jsonl). The loop is
    # adaptive in m: tf/dl/gap streams (1-2 B values) pay 1-2 passes.
    lo = v & _U64(0x7F)
    for j in range(1, min(m, 8)):
        lo |= ((v >> _U64(7 * j)) & _U64(0x7F)) << _U64(8 * j)
    lo |= _CONT_LO[nbytes]
    arr = np.empty((n, m), dtype=np.uint8)
    w = min(m, 8)
    arr[:, :w] = lo.astype("<u8", copy=False).view(np.uint8).reshape(n, 8)[:, :w]
    if m > 8:
        hi = ((v >> _U64(56)) & _U64(0x7F)).astype(np.uint16)
        hi |= (v >> _U64(63)).astype(np.uint16) << np.uint16(8)
        hi |= _CONT_HI[nbytes]
        arr[:, 8:m] = hi.astype("<u2", copy=False).view(np.uint8).reshape(n, 2)[:, : m - 8]
    mask = np.arange(m, dtype=np.int64)[None, :] < nbytes[:, None]
    return arr[mask], ends


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array. Vectorized (see _varint_core)."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b""
    out, _ = _varint_core(v)
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

# ---------------------------------------------------------------------------
# Batch-level encoding: one vectorized pass over ALL terms in an Arrow batch
# ---------------------------------------------------------------------------


def encode_varint_stream_slices(values: np.ndarray, bounds: np.ndarray) -> list[bytes]:
    """Varint-encode ``values`` in ONE vectorized pass and return the byte
    slices delimited by value-index ``bounds`` (sorted, len m+1, bounds[0]=0,
    bounds[-1]=len(values)). Equivalent to
    ``[encode_varint(values[lo:hi]) for lo, hi in zip(bounds, bounds[1:])]``
    but the ~10 numpy passes are paid once for the whole batch instead of
    once per posting block — the per-tiny-array overhead was the index
    build's encode-stage bottleneck at 1M files."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return [b""] * (len(bounds) - 1)
    out, ends = _varint_core(v)
    # byte offset of value-boundary k = ends[k-1] (0 for k == 0)
    bt = out.tobytes()
    b_off = np.concatenate([[0], ends])[np.asarray(bounds, dtype=np.int64)]
    return [bt[b_off[i]:b_off[i + 1]] for i in range(len(bounds) - 1)]


def _excl_cumsum(a: np.ndarray) -> np.ndarray:
    out = np.empty(a.size + 1, dtype=np.int64)
    out[0] = 0
    np.cumsum(a, out=out[1:])
    return out


def encode_posting_blocks_flat(
    flat_ids, flat_tfs, flat_dls, flat_pos, lens,
    avgdl: float, k1: float, b: float, block: int,
) -> dict:
    """Flat core of the batch postings encoder: inputs are ONE concatenated
    array per stream, already in (term, doc_id) order, plus per-term run
    lengths ``lens`` — exactly what the bucket encoder holds after its
    lexsort, so no per-term split/re-concatenate round-trip is needed.
    ``flat_pos`` is the per-doc positions pre-flattened (boundaries recover
    from the tf stream), or None to skip positions.

    Returns FLAT outputs keyed for zero-copy Arrow assembly: ids_blocks /
    tfs_blocks / dls_blocks / pos_blocks (python lists of bytes, one per
    BLOCK), block_max (float32[B]), block_last (int64[B]), and blk_off
    (int64[T+1] exclusive block-count cumsum — the list offsets that turn
    the flat streams back into per-term lists).
    """
    lens = np.asarray(lens, dtype=np.int64)
    T = lens.size
    if T == 0:
        return {"ids_blocks": [], "tfs_blocks": [], "dls_blocks": [],
                "pos_blocks": [], "block_max": np.empty(0, dtype=np.float32),
                "block_last": np.empty(0, dtype=np.int64),
                "blk_off": np.zeros(1, dtype=np.int64)}
    term_off = _excl_cumsum(lens)          # doc-axis boundaries per term
    N = int(term_off[-1])
    flat_ids = np.ascontiguousarray(flat_ids, dtype=_U64)
    flat_tfs = np.ascontiguousarray(flat_tfs, dtype=np.int64)
    flat_dls = np.ascontiguousarray(flat_dls, dtype=np.int64)

    # block structure: per term t, ceil(n_t/block) blocks of width `block`
    nblocks = (lens + block - 1) // block
    blk_off = _excl_cumsum(nblocks)        # block-axis boundaries per term
    B = int(blk_off[-1])
    blk_term = np.repeat(np.arange(T, dtype=np.int64), nblocks)
    within = np.arange(B, dtype=np.int64) - blk_off[blk_term]
    blk_start = term_off[blk_term] + within * block       # sorted ascending
    blk_end = np.minimum(blk_start + block, term_off[blk_term + 1])

    # doc-id delta gaps; absolute value at every block start (block starts
    # include term starts, so cross-term wraparound slots are overwritten)
    gaps = np.empty(N, dtype=_U64)
    gaps[0] = flat_ids[0]
    np.subtract(flat_ids[1:], flat_ids[:-1], out=gaps[1:])
    gaps[blk_start] = flat_ids[blk_start]
    doc_bounds = np.concatenate([blk_start, [N]])
    ids_blocks = encode_varint_stream_slices(gaps, doc_bounds)
    # non-negative contiguous int64 -> uint64 is a zero-copy reinterpret
    tfs_blocks = encode_varint_stream_slices(flat_tfs.view(_U64), doc_bounds)
    dls_blocks = encode_varint_stream_slices(flat_dls.view(_U64), doc_bounds)

    # per-block max of the idf-independent BM25 factor (float32 round-UP,
    # same soundness rule as block_max_partial)
    tfs_f = flat_tfs.astype(np.float64)
    dls_f = flat_dls.astype(np.float64)
    denom = tfs_f + k1 * (1.0 - b + b * dls_f / max(avgdl, 1e-12))
    partial = tfs_f * (k1 + 1.0) / np.maximum(denom, 1e-12)
    true_max = np.maximum.reduceat(partial, blk_start)
    bmax32 = true_max.astype(np.float32)
    low = bmax32.astype(np.float64) < true_max
    if low.any():
        bmax32[low] = np.nextafter(bmax32[low], np.float32(np.inf))
    blk_last = flat_ids[blk_end - 1].astype(np.int64)

    # positions: delta within doc, absolute at doc starts; position-space
    # block bounds map through the tf cumsum
    if flat_pos is not None:
        doc_plens = flat_tfs  # tf == len(positions) by construction
        pos_off = _excl_cumsum(doc_plens)
        flat_pos = np.ascontiguousarray(flat_pos, dtype=np.int64)
        P = int(pos_off[-1])
        assert flat_pos.size == P, "tf/positions misalignment"
        if P:
            pgaps = np.empty(P, dtype=np.int64)
            pgaps[0] = flat_pos[0]
            np.subtract(flat_pos[1:], flat_pos[:-1], out=pgaps[1:])
            dstarts = pos_off[:-1][doc_plens > 0]
            pgaps[dstarts] = flat_pos[dstarts]
            pos_bounds = pos_off[doc_bounds]
            pos_blocks = encode_varint_stream_slices(pgaps.view(_U64), pos_bounds)
        else:
            pos_blocks = [b""] * B
    else:
        pos_blocks = None

    return {"ids_blocks": ids_blocks, "tfs_blocks": tfs_blocks,
            "dls_blocks": dls_blocks, "pos_blocks": pos_blocks,
            "block_max": bmax32, "block_last": blk_last, "blk_off": blk_off}


def encode_posting_blocks_batch(
    ids_list, tfs_list, dls_list, poss_flat_list,
    avgdl: float, k1: float, b: float, block: int,
) -> dict:
    """Encode MANY terms' posting lists at once, byte-identical to calling
    encode_posting_blocks + encode_positions_block per term (property-tested
    in tests/test_codec.py). List-in/list-out wrapper over
    encode_posting_blocks_flat: concatenates the per-term inputs, runs the
    flat vectorized core, and slices the outputs back into per-term lists.
    ``poss_flat_list`` holds ONE flat position array per term (per-doc
    boundaries recover from the tf stream), or None to skip positions.

    Returns dict of per-term lists: ids_blocks, tfs_blocks, dls_blocks,
    pos_blocks, block_max, block_last.
    """
    T = len(ids_list)
    if T == 0:
        return {k: [] for k in ("ids_blocks", "tfs_blocks", "dls_blocks",
                                "pos_blocks", "block_max", "block_last")}
    lens = np.fromiter((len(x) for x in ids_list), dtype=np.int64, count=T)
    flat_ids = np.concatenate([np.asarray(x, dtype=_U64) for x in ids_list])
    flat_tfs = np.concatenate([np.asarray(x, dtype=np.int64) for x in tfs_list])
    flat_dls = np.concatenate([np.asarray(x, dtype=np.int64) for x in dls_list])
    flat_pos = (
        np.concatenate([np.asarray(p, dtype=np.int64) for p in poss_flat_list]
                       or [np.empty(0, dtype=np.int64)])
        if poss_flat_list is not None else None
    )
    f = encode_posting_blocks_flat(
        flat_ids, flat_tfs, flat_dls, flat_pos, lens, avgdl, k1, b, block
    )
    blk_off, pos_blocks = f["blk_off"], f["pos_blocks"]
    out = {"ids_blocks": [], "tfs_blocks": [], "dls_blocks": [],
           "pos_blocks": [], "block_max": [], "block_last": []}
    for t in range(T):
        lo, hi = int(blk_off[t]), int(blk_off[t + 1])
        out["ids_blocks"].append(f["ids_blocks"][lo:hi])
        out["tfs_blocks"].append(f["tfs_blocks"][lo:hi])
        out["dls_blocks"].append(f["dls_blocks"][lo:hi])
        out["pos_blocks"].append(pos_blocks[lo:hi] if pos_blocks is not None else None)
        out["block_max"].append([float(x) for x in f["block_max"][lo:hi]])
        out["block_last"].append([int(x) for x in f["block_last"][lo:hi]])
    return out


def encode_id_blocks_flat(flat_ids, lens, block: int) -> dict:
    """Flat core of the ids-only batch encoder (trigram candidate index —
    no tf/dl/positions streams, no block-max): delta+varint id blocks over
    ONE concatenated, already (term, doc_id)-ordered id array plus per-term
    run lengths — no per-term split/re-concatenate round trip.

    Returns flat outputs: ids_blocks (one bytes per BLOCK), block_last
    (int64[B]), blk_off (int64[T+1] — per-term block-list offsets)."""
    lens = np.asarray(lens, dtype=np.int64)
    T = lens.size
    if T == 0:
        return {"ids_blocks": [], "block_last": np.empty(0, dtype=np.int64),
                "blk_off": np.zeros(1, dtype=np.int64)}
    term_off = _excl_cumsum(lens)
    N = int(term_off[-1])
    flat_ids = np.ascontiguousarray(flat_ids, dtype=_U64)
    nblocks = (lens + block - 1) // block
    blk_off = _excl_cumsum(nblocks)
    B = int(blk_off[-1])
    blk_term = np.repeat(np.arange(T, dtype=np.int64), nblocks)
    within = np.arange(B, dtype=np.int64) - blk_off[blk_term]
    blk_start = term_off[blk_term] + within * block
    blk_end = np.minimum(blk_start + block, term_off[blk_term + 1])
    gaps = np.empty(N, dtype=_U64)
    gaps[0] = flat_ids[0]
    np.subtract(flat_ids[1:], flat_ids[:-1], out=gaps[1:])
    gaps[blk_start] = flat_ids[blk_start]
    ids_blocks = encode_varint_stream_slices(gaps, np.concatenate([blk_start, [N]]))
    blk_last = flat_ids[blk_end - 1].astype(np.int64)
    return {"ids_blocks": ids_blocks, "block_last": blk_last,
            "blk_off": blk_off}


def encode_id_blocks_batch(ids_list, block: int) -> dict:
    """List-in/list-out wrapper over encode_id_blocks_flat.

    Returns dict of per-term lists: ids_blocks, block_last.
    """
    T = len(ids_list)
    if T == 0:
        return {"ids_blocks": [], "block_last": []}
    lens = np.fromiter((len(x) for x in ids_list), dtype=np.int64, count=T)
    flat_ids = np.concatenate([np.asarray(x, dtype=_U64) for x in ids_list])
    f = encode_id_blocks_flat(flat_ids, lens, block)
    ids_blocks, blk_last, blk_off = \
        f["ids_blocks"], f["block_last"], f["blk_off"]
    return {
        "ids_blocks": [ids_blocks[int(blk_off[t]):int(blk_off[t + 1])] for t in range(T)],
        "block_last": [[int(x) for x in blk_last[int(blk_off[t]):int(blk_off[t + 1])]]
                       for t in range(T)],
    }


# ---------------------------------------------------------------------------
# xxHash64 (pure Python) — driver-side parity with Spark's xxhash64()
# ---------------------------------------------------------------------------

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64(data: bytes, seed: int = 42) -> int:
    """xxHash64 of raw bytes (public algorithm, Cyan4973/xxHash). Seed 42
    matches Spark's default for the xxhash64() SQL function on a single
    string/binary argument, letting the driver route terms/grams to their
    hash buckets without launching a job (parity asserted in
    tests/test_codec.py against F.xxhash64)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i <= n - 32:
            for _ in range(1):
                v1 = (_rotl((v1 + int.from_bytes(data[i:i+8], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
                v2 = (_rotl((v2 + int.from_bytes(data[i+8:i+16], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
                v3 = (_rotl((v3 + int.from_bytes(data[i+16:i+24], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
                v4 = (_rotl((v4 + int.from_bytes(data[i+24:i+32], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _XXP2) & _M64, 31) * _XXP1) & _M64
            h = ((h * _XXP1) + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        k = (_rotl((int.from_bytes(data[i:i+8], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
        h = ((_rotl(h ^ k, 27) * _XXP1) + _XXP4) & _M64
        i += 8
    if i <= n - 4:
        h = ((_rotl(h ^ ((int.from_bytes(data[i:i+4], "little") * _XXP1) & _M64), 23) * _XXP2) + _XXP3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _XXP5) & _M64), 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h


def xxhash64_signed(s: str, seed: int = 42) -> int:
    """Spark-convention signed-long xxhash64 of a string's UTF-8 bytes."""
    h = xxhash64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h
