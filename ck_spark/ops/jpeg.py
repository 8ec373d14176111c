"""Minimal pure-numpy baseline JPEG (JFIF) codec.

Upgrades the multimodal decode seam's honest-stub boundary: PNG/WAV/AVI
decode was already real (ops/png.py, ops/wav.py, ops/avi.py), but every
COMPRESSED format raised NotImplementedError because no codec libs ship
in this container. Baseline sequential-DCT JPEG, however, is fully
implementable from the public ITU-T T.81 spec with numpy alone — so the
most common compressed image format now decodes for real:

- marker parse: SOI / APPn / COM (skip), DQT (8- and 16-bit precision,
  multiple tables per segment), SOF0 (baseline), DHT (multiple tables
  per segment), DRI, SOS, EOI
- entropy decode: byte-unstuffing (FF 00), restart markers RST0-7 with
  DC-predictor + bit-alignment reset, per-block Huffman DC/AC decode
  (EOB, ZRL), zigzag ordering
- reconstruction: dequantize + 8x8 IDCT batched over ALL blocks of a
  component in one einsum (the Huffman front-end is sequential by
  nature; the heavy math is vectorized), nearest-neighbor chroma
  upsampling for 4:2:0 / 4:2:2, JFIF YCbCr->RGB

The encoder exists for round-trip tests: 4:4:4 or 4:2:0, quality-scaled
Annex-K quantization tables, restart-interval support, and SELF-EMITTED
Huffman tables (flat canonical code sets written to DHT) — any spec-
compliant decoder must read tables from DHT, so the decoder is exercised
on exactly the same path a libjpeg file would take.

mp3/mp4 remain honestly out of scope (perceptual audio/video codecs are
orders of magnitude beyond a test-support implementation); the seam for
them is unchanged in ops/multimodal.py.

Scale note: runs inside Arrow-batched mapInPandas like the other codecs
— one Python decode per payload, numpy math per block batch; decode
parallelism is partition-level, which is the right grain for media blobs.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T T.81 Annex K.1 example quantization tables (public spec tables;
# the de-facto "standard" base tables every encoder scales by quality).
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """8x8 orthonormal DCT-II matrix C: coeffs = C @ block @ C.T."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality (1..100) scaling of a base table."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Huffman table helpers

class _HuffTable:
    """Canonical JPEG Huffman table from the DHT (bits, values) form."""

    def __init__(self, counts: list[int], values: bytes):
        # counts[i] = number of codes of length i+1 (i in 0..15)
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        vi = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = values[vi]
                vi += 1
                code += 1
            code <<= 1
        self.counts = counts
        self.values = values


def _flat_table(symbols: list[int], length: int) -> tuple[list[int], bytes]:
    """A valid canonical table giving every symbol the same code length.

    Needs len(symbols) < 2**length so the all-ones code (reserved by
    T.81) is never assigned — canonical assignment starting at 0
    guarantees that when the level isn't full."""
    if len(symbols) >= (1 << length):
        raise ValueError("too many symbols for flat table")
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    return counts, bytes(symbols)


# ---------------------------------------------------------------------------
# bit IO

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            b = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (spec padding)."""
        if self._nbits:
            self.write((1 << (8 - self._nbits)) - 1, 8 - self._nbits)

    def raw_marker(self, byte2: int) -> None:
        """Emit FF xx OUTSIDE the stuffed stream (restart markers)."""
        self.align()
        self.out += bytes((0xFF, byte2))


class _BitReader:
    """Reads the entropy-coded segment: unstuffs FF00, stops at markers.

    Restart markers are consumed explicitly via expect_rst()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise EOFError("truncated entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:  # stuffed FF
                self.pos += 2
            else:
                # a real marker: the spec says pad bits then marker; feed
                # 1-padding so a read that overruns into the marker is loud
                raise EOFError("hit marker inside entropy stream")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def read_bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def reset_and_expect_rst(self, n: int) -> None:
        """Byte-align, then consume the RSTn marker."""
        self._acc = 0
        self._nbits = 0
        d = self.data
        # 1-padding to the byte boundary can itself form an 0xFF byte,
        # which the encoder must stuff — skip the stuffed pair first
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF \
                and d[self.pos + 1] == 0x00:
            self.pos += 2
        if not (self.pos + 1 < len(d) and d[self.pos] == 0xFF
                and d[self.pos + 1] == 0xD0 + (n & 7)):
            raise ValueError(
                f"expected RST{n & 7} at offset {self.pos}, "
                f"got {d[self.pos:self.pos + 2].hex()}")
        self.pos += 2


def _extend(value: int, size: int) -> int:
    """T.81 EXTEND: map the `size`-bit magnitude to its signed value."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value -> (size, size-bit code) for DC/AC coding."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    if v < 0:
        v += (1 << size) - 1
    return size, v


# ---------------------------------------------------------------------------
# encoder

def _prepare_components(arr: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front half: color transform, optional 4:2:0, forward
    DCT + quantization of every MCU-grid block. Returns
    (h, w, samps, qids, qtables, comp_blocks, mcux, mcuy); comp_blocks are
    [n_by, n_bx, 64] zigzag-ordered int64 coefficients per component."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    grey = a.ndim == 2
    if not grey and not (a.ndim == 3 and a.shape[2] == 3):
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    qluma = _quality_scale(_QUANT_LUMA, quality)
    qchroma = _quality_scale(_QUANT_CHROMA, quality)

    if grey:
        planes = [a.astype(np.float64)]
        samps = [(1, 1)]
        qids = [0]
        qtables = [qluma]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even, average 2x2 for chroma
            he, we = (h + 1) & ~1, (w + 1) & ~1
            cbp = np.pad(cb, ((0, he - h), (0, we - w)), mode="edge")
            crp = np.pad(cr, ((0, he - h), (0, we - w)), mode="edge")
            cb = cbp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]
        qtables = [qluma, qchroma]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component: pad plane to MCU grid, forward DCT + quantize all blocks
    comp_blocks: list[np.ndarray] = []   # [n_by, n_bx, 64] zigzagged ints
    for plane, (sh, sv), qid in zip(planes, samps, qids):
        bw, bh = mcux * sh * 8, mcuy * sv * 8
        p = np.pad(
            plane,
            ((0, bh - plane.shape[0]), (0, bw - plane.shape[1])),
            mode="edge",
        ) - 128.0
        blocks = p.reshape(bh // 8, 8, bw // 8, 8).transpose(0, 2, 1, 3)
        coefs = np.einsum("ij,abjk,lk->abil", _C, blocks, _C)
        q = qtables[qid].reshape(8, 8).astype(np.float64)
        quant = np.round(coefs / q).astype(np.int64)
        comp_blocks.append(
            quant.reshape(bh // 8, bw // 8, 64)[:, :, _ZIGZAG]
        )
    return h, w, samps, qids, qtables, comp_blocks, mcux, mcuy


def _headers(h, w, samps, qids, qtables, sof_marker: int) -> bytearray:
    """SOI + APP0 + DQT + SOFn common prefix."""
    out = bytearray()
    out += b"\xFF\xD8"  # SOI
    # APP0/JFIF: version 1.1, unitless density 1x1, no thumbnail
    out += b"\xFF\xE0" + struct.pack(">H", 16) \
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for qid, qt in enumerate(qtables):
        body = bytes([qid]) + bytes(int(x) for x in qt[_ZIGZAG])
        out += b"\xFF\xDB" + struct.pack(">H", 2 + len(body)) + body
    sof = struct.pack(">BHHB", 8, h, w, len(samps))
    for ci, ((sh, sv), qid) in enumerate(zip(samps, qids)):
        sof += bytes((ci + 1, (sh << 4) | sv, qid))
    out += bytes((0xFF, sof_marker)) + struct.pack(">H", 2 + len(sof)) + sof
    return out


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 HxW (grey) or HxWx3 (RGB) -> baseline JFIF bytes.

    4:4:4 by default; subsample=True emits 4:2:0. Huffman tables are
    self-emitted flat canonical sets (valid per T.81; bloated vs the
    Annex-K defaults but decoder-agnostic). restart_interval>0 writes
    DRI and RSTn markers every that many MCUs."""
    h, w, samps, qids, qtables, comp_blocks, mcux, mcuy = _prepare_components(
        arr, quality, subsample
    )
    ncomp = len(samps)

    # Huffman tables: flat canonical. DC symbols 0..11 at 4 bits would
    # collide with 12 == 2**4 - only 12 < 16 codes so 4 bits is fine? 12
    # codes of length 4 leaves the all-ones 1111 unused (codes 0..11).
    dc_counts, dc_values = _flat_table(list(range(12)), 4)
    ac_syms = [0x00, 0xF0] + [
        (run << 4) | size for run in range(16) for size in range(1, 11)
    ]
    ac_counts, ac_values = _flat_table(ac_syms, 8)
    dc_tab = _HuffTable(dc_counts, dc_values)
    ac_tab = _HuffTable(ac_counts, ac_values)
    # encode-side map: symbol -> (code, length)
    enc_dc = {v: (c, l) for (l, c), v in dc_tab.lookup.items()}
    enc_ac = {v: (c, l) for (l, c), v in ac_tab.lookup.items()}

    out = _headers(h, w, samps, qids, qtables, 0xC0)
    # DHT (class 0 = DC id 0, class 1 = AC id 0; shared by all components)
    for cls, (counts, values) in ((0, (dc_counts, dc_values)),
                                  (1, (ac_counts, ac_values))):
        body = bytes([cls << 4]) + bytes(counts) + values
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes((ci + 1, 0x00))  # DC table 0, AC table 0
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    bw_ = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw_.raw_marker(0xD0 + (rst & 7))
            rst += 1
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci, (sh, sv) in enumerate(samps):
            for by in range(sv):
                for bx in range(sh):
                    zz = comp_blocks[ci][my * sv + by, mx * sh + bx]
                    diff = int(zz[0]) - preds[ci]
                    preds[ci] = int(zz[0])
                    size, mag = _magnitude(diff)
                    code, ln = enc_dc[size]
                    bw_.write(code, ln)
                    if size:
                        bw_.write(mag, size)
                    run = 0
                    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                    for k in range(1, last_nz + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = enc_ac[0xF0]
                            bw_.write(code, ln)
                            run -= 16
                        size, mag = _magnitude(v)
                        code, ln = enc_ac[(run << 4) | size]
                        bw_.write(code, ln)
                        bw_.write(mag, size)
                        run = 0
                    if last_nz < 63:
                        code, ln = enc_ac[0x00]
                        bw_.write(code, ln)
    bw_.align()
    out += bw_.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (SOF2, spectral selection + successive approximation)

def _comp_grid(w: int, h: int, sh: int, sv: int, hmax: int, vmax: int):
    """Non-interleaved block grid (n_block_rows, n_block_cols) for one
    component — ceil of the component's OWN dimensions, not the padded
    MCU grid (T.81 A.2.2)."""
    cw = -(-(w * sh) // hmax)
    ch = -(-(h * sv) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _emit_ac_first(bw, blocks, grid, ss, se, al, enc_ac, restart_interval=0):
    """AC initial pass for one component band: run/size coding of
    point-transformed coefficients with shared EOB runs (T.81 G.1.2.2)."""
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = enc_ac[r << 4]
            bw.write(code, ln)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0

    bh, bwid = grid
    bi = 0
    rst = 0
    for by in range(bh):
        for bx in range(bwid):
            if restart_interval and bi and bi % restart_interval == 0:
                flush()
                bw.raw_marker(0xD0 + (rst & 7))
                rst += 1
            bi += 1
            zz = blocks[by, bx]
            r = 0
            for k in range(ss, se + 1):
                c = int(zz[k])
                v = (abs(c) >> al) if c >= 0 else -(abs(c) >> al)
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    flush()
                    code, ln = enc_ac[0xF0]
                    bw.write(code, ln)
                    r -= 16
                flush()
                size, mag = _magnitude(v)
                code, ln = enc_ac[(r << 4) | size]
                bw.write(code, ln)
                bw.write(mag, size)
                r = 0
            if r > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
    flush()


def _emit_ac_refine(bw, blocks, grid, ss, se, al, enc_ac, restart_interval=0):
    """AC refinement pass (T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine):
    newly-nonzero coefficients get run+sign codes; already-nonzero ones
    get correction bits buffered behind the next emitted symbol."""
    eobrun = 0
    be: list[int] = []  # correction bits riding with the next EOBRUN

    def flush():
        nonlocal eobrun, be
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = enc_ac[r << 4]
            bw.write(code, ln)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0
            for b in be:
                bw.write(b, 1)
            be = []

    bh, bwid = grid
    bi = 0
    rst = 0
    for by in range(bh):
        for bx in range(bwid):
            if restart_interval and bi and bi % restart_interval == 0:
                flush()
                bw.raw_marker(0xD0 + (rst & 7))
                rst += 1
            bi += 1
            zz = blocks[by, bx]
            absv = [abs(int(zz[ss + i])) >> al for i in range(se - ss + 1)]
            eob = 0  # 1 past the last NEWLY-nonzero coefficient
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i + 1
            r = 0
            br: list[int] = []  # this block's buffered correction bits
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i < eob:
                    flush()
                    code, ln = enc_ac[0xF0]
                    bw.write(code, ln)
                    r -= 16
                    for b in br:
                        bw.write(b, 1)
                    br = []
                if t > 1:  # history coefficient: one correction bit
                    br.append(t & 1)
                    continue
                flush()
                code, ln = enc_ac[(r << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
                for b in br:
                    bw.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                be.extend(br)
                if eobrun == 0x7FFF or len(be) > 900:
                    flush()
    flush()


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    scans: list[tuple[list[int], int, int, int, int]] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """uint8 HxW (grey) or HxWx3 (RGB) -> progressive (SOF2) JFIF bytes.

    Default scan script is libjpeg-shaped: interleaved DC first pass at
    Al=1 plus a DC refinement scan, spectrally-split luma AC first passes
    at Al=2 refined successively to 0, chroma AC at Al=1 refined to 0.
    `scans` overrides it: [(component_indexes, Ss, Se, Ah, Al), ...].
    restart_interval>0 writes DRI and emits RSTn every that many MCUs
    (interleaved DC scans) / blocks (non-interleaved scans)."""
    h, w, samps, qids, qtables, comp_blocks, mcux, mcuy = _prepare_components(
        arr, quality, subsample
    )
    ncomp = len(samps)
    if scans is None:
        if ncomp == 1:
            scans = [
                ([0], 0, 0, 0, 1),
                ([0], 1, 5, 0, 2),
                ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1),
                ([0], 0, 0, 1, 0),
                ([0], 1, 63, 1, 0),
            ]
        else:
            scans = [
                ([0, 1, 2], 0, 0, 0, 1),
                ([0], 1, 5, 0, 2),
                ([2], 1, 63, 0, 1),
                ([1], 1, 63, 0, 1),
                ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1),
                ([0, 1, 2], 0, 0, 1, 0),
                ([2], 1, 63, 1, 0),
                ([0], 1, 63, 1, 0),
                ([1], 1, 63, 1, 0),
            ]

    dc_counts, dc_values = _flat_table(list(range(12)), 4)
    # progressive AC alphabet: EOBn (s=0, r<15), ZRL, and run/size pairs
    ac_syms = [(r << 4) | s for r in range(16) for s in range(11)
               if not (s == 0 and r == 15)] + [0xF0]
    ac_counts, ac_values = _flat_table(sorted(ac_syms), 8)
    dc_tab = _HuffTable(dc_counts, dc_values)
    ac_tab = _HuffTable(ac_counts, ac_values)
    enc_dc = {v: (c, l) for (l, c), v in dc_tab.lookup.items()}
    enc_ac = {v: (c, l) for (l, c), v in ac_tab.lookup.items()}

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    grids = [
        _comp_grid(w, h, sh, sv, hmax, vmax) for (sh, sv) in samps
    ]

    out = _headers(h, w, samps, qids, qtables, 0xC2)
    for cls, (counts, values) in ((0, (dc_counts, dc_values)),
                                  (1, (ac_counts, ac_values))):
        body = bytes([cls << 4]) + bytes(counts) + values
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)

    for comps_in_scan, ss, se, ah, al in scans:
        sos = bytes([len(comps_in_scan)])
        for ci in comps_in_scan:
            sos += bytes((ci + 1, 0x00))
        sos += bytes((ss, se, (ah << 4) | al))
        out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos
        bw_ = _BitWriter()
        if ss == 0:  # DC scan: restart units are MCUs (or blocks if ns==1)
            preds = {ci: 0 for ci in comps_in_scan}
            if len(comps_in_scan) > 1:  # interleaved: MCU traversal
                units = []
                for m in range(mcux * mcuy):
                    my, mx = divmod(m, mcux)
                    mcu = []
                    for ci in comps_in_scan:
                        sh, sv = samps[ci]
                        for by in range(sv):
                            for bx in range(sh):
                                mcu.append(
                                    (ci, comp_blocks[ci][my * sv + by, mx * sh + bx])
                                )
                    units.append(mcu)
            else:  # single component: its own block grid
                ci = comps_in_scan[0]
                bh_g, bw_g = grids[ci]
                units = [
                    [(ci, comp_blocks[ci][by, bx])]
                    for by in range(bh_g) for bx in range(bw_g)
                ]
            rst = 0
            for m, mcu in enumerate(units):
                if restart_interval and m and m % restart_interval == 0:
                    bw_.raw_marker(0xD0 + (rst & 7))
                    rst += 1
                    preds = {ci: 0 for ci in comps_in_scan}
                for ci, zz in mcu:
                    if ah == 0:
                        v = int(zz[0]) >> al
                        diff = v - preds[ci]
                        preds[ci] = v
                        size, mag = _magnitude(diff)
                        code, ln = enc_dc[size]
                        bw_.write(code, ln)
                        if size:
                            bw_.write(mag, size)
                    else:
                        bw_.write((int(zz[0]) >> al) & 1, 1)
        else:  # AC scan: single component, restart units are blocks
            ci = comps_in_scan[0]
            if ah == 0:
                _emit_ac_first(bw_, comp_blocks[ci], grids[ci], ss, se, al,
                               enc_ac, restart_interval)
            else:
                _emit_ac_refine(bw_, comp_blocks[ci], grids[ci], ss, se, al,
                                enc_ac, restart_interval)
        bw_.align()
        out += bw_.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder

def jpeg_dimensions(data: bytes) -> tuple[int, int, bool]:
    """(width, height, progressive) from the SOF header — no decode.
    Marker-walk only, so it works for any DCT JPEG (used by
    ops/multimodal.probe_media)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9 or marker == 0xDA:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            _prec, h, w = struct.unpack(">BHH", data[pos + 2:pos + 7])
            return int(w), int(h), marker in (0xC2, 0xC6, 0xCA, 0xCE)
        pos += seglen
    raise ValueError("no SOF marker found")


def decode_jpeg(data: bytes) -> np.ndarray:
    """DCT JFIF bytes -> uint8 HxW (grey) or HxWx3 (RGB).

    Supports SOF0/SOF1 (baseline/extended sequential) AND SOF2
    (progressive: spectral selection + successive approximation, DC and
    AC refinement scans, EOB runs, interleaved and non-interleaved
    traversal) with 1 or 3 components, arbitrary DHT/DQT table sets
    (redefinable between scans), 4:4:4 / 4:2:2 / 4:2:0 sampling, restart
    intervals. Hierarchical/lossless/arithmetic coding raise."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) comps: list of (cid, sh, sv, qid)
    progressive = False
    coefs = None  # progressive: per-component coefficient accumulators

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG (segment length cut off)")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError(
                f"truncated JPEG (marker {marker:#x} declares {seglen} "
                f"bytes, {len(data) - pos} remain)")
        body = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                i += 1
                need = 128 if prec else 64
                if i + need > len(body):
                    raise ValueError("truncated DQT segment")
                if prec:
                    vals = np.frombuffer(body[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(body[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                t = np.zeros(64, dtype=np.int64)
                t[_ZIGZAG] = vals
                qtables[tid] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1:i + 17])
                n = sum(counts)
                if len(counts) < 16 or i + 17 + n > len(body):
                    raise ValueError("truncated DHT segment")
                values = body[i + 17:i + 17 + n]
                htables[(cls, tid)] = _HuffTable(counts, values)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential), SOF2 (prog)
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, samp, qid = body[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0x0F, qid))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding (SOF marker {marker:#x})")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_list = []
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                scan_list.append((cid, tabs >> 4, tabs & 0x0F))
            pos += seglen
            if not progressive:
                scan_tabs = {cid: (d, a) for cid, d, a in scan_list}
                return _decode_scan(
                    data, pos, frame, scan_tabs, qtables, htables,
                    restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if coefs is None:
                _h0, _w0, comps = frame
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-_w0 // (8 * hmax))
                mcuy = -(-_h0 // (8 * vmax))
                coefs = [
                    np.zeros((mcuy * sv, mcux * sh, 64), dtype=np.int64)
                    for (_, sh, sv, _) in comps
                ]
            pos = _decode_prog_scan(
                data, pos, frame, scan_list, ss, se, ahal >> 4, ahal & 0x0F,
                htables, coefs, restart_interval,
            )
            continue
        # APPn / COM / others: skip
        pos += seglen
    if progressive and coefs is not None:
        return _reconstruct(frame, coefs, qtables)
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan_tabs, qtables, htables,
                 restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy

    reader = _BitReader(data, pos)
    # coefficient store per component: [by, bx, 64] zigzag order
    coefs = [
        np.zeros((mcuy * sv, mcux * sh, 64), dtype=np.int64)
        for (_, sh, sv, _) in comps
    ]
    preds = [0] * len(comps)
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.reset_and_expect_rst(rst)
            rst += 1
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (cid, sh, sv, _qid) in enumerate(comps):
            dct, act = scan_tabs[cid]
            dc_tab = htables[(0, dct)]
            ac_tab = htables[(1, act)]
            for by in range(sv):
                for bx in range(sh):
                    zz = coefs[ci][my * sv + by, mx * sh + bx]
                    size = reader.decode_symbol(dc_tab)
                    diff = _extend(reader.receive(size), size)
                    preds[ci] += diff
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        sym = reader.decode_symbol(ac_tab)
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            k += 16
                            continue
                        run, size = sym >> 4, sym & 0x0F
                        k += run
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(reader.receive(size), size)
                        k += 1

    return _reconstruct(frame, coefs, qtables)


def _decode_prog_scan(data, pos, frame, scan_list, ss, se, ah, al,
                      htables, coefs, restart_interval):
    """One progressive scan into the persistent coefficient store;
    returns the byte position just past the scan's entropy data.

    DC scans (Ss=0): interleaved MCU traversal when ns>1, else the
    component's own block grid; first pass (Ah=0) codes diffs of DC>>Al,
    refinements append one bit at position Al. AC scans (Ss>=1, ns==1):
    first pass is run/size with EOB runs; refinement follows T.81
    G.1.2.3 (correction bits for history coefficients, run+sign for
    newly-nonzero ones)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    idx = {cid: i for i, (cid, _sh, _sv, _q) in enumerate(comps)}
    reader = _BitReader(data, pos)
    rst = 0

    if ss == 0:  # DC scan
        preds = [0] * len(comps)
        if len(scan_list) > 1:  # interleaved
            blocks = []
            for m in range(mcux * mcuy):
                my, mx = divmod(m, mcux)
                mcu = []
                for cid, dct, _act in scan_list:
                    ci = idx[cid]
                    _, sh, sv, _ = comps[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            mcu.append(
                                (ci, dct, coefs[ci][my * sv + by, mx * sh + bx])
                            )
                blocks.append(mcu)
        else:
            cid, dct, _act = scan_list[0]
            ci = idx[cid]
            _, sh, sv, _ = comps[ci]
            bh_g, bw_g = _comp_grid(w, h, sh, sv, hmax, vmax)
            blocks = [
                [(ci, dct, coefs[ci][by, bx])]
                for by in range(bh_g) for bx in range(bw_g)
            ]
        for m, mcu in enumerate(blocks):
            if restart_interval and m and m % restart_interval == 0:
                reader.reset_and_expect_rst(rst)
                rst += 1
                preds = [0] * len(comps)
            for ci, dct, zz in mcu:
                if ah == 0:
                    size = reader.decode_symbol(htables[(0, dct)])
                    diff = _extend(reader.receive(size), size)
                    preds[ci] += diff
                    zz[0] = preds[ci] << al
                elif reader.read_bit():
                    zz[0] |= 1 << al
        return reader.pos

    # AC scan: exactly one component, non-interleaved
    if len(scan_list) != 1:
        raise ValueError("progressive AC scan must have one component")
    cid, _dct, act = scan_list[0]
    ci = idx[cid]
    _, sh, sv, _ = comps[ci]
    ac_tab = htables[(1, act)]
    bh_g, bw_g = _comp_grid(w, h, sh, sv, hmax, vmax)
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    bi = 0
    for by in range(bh_g):
        for bx in range(bw_g):
            if restart_interval and bi and bi % restart_interval == 0:
                reader.reset_and_expect_rst(rst)
                rst += 1
                eobrun = 0
            bi += 1
            zz = coefs[ci][by, bx]
            if ah == 0:  # first pass for this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = reader.decode_symbol(ac_tab)
                    r, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run past band end")
                    zz[k] = _extend(reader.receive(s), s) << al
                    k += 1
                continue
            # refinement pass (T.81 G.1.2.3)
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = reader.decode_symbol(ac_tab)
                    r, s = sym >> 4, sym & 0x0F
                    newval = 0
                    if s == 0:
                        if r != 15:  # EOBn: run of end-of-band blocks
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.receive(r)
                            break
                        # ZRL: skip 16 zero-history coefficients
                    else:
                        newval = p1 if reader.read_bit() else m1
                    while k <= se:
                        coef = int(zz[k])
                        if coef != 0:
                            if reader.read_bit() and (coef & p1) == 0:
                                zz[k] = coef + (p1 if coef >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval:
                        if k > se:
                            raise ValueError("AC refinement run past band end")
                        zz[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:
                    coef = int(zz[k])
                    if coef != 0:
                        if reader.read_bit() and (coef & p1) == 0:
                            zz[k] = coef + (p1 if coef >= 0 else m1)
                    k += 1
                eobrun -= 1
    return reader.pos


def _reconstruct(frame, coefs, qtables):
    """Dequantize + IDCT + upsample + color transform — shared by the
    baseline single-scan path and the progressive multi-scan path."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # dequantize + IDCT, batched per component
    planes = []
    for ci, (cid, sh, sv, qid) in enumerate(comps):
        zz = coefs[ci]
        nat = np.zeros_like(zz)
        nat[:, :, _ZIGZAG] = zz
        q = qtables[qid].reshape(64).astype(np.int64)
        blocks = (nat * q[None, None, :]).reshape(
            zz.shape[0], zz.shape[1], 8, 8
        ).astype(np.float64)
        pix = np.einsum("ji,abjk,kl->abil", _C, blocks, _C)
        plane = pix.transpose(0, 2, 1, 3).reshape(
            zz.shape[0] * 8, zz.shape[1] * 8
        ) + 128.0
        # upsample to full-res grid, crop
        ry, rx = vmax // sv, hmax // sh
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component scan")
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
