"""GIF codec, pure Python/numpy — real LZW-compressed images (and
animations) for the multimodal seam (ops/multimodal.py).

GIF is fully formulaic from the public GIF89a specification: variable-
width LSB-first LZW with clear/end codes and a 4096-entry dictionary,
palette indexing, optional interlacing, graphic-control extensions for
frame delay/transparency/disposal. No tabulated perceptual data, so an
exact no-third-party-lib implementation is possible (like ops/flac.py
for audio) — this extends the real-decode image surface beyond PNG and
JPEG.

Encoder: GIF89a, global color table built from the image's colors
(<=256 unique required — quantization is a separate concern; callers
wanting lossy palettes quantize first), full LZW compression with
dictionary growth + reset, multi-frame animation support with per-frame
delays. Decoder: complete static + animated surface — interlace,
local color tables, transparency, disposal methods 'none/keep' and
'restore background', sub-block reassembly — returning composited RGB
frames.

Scale note: like the other codecs here, GIF work runs inside
Arrow-batched mapInPandas over binary columns; LZW decode is the only
sequential inner loop and is bounded per payload.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------ LZW
def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF variable-width LZW: codes LSB-first, dictionary grows to 4096
    then a clear code resets it."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix: tuple[int, ...] = ()
    for px in indices.ravel().tolist():
        cand = prefix + (px,)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prefix = (px,)
    if prefix:
        emit(table[prefix], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    # wrap in <=255-byte sub-blocks
    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i:i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return bytes(blocks)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while pos < len(data) or nbits >= width:
        while nbits < width and pos < len(data):
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} of {len(table)}")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError(f"LZW stream short: {len(out)}/{n_pixels} pixels")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _INTERLACE_PASSES])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _INTERLACE_PASSES])
    return rows[order]


# ------------------------------------------------------------- encoding
def _build_palette(frames: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if colors.shape[0] > 256:
        raise ValueError(
            f"{colors.shape[0]} unique colors; GIF palettes hold 256 — "
            "quantize first"
        )
    # map each pixel to its palette index via lexicographic packing
    keys = (colors[:, 0].astype(np.int64) << 16) | \
           (colors[:, 1].astype(np.int64) << 8) | colors[:, 2].astype(np.int64)
    order = np.argsort(keys)
    skeys = keys[order]
    index_frames = []
    for f in frames:
        fk = (f[:, :, 0].astype(np.int64) << 16) | \
             (f[:, :, 1].astype(np.int64) << 8) | f[:, :, 2].astype(np.int64)
        idx = order[np.searchsorted(skeys, fk.ravel())]
        index_frames.append(idx.astype(np.uint8).reshape(f.shape[:2]))
    return colors.astype(np.uint8), index_frames


def encode_gif(frames: np.ndarray, delays_cs: int | list[int] = 10,
               interlace: bool = False, loop: bool = True) -> bytes:
    """RGB uint8 array (H, W, 3) or (N, H, W, 3) -> GIF bytes.

    <=256 unique colors across all frames (GIF is palette-indexed).
    Multi-frame input writes a GIF89a animation with per-frame delays in
    centiseconds (int -> same delay every frame)."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim == 3:
        f = f[None]
    n, h, w, _ = f.shape
    palette, index_frames = _build_palette(list(f))
    # palette size: power of two >= max(2, len)
    pbits = max(1, int(np.ceil(np.log2(max(2, palette.shape[0])))))
    ptable = np.zeros((1 << pbits, 3), dtype=np.uint8)
    ptable[: palette.shape[0]] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((pbits - 1) << 4) | (pbits - 1), 0, 0])
    out += ptable.tobytes()
    if n > 1 and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    delays = [delays_cs] * n if isinstance(delays_cs, int) else list(delays_cs)
    mcs = max(2, pbits)
    for i in range(n):
        if n > 1:
            out += b"\x21\xf9\x04" + bytes([0]) + struct.pack(
                "<H", int(delays[i])) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0x00])
        idx = index_frames[i]
        if interlace:
            idx = _interlace(idx)
        out += bytes([mcs])
        out += _lzw_encode(idx, mcs)
    out += b"\x3b"
    return bytes(out)


# ------------------------------------------------------------- decoding
def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> composited RGB frames (N, H, W, 3) uint8 (N=1 for a
    static image). Handles interlace, local palettes, transparency and
    disposal methods 0/1 (keep) and 2 (restore background)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed, bg_index, _aspect = payload[10], payload[11], payload[12]
    pos = 13
    global_pal = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        global_pal = np.frombuffer(
            payload[pos:pos + size * 3], dtype=np.uint8).reshape(size, 3)
        pos += size * 3

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if global_pal is not None and bg_index < global_pal.shape[0]:
        canvas[:] = global_pal[bg_index]
    bg_fill = canvas[0, 0].copy() if h and w else np.zeros(3, np.uint8)
    frames = []
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                blen = payload[pos]
                gc = payload[pos + 1:pos + 1 + blen]
                disposal = (gc[0] >> 2) & 0x07
                transparent = gc[3] if gc[0] & 0x01 else None
                pos += 1 + blen
            while True:  # skip (remaining) sub-blocks
                blen = payload[pos]
                pos += 1
                if blen == 0:
                    break
                pos += blen
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block {block:#x} at {pos - 1}")
        left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos)
        pos += 8
        if left + fw > w or top + fh > h:
            raise ValueError(
                f"frame rectangle {fw}x{fh}@({left},{top}) exceeds the "
                f"{w}x{h} logical screen"
            )
        fpacked = payload[pos]
        pos += 1
        pal = global_pal
        if fpacked & 0x80:
            size = 2 << (fpacked & 0x07)
            pal = np.frombuffer(
                payload[pos:pos + size * 3], dtype=np.uint8).reshape(size, 3)
            pos += size * 3
        if pal is None:
            raise ValueError("GIF image without any color table")
        mcs = payload[pos]
        pos += 1
        lzw = bytearray()
        while True:
            blen = payload[pos]
            pos += 1
            if blen == 0:
                break
            lzw += payload[pos:pos + blen]
            pos += blen
        idx = _lzw_decode(bytes(lzw), mcs, fw * fh).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        if np.any(idx >= pal.shape[0]):
            raise ValueError("palette index out of range")
        rgb = pal[idx]
        region = canvas[top:top + fh, left:left + fw]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background
            canvas[top:top + fh, left:left + fw] = bg_fill
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames)


def gif_info(payload: bytes) -> dict:
    """Header/stream probe (no pixel decode) for probe_media."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    if packed & 0x80:
        pos += (2 << (packed & 0x07)) * 3
    n_frames = 0
    delay_cs = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            if payload[pos] == 0xF9:
                delay_cs += struct.unpack_from("<H", payload, pos + 3)[0]
            pos += 1
            while True:
                blen = payload[pos]
                pos += 1
                if blen == 0:
                    break
                pos += blen
            continue
        if block != 0x2C:
            break
        n_frames += 1
        _l, _t, _fw, _fh = struct.unpack_from("<HHHH", payload, pos)
        pos += 8
        fpacked = payload[pos]
        pos += 1
        if fpacked & 0x80:
            pos += (2 << (fpacked & 0x07)) * 3
        pos += 1  # min code size
        while True:
            blen = payload[pos]
            pos += 1
            if blen == 0:
                break
            pos += blen
    return {
        "codec": f"gif/{payload[3:6].decode()}",
        "width": int(w), "height": int(h), "n_frames": n_frames,
        "duration_ms": delay_cs * 10,
    }
