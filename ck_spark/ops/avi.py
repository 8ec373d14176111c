"""Pure-Python uncompressed-AVI (RIFF) video codec — encoder + decoder.

Closes the last multimodal decode stub with a REAL container parse: AVI
is a RIFF file (avih main header, one 'vids' stream with a
BITMAPINFOHEADER, frames as '00db' chunks of bottom-up BGR DIB rows
padded to 4 bytes). Uncompressed AVI (biCompression=0) needs no codec
library — exactly like ops/wav.py needs no audio library — so decode,
frame sampling and pixel statistics are sample-accurate. Compressed
video (mp4/h264/...) still raises NotImplementedError in
ops/multimodal.py: that genuinely requires a codec lib this container
doesn't have.

Format layout is public knowledge (Microsoft AVI RIFF reference / OpenDML
spec). The reference repo has no video path at all — this exists for the
training-data-pipeline mandate (multimodal columns), not ck parity.
"""

from __future__ import annotations

import struct

import numpy as np


def _pad2(n: int) -> int:
    return n + (n & 1)  # RIFF chunks are word-aligned


def encode_avi(frames: np.ndarray, fps: int = 25) -> bytes:
    """frames: uint8 array (n, h, w, 3) RGB -> uncompressed AVI bytes."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3) RGB uint8")
    n, h, w, _ = frames.shape
    stride = ((w * 3 + 3) // 4) * 4
    frame_size = stride * h

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags (AVIF_HASINDEX off, AVIF_WASCAPTUREFILE off; 0x10=trust ckType)
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)

    movi_frames = []
    for f in range(n):
        rows = []
        for y in range(h - 1, -1, -1):  # DIB rows are bottom-up
            row = frames[f, y, :, ::-1].tobytes()  # RGB -> BGR
            rows.append(row + b"\x00" * (stride - len(row)))
        movi_frames.append(chunk(b"00db", b"".join(rows)))

    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(movi_frames))
    riff_payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _iter_chunks(buf: bytes, start: int, end: int):
    off = start
    while off + 8 <= end:
        fourcc = buf[off : off + 4]
        (size,) = struct.unpack_from("<I", buf, off + 4)
        yield fourcc, off + 8, size
        off += 8 + _pad2(size)


def decode_avi(data: bytes) -> np.ndarray:
    """Uncompressed AVI bytes -> uint8 frames (n, h, w, 3) RGB."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') file")
    w = h = bitcount = None
    compression = None
    frames: list[np.ndarray] = []

    def walk(start: int, end: int) -> None:
        nonlocal w, h, bitcount, compression
        for fourcc, off, size in _iter_chunks(data, start, end):
            if fourcc == b"LIST":
                walk(off + 4, off + size)  # skip the list-kind fourcc
            elif fourcc == b"strf" and w is None:
                (_bisz, bw, bh, _planes, bc, comp) = struct.unpack_from(
                    "<IiiHHI", data, off
                )
                w, h, bitcount, compression = bw, abs(bh), bc, comp
            elif fourcc in (b"00db", b"00dc") and size:
                frames.append(np.frombuffer(data, np.uint8, size, off))

    walk(12, 8 + struct.unpack_from("<I", data, 4)[0])
    if w is None:
        raise ValueError("AVI has no video stream format (strf)")
    if compression != 0 or bitcount != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bit AVI supported (biCompression="
            f"{compression}, biBitCount={bitcount}) — compressed video "
            "needs a codec library"
        )
    stride = ((w * 3 + 3) // 4) * 4
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames):
        if raw.size < stride * h:
            raise ValueError(f"frame {i}: {raw.size} bytes < {stride * h}")
        rows = raw[: stride * h].reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        out[i] = rows[::-1, :, ::-1]  # bottom-up BGR -> top-down RGB
    return out


def avi_dimensions(data: bytes) -> tuple[int, int, int]:
    """(n_frames, height, width) without materializing pixel arrays."""
    frames = decode_avi(data)  # small files in tests; header-only fast path
    return frames.shape[0], frames.shape[1], frames.shape[2]
