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


MJPG_FOURCC = 0x47504A4D  # 'MJPG' little-endian in biCompression


def encode_avi(
    frames: np.ndarray, fps: int = 25, codec: str = "dib", quality: int = 85
) -> bytes:
    """frames: uint8 array (n, h, w, 3) RGB -> AVI bytes.

    codec='dib' writes uncompressed bottom-up BGR frames; codec='mjpg'
    writes Motion-JPEG — each frame is a complete baseline JPEG from
    ops/jpeg.py (tables embedded, so any standard MJPEG consumer decodes
    it; no AVI1-style table stripping)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3) RGB uint8")
    if codec not in ("dib", "mjpg"):
        raise ValueError(f"unknown AVI codec: {codec!r} (dib|mjpg)")
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
    handler = b"DIB " if codec == "dib" else b"MJPG"
    compression = 0 if codec == "dib" else MJPG_FOURCC
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", handler, 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, frame_size, 0, 0, 0, 0
    )

    movi_frames = []
    if codec == "mjpg":
        from ck_spark.ops.jpeg import encode_jpeg

        for f in range(n):
            movi_frames.append(chunk(b"00dc", encode_jpeg(frames[f], quality=quality)))
    else:
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
    if compression == MJPG_FOURCC:
        # Motion-JPEG: every chunk is a complete JPEG — decode through the
        # built-in T.81 codec (frames must carry their own tables; the
        # AVI1 stripped-table variant would fail loudly in decode_jpeg)
        from ck_spark.ops.jpeg import decode_jpeg

        imgs = []
        for i, raw in enumerate(frames):
            img = decode_jpeg(raw.tobytes())
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            if img.shape[0] != h or img.shape[1] != w:
                raise ValueError(
                    f"MJPEG frame {i} is {img.shape[1]}x{img.shape[0]}, "
                    f"stream header says {w}x{h}"
                )
            imgs.append(img)
        return (np.stack(imgs) if imgs
                else np.empty((0, h, w, 3), dtype=np.uint8))
    if compression != 0 or bitcount != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bit and MJPG AVI supported "
            f"(biCompression={compression}, biBitCount={bitcount}) — other "
            "compressed video needs a codec library"
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


def avi_codec(data: bytes) -> str:
    """Video codec tag from the strf header only (no frame decode):
    'dib24' for uncompressed, 'mjpg' for Motion-JPEG, else the raw
    fourcc/number."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') file")

    found: list[str] = []

    def walk(start: int, end: int) -> None:
        for fourcc, off, size in _iter_chunks(data, start, end):
            if found:
                return
            if fourcc == b"LIST":
                walk(off + 4, off + size)
            elif fourcc == b"strf":
                _bisz, _w, _h, _planes, bc, comp = struct.unpack_from(
                    "<IiiHHI", data, off
                )
                if comp == 0:
                    found.append(f"dib{bc}")
                elif comp == MJPG_FOURCC:
                    found.append("mjpg")
                else:
                    tag = struct.pack("<I", comp)
                    found.append(
                        tag.decode("ascii").strip().lower()
                        if all(32 <= b < 127 for b in tag) else str(comp)
                    )

    walk(12, 8 + struct.unpack_from("<I", data, 4)[0])
    if not found:
        raise ValueError("AVI has no video stream format (strf)")
    return found[0]
