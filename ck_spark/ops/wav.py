"""WAV (RIFF PCM) decoding, stdlib-only — closes the audio half of the
multimodal decode seam (ops/multimodal.py). The reference treats media as
opaque blobs handed to external models (SURVEY §2: ck itself embeds text;
media handling is the training-pipeline extension mandated by the round
brief); here decode is real so feature extraction runs over SAMPLES, not
payload bytes.

`wave` handles the RIFF framing; sample conversion is numpy-vectorized
(8-bit unsigned, 16/32-bit little-endian signed, 24-bit packed with manual
sign extension). No third-party codec libraries involved.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV payload to (samples, framerate).

    samples: float64 array of shape (n_frames, n_channels), in the
    original integer sample units (no normalization — callers that want
    [-1, 1] divide by 2**(bits-1)).
    """
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n = w.getnframes()
            sw = w.getsampwidth()
            ch = w.getnchannels()
            rate = w.getframerate()
            raw = w.readframes(n)
    except wave.Error:
        # non-PCM WAV: dispatch on the fmt tag (IMA ADPCM / G.711 are
        # real compressed decoders in ops/adpcm.py)
        from ck_spark.ops.adpcm import (
            WAV_FORMAT_NAMES, decode_wav_g711, decode_wav_ima, parse_riff,
        )

        tag = parse_riff(payload)["format_tag"]
        if tag == 0x11:
            return decode_wav_ima(payload)
        if tag in (0x06, 0x07):
            return decode_wav_g711(payload)
        raise NotImplementedError(
            f"unsupported WAV format tag {tag:#x} "
            f"({WAV_FORMAT_NAMES.get(tag, 'unknown')})"
        )
    if sw == 1:
        # 8-bit WAV is unsigned, midpoint 128
        a = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    elif sw == 2:
        a = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif sw == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)  # sign-extend 24-bit
        a = v.astype(np.float64)
    elif sw == 4:
        a = np.frombuffer(raw, dtype="<i4").astype(np.float64)
    else:
        raise NotImplementedError(f"unsupported WAV sample width: {sw} bytes")
    return a.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, framerate: int = 16_000,
               sampwidth: int = 2) -> bytes:
    """Inverse helper (tests / fixtures): integer samples -> WAV bytes."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(sampwidth)
        w.setframerate(framerate)
        if sampwidth == 1:
            raw = (s.astype(np.int64) + 128).clip(0, 255).astype(np.uint8).tobytes()
        elif sampwidth == 2:
            raw = s.astype("<i2").tobytes()
        elif sampwidth == 4:
            raw = s.astype("<i4").tobytes()
        else:
            raise NotImplementedError(f"unsupported sample width: {sampwidth}")
        w.writeframes(raw)
    return buf.getvalue()
