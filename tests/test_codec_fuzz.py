"""Decoder robustness: arbitrary garbage and truncated/bit-flipped real
payloads must raise a clean ValueError/NotImplementedError (or decode
successfully, for flips in sample data that no checksum covers in
formats without one) — never hang, loop forever, or crash the
interpreter. Media columns at 100 TB contain malformed payloads as a
fact of life; probe_media's per-row error capture relies on decoders
failing with civilized exceptions."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ck_spark.ops.adpcm import decode_wav_g711, decode_wav_ima
from ck_spark.ops.avi import decode_avi
from ck_spark.ops.flac import decode_flac
from ck_spark.ops.gif import decode_gif, gif_info
from ck_spark.ops.jpeg import decode_jpeg
from ck_spark.ops.mp4 import mp4_info
from ck_spark.ops.png import decode_png
from ck_spark.ops.wav import decode_wav

_DECODERS = [decode_flac, decode_gif, gif_info, decode_png, decode_jpeg,
             decode_avi, mp4_info, decode_wav, decode_wav_ima,
             decode_wav_g711]

_OK = (ValueError, NotImplementedError, KeyError, IndexError, EOFError,
       struct_error := __import__("struct").error,
       __import__("zlib").error, __import__("wave").Error)


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_garbage_bytes_raise_cleanly(payload):
    for dec in _DECODERS:
        try:
            dec(payload)
        except _OK:
            pass  # clean, typed failure


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10**9),
       st.integers(min_value=1, max_value=400))
def test_truncated_real_payloads_raise_cleanly(seed, cut):
    rng = np.random.default_rng(seed)
    from ck_spark.ops.adpcm import encode_wav_ima
    from ck_spark.ops.flac import encode_flac
    from ck_spark.ops.gif import encode_gif

    tone = rng.integers(-9000, 9000, 600)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 8, (9, 11))]
    for enc, dec in [
        (encode_flac(tone), decode_flac),
        (encode_gif(img), decode_gif),
        (encode_wav_ima(tone), decode_wav_ima),
    ]:
        trunc = enc[: max(0, len(enc) - cut)]
        try:
            dec(trunc)
        except _OK:
            pass


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10**9))
def test_bitflipped_payloads_never_hang(seed):
    rng = np.random.default_rng(seed)
    from ck_spark.ops.flac import encode_flac
    from ck_spark.ops.gif import encode_gif

    tone = rng.integers(-9000, 9000, 500)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 8, (7, 13))]
    for enc, dec in [(encode_flac(tone), decode_flac),
                     (encode_gif(img), decode_gif)]:
        b = bytearray(enc)
        for _ in range(3):
            b[rng.integers(0, len(b))] ^= 1 << rng.integers(0, 8)
        try:
            dec(bytes(b))  # either decodes or raises — both fine
        except _OK:
            pass


def test_flac_flipped_sample_bits_always_caught():
    """FLAC has CRC+MD5: any flip in the FRAME region must be detected
    (never silently wrong samples) when verify=True."""
    rng = np.random.default_rng(3)
    tone = rng.integers(-9000, 9000, 2000)
    from ck_spark.ops.flac import encode_flac

    enc = encode_flac(tone)
    frames_start = 42  # fLaC + metadata header + STREAMINFO
    for trial in range(40):
        b = bytearray(enc)
        pos = int(rng.integers(frames_start, len(b)))
        b[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            dec, _ = decode_flac(bytes(b))
            assert np.array_equal(dec.ravel().astype(np.int64), tone), \
                "flip decoded to DIFFERENT samples without an error"
        except _OK:
            pass
