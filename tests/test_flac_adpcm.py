"""FLAC + compressed-WAV (IMA ADPCM, G.711) codec tests.

These close most of the round-3 'compressed-media stub' weak item: FLAC
is a real compressed-audio BITSTREAM (LPC/fixed prediction + Rice
entropy coding + CRC framing) and IMA ADPCM / G.711 are real lossy
compressed PCM — all fully formulaic from public specs, so exact
implementations need no third-party codec library. The remaining honest
boundary is perceptual transform codecs (mp3 payload / aac / h264)."""

import numpy as np
import pytest

from ck_spark.ops.adpcm import (
    IMA_INDEX_ADJUST,
    IMA_STEPS,
    alaw_decode_table,
    alaw_encode,
    decode_wav_g711,
    decode_wav_ima,
    encode_wav_g711,
    encode_wav_ima,
    mulaw_decode_table,
    mulaw_encode,
    parse_riff,
)
from ck_spark.ops.flac import decode_flac, encode_flac, flac_info


def _tone(n=9000, amp=12000, seed=7):
    t = np.arange(n)
    rng = np.random.default_rng(seed)
    return (amp * np.sin(t / 23) + rng.integers(-300, 300, n)).astype(np.int64)


# ------------------------------------------------------------------ FLAC
def test_flac_lossless_roundtrip_mono():
    x = _tone()
    enc = encode_flac(x, rate=16_000)
    dec, rate = decode_flac(enc)
    assert rate == 16_000
    assert np.array_equal(dec.ravel().astype(np.int64), x)
    # real compression on a tonal signal (the +-300 dither keeps ~10
    # bits of residual entropy per sample; 16 -> ~10.2 bits here)
    assert len(enc) < 0.75 * x.size * 2


def test_flac_lossless_roundtrip_stereo_decorrelated():
    x = _tone()
    s = np.stack([x, x + np.random.default_rng(1).integers(-8, 8, x.size)], 1)
    enc_dec = encode_flac(s, rate=44_100, stereo_decorrelate=True)
    enc_ind = encode_flac(s, rate=44_100, stereo_decorrelate=False)
    for enc in (enc_dec, enc_ind):
        dec, rate = decode_flac(enc)
        assert rate == 44_100
        assert np.array_equal(dec.astype(np.int64), s)
    # correlated channels: a decorrelated assignment must win
    assert len(enc_dec) < len(enc_ind)


def test_flac_lpc_beats_fixed_on_ar_signal():
    rng = np.random.default_rng(1)
    n = 8192
    e = rng.integers(-60, 60, n).astype(np.float64)
    x = np.zeros(n)
    for i in range(2, n):
        x[i] = 1.6 * x[i - 1] - 0.72 * x[i - 2] + e[i]
    x = np.clip(x, -30000, 30000).astype(np.int64)
    enc_lpc = encode_flac(x, use_lpc=True)
    enc_fix = encode_flac(x, use_lpc=False)
    for enc in (enc_lpc, enc_fix):
        dec, _ = decode_flac(enc)
        assert np.array_equal(dec.ravel().astype(np.int64), x)
    assert len(enc_lpc) < len(enc_fix)


def test_flac_edge_payloads():
    for x in (np.zeros(100, dtype=np.int64), np.full(5000, -123),
              np.array([5]), np.array([], dtype=np.int64)):
        dec, _ = decode_flac(encode_flac(x))
        assert np.array_equal(dec.ravel().astype(np.int64), x)
    # white noise: must stay lossless even when incompressible
    noise = np.random.default_rng(3).integers(-32768, 32767, 5000)
    dec, _ = decode_flac(encode_flac(noise))
    assert np.array_equal(dec.ravel().astype(np.int64), noise)


def test_flac_escape_spike_signal_roundtrips():
    """Near-silent 32-bit signal with one huge spike: Rice parameters
    cannot hold the spike's unary run, so the encoder must use the raw
    escape with a correctly-sized (<=31-bit) width — the review found the
    old path wrote width 32 into the 5-bit field (truncating to 0)."""
    x = np.zeros(4096, dtype=np.int64)
    x[0] = 1
    x[2000] = 2 ** 29 + 2 ** 13
    enc = encode_flac(x, bps=32)
    dec, _ = decode_flac(enc)  # CRC+MD5 verified
    assert np.array_equal(dec.ravel().astype(np.int64), x)
    # and a spike too large for any escape must fall back losslessly
    y = np.zeros(4096, dtype=np.int64)
    y[100] = 2 ** 31 - 1
    y[101] = -(2 ** 31)
    dec2, _ = decode_flac(encode_flac(y, bps=32))
    assert np.array_equal(dec2.ravel().astype(np.int64), y)


def test_flac_unknown_length_stream_decodes_to_exhaustion():
    """STREAMINFO total-samples == 0 is spec-legal 'unknown length':
    frames must still decode (previously returned 0 samples silently)."""
    x = _tone(5000)
    enc = bytearray(encode_flac(x, rate=16_000))
    # zero the 36-bit total-samples field (last 4.5 bytes of the first 18
    # STREAMINFO bytes: bits 140..175 -> bytes 8+17..8+21 within payload)
    si = 8  # fLaC + 4-byte metadata header
    enc[si + 13] &= 0xF0  # low nibble = top 4 bits of n_total
    for b in range(14, 18):
        enc[si + b] = 0
    dec, rate = decode_flac(bytes(enc), verify=False)  # MD5 header intact
    assert rate == 16_000
    assert np.array_equal(dec.ravel().astype(np.int64), x)


def test_flac_reserved_sample_size_code_raises_valueerror():
    x = _tone(600)
    enc = bytearray(encode_flac(x, block_size=600))
    # frame header starts right after the 42-byte stream header; byte 3
    # of the header holds [ch(4) | sample-size(3) | reserved(1)]
    hdr = 42
    # byte 3 = [ch_code(4) | sample_size(3) | reserved(1)]
    enc[hdr + 3] = (enc[hdr + 3] & 0b11110001) | (0b011 << 1)
    with pytest.raises(ValueError, match="reserved sample size|CRC"):
        decode_flac(bytes(enc))


def test_ima_adpcm_empty_stream():
    w = encode_wav_ima(np.array([], dtype=np.int64))
    y, rate = decode_wav_ima(w)
    assert y.shape == (0, 1)


def test_flac_integrity_checks_catch_corruption():
    enc = bytearray(encode_flac(_tone(4000)))
    enc[len(enc) // 2] ^= 0x40
    with pytest.raises(ValueError, match="CRC|MD5|sync|truncated"):
        decode_flac(bytes(enc))


def test_flac_info_probe():
    s = np.stack([_tone(5000), _tone(5000, seed=9)], 1)
    info = flac_info(encode_flac(s, rate=22_050))
    assert info["codec"] == "flac/16bit"
    assert info["channels"] == 2
    assert info["sample_rate"] == 22_050
    assert info["n_frames"] == 5000
    assert info["duration_ms"] == int(5000 * 1000 / 22_050)


# ------------------------------------------------------------- IMA ADPCM
def test_ima_adpcm_roundtrip_snr_and_reference_decode():
    x = _tone(4000, amp=9000)
    w = encode_wav_ima(x, rate=16_000, samples_per_block=505)
    y, rate = decode_wav_ima(w)
    assert rate == 16_000
    assert y.shape == (4000, 1)
    err = y.ravel() - x
    snr = 10 * np.log10((x.astype(float) ** 2).mean() / (err ** 2).mean())
    assert snr > 30  # ~4:1 lossy codec, tone should decode cleanly
    assert len(w) < 0.35 * x.size * 2

    # the vectorized-across-blocks decoder must equal a scalar reference
    info = parse_riff(w)
    ref = _scalar_ima_decode(info["data"], info["block_align"])
    assert np.array_equal(ref[: info["n_samples"]],
                          y.ravel().astype(np.int64))


def _scalar_ima_decode(data: bytes, block_align: int) -> np.ndarray:
    out = []
    for b0 in range(0, len(data) // block_align * block_align, block_align):
        blk = data[b0:b0 + block_align]
        pred = int.from_bytes(blk[0:2], "little", signed=True)
        idx = blk[2]
        out.append(pred)
        for byte in blk[4:]:
            for nib in (byte & 0xF, byte >> 4):
                step = int(IMA_STEPS[idx])
                vp = step >> 3
                if nib & 1:
                    vp += step >> 2
                if nib & 2:
                    vp += step >> 1
                if nib & 4:
                    vp += step
                pred = pred - vp if nib & 8 else pred + vp
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + int(IMA_INDEX_ADJUST[nib])))
                out.append(pred)
    return np.array(out, dtype=np.int64)


def test_ima_adpcm_stereo_and_partial_tail_block():
    x = _tone(1234, amp=7000)  # not a multiple of samples_per_block
    s = np.stack([x, (x * 0.7).astype(np.int64)], 1)
    y, _ = decode_wav_ima(encode_wav_ima(s, rate=8_000))
    assert y.shape == (1234, 2)
    err = y - s
    snr = 10 * np.log10((s.astype(float) ** 2).mean() / (err ** 2).mean())
    assert snr > 30


def test_ima_tables_are_the_public_reference_tables():
    assert IMA_STEPS.size == 89
    assert IMA_STEPS[0] == 7 and IMA_STEPS[-1] == 32767
    assert np.all(np.diff(IMA_STEPS) > 0)
    assert IMA_INDEX_ADJUST[:8].tolist() == [-1, -1, -1, -1, 2, 4, 6, 8]


# ----------------------------------------------------------------- G.711
def test_g711_involution_all_codes():
    """encode(decode(code)) == code for every 8-bit code — the canonical
    G.711 self-consistency check. One exemption: mu-law code 0x7F is
    'negative zero' (0x7F and 0xFF both decode to 0; g711.c likewise
    encodes 0 as 0xFF)."""
    codes = np.arange(256, dtype=np.uint8)
    m = mulaw_encode(mulaw_decode_table())
    mism = np.nonzero(m != codes)[0]
    assert mism.tolist() == [0x7F]
    assert mulaw_decode_table()[0x7F] == 0
    assert np.array_equal(alaw_encode(alaw_decode_table()), codes)


def test_g711_wav_roundtrip():
    x = _tone(4000, amp=9000)
    for law in ("mulaw", "alaw"):
        w = encode_wav_g711(x, rate=8_000, law=law)
        y, rate = decode_wav_g711(w)
        assert rate == 8_000 and y.shape == (4000, 1)
        err = y.ravel() - x
        snr = 10 * np.log10((x.astype(float) ** 2).mean() / (err ** 2).mean())
        assert snr > 30
        assert len(w) < 0.6 * x.size * 2  # 8-bit log PCM halves the bytes


# ------------------------------------------------- WAV decode dispatcher
def test_decode_wav_dispatches_on_format_tag():
    from ck_spark.ops.wav import decode_wav

    x = _tone(2000, amp=8000)
    ima = decode_wav(encode_wav_ima(x, rate=16_000))
    g711 = decode_wav(encode_wav_g711(x, rate=8_000, law="alaw"))
    assert ima[1] == 16_000 and g711[1] == 8_000
    assert ima[0].shape == (2000, 1) and g711[0].shape == (2000, 1)
    # unknown compressed tags still raise loudly, naming the format
    import struct

    from ck_spark.ops.adpcm import _riff

    mp3ish = _riff(struct.pack("<HHIIHHH", 0x55, 1, 8000, 8000, 1, 0, 0),
                   b"\x00" * 64, n_samples=64)
    with pytest.raises(NotImplementedError, match="0x55"):
        decode_wav(mp3ish)
