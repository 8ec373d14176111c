"""Baseline JPEG codec (ck_spark/ops/jpeg.py) — pure-numpy, no Spark
needed except the one end-to-end extract_features test.

JPEG is lossy, so round-trips assert PSNR bounds (not equality); the
decoder-only tests pin exact behaviors (marker parse, Huffman tables
from DHT, restart handling, subsampled geometry)."""

import numpy as np
import pytest

from ck_spark.ops.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def _smooth_rgb(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [yy * 255.0 / max(h - 1, 1), xx * 255.0 / max(w - 1, 1),
         (yy + xx) * 255.0 / max(h + w - 2, 1)], axis=-1)
    return np.clip(img + rng.normal(0, 3, img.shape), 0, 255).astype(np.uint8)


def test_roundtrip_rgb_444():
    img = _smooth_rgb(45, 61)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(out, img) > 35.0


def test_roundtrip_rgb_420_subsampled():
    """4:2:0: odd dimensions force both edge-padding paths and the
    chroma upsample; luma should stay sharp, chroma merely close."""
    img = _smooth_rgb(37, 51, seed=1)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    assert out.shape == img.shape
    assert _psnr(out, img) > 32.0


def test_roundtrip_grey():
    rng = np.random.default_rng(2)
    g = np.clip(
        np.linspace(0, 255, 40)[:, None] + rng.normal(0, 2, (40, 33)),
        0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=92))
    assert out.shape == g.shape and out.ndim == 2
    assert _psnr(out, g) > 38.0


def test_restart_intervals_match_no_restart():
    """RSTn markers change the byte stream but must not change pixels:
    the same quantized coefficients are coded either way."""
    img = _smooth_rgb(32, 48, seed=3)
    plain = decode_jpeg(encode_jpeg(img, quality=88))
    for dri in (1, 3, 5):
        with_rst = decode_jpeg(encode_jpeg(img, quality=88, restart_interval=dri))
        np.testing.assert_array_equal(with_rst, plain)
    sub = decode_jpeg(encode_jpeg(img, quality=88, subsample=True))
    sub_rst = decode_jpeg(encode_jpeg(img, quality=88, subsample=True,
                                      restart_interval=2))
    np.testing.assert_array_equal(sub_rst, sub)


def test_flat_color_is_exact():
    """A constant block survives quantization exactly (only DC, and the
    DC quant step divides evenly after rounding back)."""
    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert int(np.abs(out.astype(int) - 128).max()) <= 1


def test_quality_monotonic_size():
    img = _smooth_rgb(64, 64, seed=4)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_rejects_non_jpeg_and_unsupported_coding():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # splice a lossless (SOF3) and an arithmetic-progressive (SOF10/0xCA)
    # marker into a valid header prefix: both remain unsupported (SOF2
    # progressive itself is now decoded for real)
    for sof in (0xC3, 0xCA):
        data = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
        idx = bytes(data).find(b"\xFF\xC0")
        data[idx + 1] = sof
        with pytest.raises(NotImplementedError, match="unsupported JPEG"):
            decode_jpeg(bytes(data))


def test_byte_stuffing_roundtrip():
    """High-entropy content produces 0xFF bytes in the entropy stream;
    stuffing/unstuffing must round-trip (shape + PSNR sanity)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    data = encode_jpeg(img, quality=95)
    out = decode_jpeg(data)
    assert out.shape == img.shape
    # noise is the worst case for JPEG; just require a sane reconstruction
    assert _psnr(out, img) > 20.0


def test_extract_features_real_decode_jpeg(spark):
    """End-to-end: a REAL JPEG payload through the Arrow mapInPandas
    path — statistics over decoded pixels, close to the source image
    (JPEG is lossy, so tolerance not equality)."""
    from ck_spark.ops.multimodal import extract_features

    img = _smooth_rgb(16, 16, seed=6)
    payload = encode_jpeg(img, quality=95)
    media = spark.createDataFrame(
        [(1, "image", "jpeg", bytearray(payload), 16, 16, 0)],
        "media_id long, kind string, format string, payload binary, "
        "width int, height int, duration_ms int",
    )
    row = extract_features(media, real_decode=True).collect()[0]
    decoded = decode_jpeg(payload).astype(np.float64)
    assert row["n_bytes"] == len(payload)
    assert abs(row["mean_val"] - decoded.mean()) < 1e-9
    assert abs(row["mean_val"] - img.astype(np.float64).mean()) < 3.0


# ---- progressive (SOF2) ----------------------------------------------------


def test_progressive_matches_baseline_exactly():
    """The default successive-approximation script refines every band to
    Al=0, so progressive decode must reproduce the EXACT same pixels as
    the baseline decode of the same quantized coefficients."""
    from ck_spark.ops.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(41)
    for shape, sub in [((16, 16, 3), False), ((17, 23, 3), False),
                       ((24, 24, 3), True), ((19, 21, 3), True),
                       ((13, 9), False)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=85, subsample=sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=85, subsample=sub))
        np.testing.assert_array_equal(prog, base)


def test_progressive_quality_and_flag():
    from ck_spark.ops.jpeg import encode_jpeg_progressive, jpeg_dimensions

    img = _smooth_rgb(40, 56, seed=42)
    data = encode_jpeg_progressive(img, quality=92)
    assert jpeg_dimensions(data) == (56, 40, True)
    assert _psnr(img, decode_jpeg(data)) > 34


def test_progressive_custom_scan_script():
    """Spectral-selection-only script (no successive approximation) and a
    deep Al ladder both reconstruct identically to baseline."""
    from ck_spark.ops.jpeg import encode_jpeg_progressive

    img = _smooth_rgb(24, 24, seed=43)
    base = decode_jpeg(encode_jpeg(img, quality=80))
    spectral_only = [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 9, 0, 0), ([0], 10, 63, 0, 0),
        ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0),
    ]
    got = decode_jpeg(
        encode_jpeg_progressive(img, quality=80, scans=spectral_only))
    np.testing.assert_array_equal(got, base)
    ladder = [
        ([0, 1, 2], 0, 0, 0, 3),
        ([0], 1, 63, 0, 3), ([1], 1, 63, 0, 3), ([2], 1, 63, 0, 3),
        ([0, 1, 2], 0, 0, 1, 2),
        ([0], 1, 63, 3, 2), ([1], 1, 63, 3, 2), ([2], 1, 63, 3, 2),
        ([0, 1, 2], 0, 0, 2, 1),
        ([0], 1, 63, 2, 1), ([1], 1, 63, 2, 1), ([2], 1, 63, 2, 1),
        ([0, 1, 2], 0, 0, 3, 0),
        ([0], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0),
    ]
    got2 = decode_jpeg(encode_jpeg_progressive(img, quality=80, scans=ladder))
    np.testing.assert_array_equal(got2, base)


def test_progressive_eob_run_stress():
    """A flat image quantizes to almost-all-zero AC blocks — long EOB
    runs across blocks exercise the EOBn encode/decode path; a lone
    bright pixel breaks the run mid-image."""
    from ck_spark.ops.jpeg import encode_jpeg_progressive

    img = np.full((64, 64, 3), 128, dtype=np.uint8)
    img[33, 37] = (255, 0, 255)
    base = decode_jpeg(encode_jpeg(img, quality=75))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=75))
    np.testing.assert_array_equal(prog, base)


def test_progressive_truncated_raises():
    from ck_spark.ops.jpeg import encode_jpeg_progressive

    data = encode_jpeg_progressive(_smooth_rgb(16, 16, seed=44))
    with pytest.raises(Exception):
        decode_jpeg(data[: len(data) // 3])
