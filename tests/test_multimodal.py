import hashlib

import pytest

from ck_spark.ops.multimodal import (
    HAVE_IMAGE_CODEC,
    extract_features,
    resize_stub,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, 30, seed=42)


def test_media_schema_and_determinism(spark, media):
    rows = media.orderBy("media_id").collect()
    assert len(rows) == 30
    again = synth_media(spark, 30, seed=42).orderBy("media_id").collect()
    assert rows == again
    kinds = {r["kind"] for r in rows}
    assert kinds == {"image", "audio", "video"}
    assert all(isinstance(bytes(r["payload"]), bytes) and len(r["payload"]) > 0 for r in rows)


def test_feature_extraction_plumbing(spark, media):
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    raw = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert set(feats) == set(raw)
    for mid, r in feats.items():
        assert r["sha256"] == hashlib.sha256(raw[mid]).hexdigest()
        assert r["n_bytes"] == len(raw[mid])
        assert len(r["feature"]) == 8
        assert 0 <= r["mean_val"] <= 255


def test_real_decode_rejects_invalid_payloads(spark, media):
    """real_decode is no longer a stub: payloads route to real codecs and
    an invalid payload fails LOUDLY at decode time (never a silent fake).
    Which row's error surfaces first depends on task ordering: a fake PNG
    ("not a PNG"), a fake WAV (wave.Error "...RIFF id"), or an mp4 with no
    built-in codec ("no decoder")."""
    with pytest.raises(Exception, match="not a PNG|no decoder|RIFF"):
        extract_features(media, real_decode=True).collect()


def test_frame_sampling(spark, media):
    frames = sample_frames(media, n_frames=4).collect()
    vids = [r["media_id"] for r in media.where("kind = 'video'").collect()]
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_no"])
    assert set(by_media) == set(vids)
    for fs in by_media.values():
        assert sorted(fs) == list(range(len(fs)))


def test_resize_stub(spark, media):
    out = resize_stub(media, 32, 32).select("width", "height").distinct().collect()
    assert len(out) == 1 and out[0]["width"] == 32 and out[0]["height"] == 32


# ---- real PNG codec round-trip (the decode seam made real) -----------------


def test_png_roundtrip_shapes():
    import numpy as np

    from ck_spark.ops.png import decode_png, encode_png

    rng = np.random.default_rng(0)
    for shape in [(5, 7), (4, 4, 3), (3, 6, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        back = decode_png(encode_png(img))
        np.testing.assert_array_equal(back, img)


def test_png_all_filter_types_decode():
    """Decoder inverts every PNG filter type (we emit only filter 0, but
    real-world PNGs use all five) — forward-filter a known image per row
    and check recovery."""
    import struct
    import zlib

    import numpy as np

    from ck_spark.ops.png import decode_png

    rng = np.random.default_rng(1)
    h, w, ch = 6, 5, 3
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    flat = img.reshape(h, w * ch).astype(np.int16)
    bpp = ch
    raw = bytearray()
    for y in range(h):
        f = y % 5  # use every filter type
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(w * ch, np.int16)
        line = np.zeros(w * ch, np.int16)
        for x in range(w * ch):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if (y > 0 and x >= bpp) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (cur[x] - pred) % 256
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(data), img)


def test_extract_features_real_decode_png(spark):
    """End-to-end: a REAL PNG payload through the Arrow mapInPandas path,
    statistics over actual pixels (closes the 'decode stub' weakness)."""
    import numpy as np

    from ck_spark.ops.multimodal import extract_features
    from ck_spark.ops.png import encode_png

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)  # known gradient
    payload = encode_png(img)
    media = spark.createDataFrame(
        [(1, "image", "png", bytearray(payload), 4, 4, 0)],
        "media_id long, kind string, format string, payload binary, "
        "width int, height int, duration_ms int",
    )
    row = extract_features(media, real_decode=True).collect()[0]
    assert abs(row["mean_val"] - float(np.arange(48).mean())) < 1e-9
    assert abs(row["std_val"] - float(np.arange(48).std())) < 1e-9
    assert row["n_bytes"] == len(payload)


def test_extract_features_real_decode_unsupported_kind_raises(spark):
    import pytest as _pytest

    from ck_spark.ops.multimodal import extract_features

    # video is the one remaining honest decode stub
    media = spark.createDataFrame(
        [(1, "video", "mp4", bytearray(b"\x00\x00\x00 ftypmp42"), 0, 0, 1000)],
        "media_id long, kind string, format string, payload binary, "
        "width int, height int, duration_ms int",
    )
    from py4j.protocol import Py4JJavaError  # noqa: F401

    with _pytest.raises(Exception) as ei:
        extract_features(media, real_decode=True).collect()
    assert "NotImplementedError" in str(ei.value) or "no decoder" in str(ei.value)


def test_wav_codec_roundtrip_widths():
    """Sample-accurate decode for 8/16/24/32-bit PCM, mono and stereo."""
    import numpy as np

    from ck_spark.ops.wav import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    for sw, lo, hi in ((1, -128, 127), (2, -(1 << 15), (1 << 15) - 1),
                       (4, -(1 << 31), (1 << 31) - 1)):
        for ch in (1, 2):
            s = rng.integers(lo, hi, size=(200, ch)).astype(np.int64)
            got, rate = decode_wav(encode_wav(s, framerate=8000, sampwidth=sw))
            assert rate == 8000
            np.testing.assert_array_equal(got, s.astype(np.float64))
    # 24-bit: hand-build frames (encode_wav doesn't emit 3-byte samples)
    import io
    import struct
    import wave

    vals = np.array([-(1 << 23), -1, 0, 1, (1 << 23) - 1], dtype=np.int64)
    raw = b"".join(struct.pack("<i", int(v))[:3] for v in vals)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(44100)
        w.writeframes(raw)
    got, rate = decode_wav(buf.getvalue())
    assert rate == 44100
    np.testing.assert_array_equal(got.ravel(), vals.astype(np.float64))


def test_extract_features_real_decode_wav(spark):
    """End-to-end: a REAL WAV payload through the Arrow mapInPandas path,
    statistics over actual samples (closes the audio decode stub)."""
    import numpy as np

    from ck_spark.ops.multimodal import extract_features
    from ck_spark.ops.wav import encode_wav

    t = np.arange(1000)
    samples = (np.sin(2 * np.pi * 440 * t / 16000) * 12_000).astype(np.int64)
    payload = encode_wav(samples, framerate=16000, sampwidth=2)
    media = spark.createDataFrame(
        [(7, "audio", "wav", bytearray(payload), 0, 0, 62)],
        "media_id long, kind string, format string, payload binary, "
        "width int, height int, duration_ms int",
    )
    row = extract_features(media, real_decode=True).collect()[0]
    exp = samples.astype(np.float64)
    assert abs(row["mean_val"] - float(exp.mean())) < 1e-9
    assert abs(row["std_val"] - float(exp.std())) < 1e-9
    assert row["n_bytes"] == len(payload)


def test_avi_codec_roundtrip():
    import numpy as np

    from ck_spark.ops.avi import decode_avi, encode_avi

    rng = np.random.default_rng(11)
    fr = rng.integers(0, 256, (3, 9, 13, 3), dtype=np.uint8)
    assert np.array_equal(decode_avi(encode_avi(fr, fps=10)), fr)
    with pytest.raises(ValueError):
        decode_avi(b"RIFFxxxxWAVE")


def test_extract_features_real_decode_avi(spark):
    """End-to-end: a REAL uncompressed-AVI payload through the Arrow
    mapInPandas path, statistics over actual pixels (closes the video
    decode stub for the uncompressed case)."""
    import numpy as np

    from ck_spark.ops.avi import encode_avi
    from ck_spark.ops.multimodal import extract_features

    rng = np.random.default_rng(5)
    fr = rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    payload = encode_avi(fr, fps=5)
    media = spark.createDataFrame(
        [(9, "video", "avi", bytearray(payload), 8, 8, 800)],
        "media_id long, kind string, format string, payload binary, "
        "width int, height int, duration_ms int",
    )
    row = extract_features(media, real_decode=True).collect()[0]
    exp = fr.astype(np.float64).ravel()
    assert abs(row["mean_val"] - float(exp.mean())) < 1e-9
    assert abs(row["std_val"] - float(exp.std())) < 1e-9


def test_sample_frames_real_decode_avi(spark):
    """real_decode frame sampling returns ACTUAL frame indices and hashes
    of decoded RGB pixels, evenly spread across the video."""
    import hashlib

    import numpy as np

    from ck_spark.ops.avi import encode_avi
    from ck_spark.ops.multimodal import sample_frames

    rng = np.random.default_rng(6)
    fr = rng.integers(0, 256, (10, 4, 6, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(3, "video", "avi", bytearray(encode_avi(fr)), 6, 4, 400)],
        "media_id long, kind string, format string, payload binary, "
        "width int, height int, duration_ms int",
    )
    rows = sample_frames(media, n_frames=4, real_decode=True).collect()
    got = {r["frame_no"]: r["frame_sha256"] for r in rows}
    assert set(got) == {0, 3, 6, 9}
    for f, sha in got.items():
        assert sha == hashlib.sha256(fr[f].tobytes()).hexdigest()
