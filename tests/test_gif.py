"""GIF codec tests: LZW round trips (static, interlaced, animated,
dictionary-reset), probe, and integration with the multimodal ops."""

import numpy as np
import pytest

from ck_spark.ops.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_info,
)


def _pal_img(shape, n_colors=17, seed=5):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, shape)]


def test_static_roundtrip():
    img = _pal_img((40, 60))
    g = encode_gif(img)
    out = decode_gif(g)
    assert out.shape == (1, 40, 60, 3)
    assert np.array_equal(out[0], img)
    assert len(g) < img.nbytes / 2  # real LZW compression


def test_interlaced_roundtrip():
    img = _pal_img((31, 23), seed=9)  # odd height exercises pass bounds
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True))[0], img)


def test_animation_roundtrip_and_info():
    frames = _pal_img((3, 25, 30), seed=2)
    g = encode_gif(frames, delays_cs=[5, 10, 15])
    out = decode_gif(g)
    assert np.array_equal(out, frames)
    info = gif_info(g)
    assert info["codec"] == "gif/89a"
    assert (info["width"], info["height"]) == (30, 25)
    assert info["n_frames"] == 3
    assert info["duration_ms"] == 300


def test_lzw_dictionary_reset_on_large_image():
    # 60k pixels forces the 4096-entry dictionary to overflow and reset
    img = _pal_img((200, 300), seed=3)
    assert np.array_equal(decode_gif(encode_gif(img))[0], img)


def test_lzw_kernel_roundtrip_and_corruption():
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 4, 5000, dtype=np.uint8)
    enc = _lzw_encode(idx, 2)
    # strip sub-block framing the way the decoder receives it
    raw = bytearray()
    pos = 0
    while enc[pos]:
        raw += enc[pos + 1:pos + 1 + enc[pos]]
        pos += 1 + enc[pos]
    assert np.array_equal(_lzw_decode(bytes(raw), 2, 5000), idx)
    with pytest.raises(ValueError, match="corrupt|short"):
        _lzw_decode(bytes(raw[: len(raw) // 4]), 2, 5000)


def test_palette_overflow_raises():
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="quantize first"):
        encode_gif(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))


def test_not_a_gif_raises():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG\x00nope")


def test_frame_rect_exceeding_screen_raises_descriptively():
    import struct

    img = _pal_img((4, 4))
    g = bytearray(encode_gif(img))
    desc = bytes(g).index(b"\x2c")  # image descriptor; widen the frame
    assert g[desc] == 0x2C
    struct.pack_into("<H", g, desc + 5, 9)  # fw = 9 > screen width 4
    with pytest.raises(ValueError, match="exceeds the 4x4 logical screen"):
        decode_gif(bytes(g))


def test_transparency_composites_over_previous_frame():
    # hand-built 2-frame GIF (bypasses encode_gif so palette order is
    # pinned): frame 1 fills red; frame 2 is a 4x2 strip whose right half
    # is the transparent index -> keeps frame 1's red
    import struct

    pal = np.array(
        [[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]], dtype=np.uint8)
    g = bytearray(b"GIF89a")
    g += struct.pack("<HH", 4, 4)
    g += bytes([0x80 | (1 << 4) | 1, 0, 0])  # 4-entry global table
    g += pal.tobytes()
    full = np.zeros((4, 4), dtype=np.uint8)  # all red
    g += b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 4) + b"\x00"
    g += bytes([2]) + _lzw_encode(full, 2)
    strip = np.array([[1, 1, 2, 2], [1, 1, 2, 2]], dtype=np.uint8)
    g += b"\x21\xf9\x04\x01\x0a\x00\x02\x00"  # transparent index = 2
    g += b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 2) + b"\x00"
    g += bytes([2]) + _lzw_encode(strip, 2)
    g += b"\x3b"
    out = decode_gif(bytes(g))
    assert out.shape[0] == 2
    assert np.array_equal(out[1][0, 0], pal[1])  # drawn green
    assert np.array_equal(out[1][0, 3], pal[0])  # transparent -> red kept
    assert np.array_equal(out[1][3], out[0][3])  # untouched rows persist


def test_multimodal_gif_rows_end_to_end(spark):
    from ck_spark.ops.multimodal import (
        extract_features,
        probe_media,
        resize_images,
        sample_frames,
        synth_media,
    )

    media = synth_media(spark, 60, seed=42)
    fmts = {(r["kind"], r["format"])
            for r in media.select("kind", "format").collect()}
    assert ("image", "gif") in fmts and ("video", "gif") in fmts

    probes = {r["media_id"]: r for r in probe_media(media).collect()}
    gif_rows = [r for r in probes.values() if r["format"] == "gif"]
    assert gif_rows and all(r["container_ok"] for r in gif_rows)
    vid = [r for r in gif_rows if r["kind"] == "video"]
    assert vid and all(r["n_frames"] >= 2 for r in vid)

    feats = extract_features(media, real_decode=True).collect()
    assert len(feats) == 60

    frames = sample_frames(media, n_frames=4, real_decode=True).collect()
    gif_vids = {r["media_id"] for r in vid}
    assert gif_vids <= {r["media_id"] for r in frames}

    resized = {r["media_id"]: r for r in
               resize_images(media, 5, 4).collect()}
    from ck_spark.ops.png import decode_png

    for mid, r in probes.items():
        if r["kind"] == "image" and r["format"] == "gif":
            out = decode_png(bytes(resized[mid]["payload"]))
            assert out.shape[:2] == (4, 5)
