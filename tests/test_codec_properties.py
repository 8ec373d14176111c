"""Property-based round-trip tests (hypothesis) for the media codecs:
FLAC must be lossless on ANY integer signal in range; GIF/LZW must be
lossless on ANY palette image; IMA-ADPCM and G.711 are lossy but must
decode what they encode deterministically and within codec error
bounds. These complement the fixture tests in test_flac_adpcm.py /
test_gif.py with adversarial shapes (tiny, empty, constant, extreme
values, odd dimensions)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ck_spark.ops.adpcm import (
    decode_wav_g711,
    decode_wav_ima,
    encode_wav_g711,
    encode_wav_ima,
)
from ck_spark.ops.flac import decode_flac, encode_flac
from ck_spark.ops.gif import decode_gif, encode_gif

# small but adversarial: hypothesis shrinks toward the pathological ends
_samples16 = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=700)


@settings(max_examples=60, deadline=None)
@given(_samples16, st.booleans(), st.booleans())
def test_flac_lossless_any_signal_mono(values, use_lpc, small_blocks):
    x = np.array(values, dtype=np.int64)
    enc = encode_flac(x, rate=8000, use_lpc=use_lpc,
                      block_size=64 if small_blocks else 4096)
    dec, rate = decode_flac(enc)
    assert rate == 8000
    assert np.array_equal(dec.ravel().astype(np.int64), x)


@settings(max_examples=40, deadline=None)
@given(_samples16, _samples16, st.booleans())
def test_flac_lossless_any_signal_stereo(left, right, decorrelate):
    n = min(len(left), len(right))
    s = np.stack([np.array(left[:n]), np.array(right[:n])], 1).astype(np.int64)
    enc = encode_flac(s, stereo_decorrelate=decorrelate, block_size=256)
    dec, _ = decode_flac(enc)
    assert np.array_equal(dec.astype(np.int64), s)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=40),
       st.integers(min_value=2, max_value=256),
       st.booleans(),
       st.integers(min_value=0, max_value=2**31))
def test_gif_lossless_any_palette_image(n_frames, h, w, n_colors,
                                        interlace, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    frames = pal[rng.integers(0, n_colors, (n_frames, h, w))]
    out = decode_gif(encode_gif(frames, interlace=interlace))
    assert out.shape == frames.shape
    assert np.array_equal(out, frames)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=1, max_size=600),
       st.sampled_from([9, 17, 505]))
def test_ima_adpcm_bounded_error_any_signal(values, spb):
    x = np.array(values, dtype=np.int64)
    y, _ = decode_wav_ima(encode_wav_ima(x, samples_per_block=spb))
    assert y.shape == (x.size, 1)
    # first sample of every block is verbatim
    assert y.ravel()[0] == x[0]
    # worst-case step is 32767: error per sample bounded by codec design
    # (predictor clamps to int16; step adaptation may lag by a few steps)
    assert np.all(np.abs(y.ravel() - x) <= 65535)
    # decoding is deterministic
    y2, _ = decode_wav_ima(encode_wav_ima(x, samples_per_block=spb))
    assert np.array_equal(y, y2)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=1, max_size=600),
       st.sampled_from(["mulaw", "alaw"]))
def test_g711_quantization_error_bound(values, law):
    x = np.array(values, dtype=np.int64)
    y, _ = decode_wav_g711(encode_wav_g711(x, law=law))
    err = np.abs(y.ravel() - x)
    # logarithmic PCM: relative error bounded by the segment width
    # (mu-law worst segment quantum is 256 at |x|~32635 before clipping)
    bound = np.maximum(np.abs(x) / 16, 1100)
    assert np.all(err <= bound)
