"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas.

Decode is REAL for PNG images (ops/png.py pure-Python codec), baseline
JPEG images (ops/jpeg.py pure-numpy T.81 decoder — Huffman + dequant +
IDCT + chroma upsampling), WAV audio (ops/wav.py stdlib RIFF/PCM) and
uncompressed AVI video (ops/avi.py RIFF + DIB frames) —
pixel/sample-accurate statistics, no third-party libs. Only perceptual
audio/video codecs (mp3/mp4/...) raise NotImplementedError behind an
import-try: those genuinely need codec libraries absent from this
container, and swapping in soundfile/PyAV is a one-function change at
the same seam.

Scale design: payloads never pass through Python row-at-a-time — Arrow
moves each partition's binaries as buffers; heavy decode parallelism is
controlled by repartition(n) before mapInPandas.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, format string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "mean_val double, std_val double, feature array<float>"
)

FRAME_SCHEMA = "media_id long, frame_no int, n_bytes long, frame_sha256 string"

try:  # real decoders, absent in this container
    import PIL.Image  # type: ignore  # noqa: F401

    HAVE_IMAGE_CODEC = True
except ImportError:
    HAVE_IMAGE_CODEC = False


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload bytes derived from sha256
    stream of (seed, id)); parallelism-independent like the text corpus."""

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for i in pdf["id"].tolist():
                kind = ["image", "audio", "video"][i % 3]
                fmt = {"image": "png", "audio": "wav", "video": "mp4"}[kind]
                size = 512 + (i * 37) % 2048
                stream = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                payload = (stream * (size // 32 + 1))[:size]
                rows.append(
                    (i, kind, fmt, payload, 64 + i % 128, 64 + i % 64, 1000 + i % 5000)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "format", "payload",
                    "width", "height", "duration_ms",
                ],
            )

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_features(
    media: DataFrame, real_decode: bool = False, feat_dim: int = 8
) -> DataFrame:
    """Per-media features via mapInPandas.

    real_decode=True DECODES the payload: PNG images through the built-in
    pure-Python codec (ops/png.py — a real codec round-trip, no third-party
    libs); baseline JPEG through the pure-numpy T.81 decoder (ops/jpeg.py);
    WAV audio through the stdlib RIFF/PCM decoder (ops/wav.py —
    statistics over SAMPLES); uncompressed AVI video through ops/avi.py
    (statistics over PIXELS of decoded frames); other image formats
    through PIL when installed. Perceptual audio/video codecs (mp3/mp4)
    raise NotImplementedError — those need codec libs absent from this
    container.

    The default (real_decode=False) derives deterministic statistics from
    the raw payload — exercising the same Arrow batch path decode-free."""

    def proc(iterator):
        from ck_spark.ops.avi import decode_avi
        from ck_spark.ops.jpeg import decode_jpeg
        from ck_spark.ops.png import decode_png
        from ck_spark.ops.wav import decode_wav

        for pdf in iterator:
            out = []
            for mid, kind, fmt, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["format"], pdf["payload"]
            ):
                if real_decode:
                    if kind == "image" and str(fmt).lower() == "png":
                        vals = decode_png(bytes(payload)).astype(np.float64).ravel()
                    elif kind == "image" and str(fmt).lower() in ("jpeg", "jpg"):
                        vals = decode_jpeg(bytes(payload)).astype(np.float64).ravel()
                    elif kind == "audio" and str(fmt).lower() == "wav":
                        vals = decode_wav(bytes(payload))[0].ravel()
                    elif kind == "video" and str(fmt).lower() == "avi":
                        vals = decode_avi(bytes(payload)).astype(np.float64).ravel()
                    elif kind == "image" and HAVE_IMAGE_CODEC:
                        import io

                        import PIL.Image

                        img = PIL.Image.open(io.BytesIO(bytes(payload)))
                        vals = np.asarray(img, dtype=np.float64).ravel()
                    else:
                        raise NotImplementedError(
                            f"no decoder for kind={kind} format={fmt} "
                            "(PNG, baseline JPEG, WAV and uncompressed "
                            "AVI decode are built-in; perceptual "
                            "audio/video codecs need a codec lib — not "
                            "in this container)"
                        )
                else:
                    vals = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float64)
                feat = vals[: feat_dim * (len(vals) // feat_dim)].reshape(
                    -1, feat_dim
                ).mean(axis=0) if len(vals) >= feat_dim else np.zeros(feat_dim)
                out.append(
                    (
                        int(mid), str(kind), int(len(bytes(payload))),
                        hashlib.sha256(bytes(payload)).hexdigest(),
                        float(vals.mean()) if vals.size else 0.0,
                        float(vals.std()) if vals.size else 0.0,
                        feat.astype(np.float32).tolist(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "n_bytes", "sha256",
                    "mean_val", "std_val", "feature",
                ],
            )

    return media.mapInPandas(proc, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, n_frames: int = 4, real_decode: bool = False
) -> DataFrame:
    """Video frame sampling via mapInPandas.

    real_decode=True parses uncompressed AVI payloads (ops/avi.py) and
    samples n_frames REAL frames evenly across the video (frame_no is the
    actual frame index; frame_sha256 hashes the decoded RGB pixels). The
    default splits the payload into byte spans — the decode-free plumbing
    path for formats without a built-in codec."""

    def proc(iterator):
        from ck_spark.ops.avi import decode_avi

        for pdf in iterator:
            out = []
            vids = pdf[pdf["kind"] == "video"]
            for mid, fmt, payload in zip(
                vids["media_id"], vids["format"], vids["payload"]
            ):
                raw = bytes(payload)
                if real_decode and str(fmt).lower() == "avi":
                    frames = decode_avi(raw)
                    take = np.linspace(
                        0, frames.shape[0] - 1, min(n_frames, frames.shape[0])
                    ).astype(int)
                    for f in sorted(set(int(i) for i in take)):
                        rgb = frames[f].tobytes()
                        out.append(
                            (int(mid), f, len(rgb),
                             hashlib.sha256(rgb).hexdigest())
                        )
                    continue
                step = max(1, len(raw) // n_frames)
                for f in range(n_frames):
                    chunk = raw[f * step : (f + 1) * step]
                    if not chunk:
                        break
                    out.append(
                        (int(mid), f, len(chunk), hashlib.sha256(chunk).hexdigest())
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_no", "n_bytes", "frame_sha256"]
            )

    return media.mapInPandas(proc, schema=FRAME_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize metadata transform (decode-free): the real implementation
    would decode->resize->re-encode inside the same mapInPandas shape."""
    return media.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))
