"""Pure-Python MP4 (ISO base media file format) muxer + demuxer.

Closes the container half of the mp4 decode stub with a REAL parse: the
box tree (ftyp/moov/trak/mdia/minf/stbl/mdat) is walked, the full sample
tables (stts/stsc/stsz/stco|co64, stsd) are resolved, and every sample's
(offset, size, index) is recovered — i.e. genuine demuxing. Decode is
then real for the codec-free payloads the container can carry:

- video ``raw `` sample entries (uncompressed 24-bit RGB, the QuickTime
  uncompressed-video fourcc) -> (n, h, w, 3) uint8 frames;
- audio ``sowt``/``twos`` sample entries (16-bit little/big-endian PCM)
  -> float64 samples, exactly like ops/wav.py.

Compressed codec payloads (avc1/hev1/vp09 video, mp4a audio) demux fine —
mp4_info() reports them and mp4_track_samples() returns their real access
units — but sample decode raises NotImplementedError naming the codec:
entropy decode genuinely needs a codec library absent from this
container. That narrows the honest stub from "mp4" to "the h264/aac
bitstream itself".

Format layout is public knowledge (ISO/IEC 14496-12, Apple QTFF
reference). The reference repo has no video path at all — this exists for
the training-data-pipeline mandate (multimodal columns), not ck parity.
"""

from __future__ import annotations

import struct

import numpy as np

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts",
    b"udta", b"mvex", b"moof", b"traf",
}

_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


# ---------------------------------------------------------------------------
# box helpers
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, *payloads: bytes) -> bytes:
    body = b"".join(payloads)
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, *payloads: bytes) -> bytes:
    return _box(
        fourcc, struct.pack(">B", version) + flags.to_bytes(3, "big"), *payloads
    )


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end); handles 64-bit largesize
    (size==1) and to-end boxes (size==0)."""
    off = start
    while off + 8 <= end:
        (size,) = struct.unpack_from(">I", data, off)
        fourcc = data[off + 4 : off + 8]
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, off + 8)
            payload = off + 16
        elif size == 0:
            size = end - off
            payload = off + 8
        else:
            payload = off + 8
        if size < payload - off:
            raise ValueError(f"mp4: corrupt box size {size} for {fourcc!r}")
        yield fourcc, payload, off + size
        off += size


def _find(data: bytes, start: int, end: int, *path: bytes):
    """First box matching a fourcc path, as (payload_start, payload_end)."""
    for fourcc, ps, pe in _iter_boxes(data, start, end):
        if fourcc == path[0]:
            if len(path) == 1:
                return ps, pe
            return _find(data, ps, pe, *path[1:])
    return None


def _find_all(data: bytes, start: int, end: int, fourcc: bytes):
    return [(ps, pe) for fc, ps, pe in _iter_boxes(data, start, end) if fc == fourcc]


# ---------------------------------------------------------------------------
# muxer (tests / fixtures — same spirit as encode_avi / encode_wav)
# ---------------------------------------------------------------------------


def _mux(track_specs: list[dict], movie_timescale: int = 1000) -> bytes:
    """Each spec: handler(b'vide'|b'soun'), entry(bytes stsd sample entry),
    timescale, delta, chunks(list[bytes]), samples_per_chunk, sizes
    (list[int]) or fixed_size, width, height, volume."""
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0x200), b"isommp41mp42")
    mdat_payload = []
    cursor = len(ftyp) + 8  # absolute offset of first mdat byte
    for spec in track_specs:
        offs = []
        for c in spec["chunks"]:
            offs.append(cursor)
            mdat_payload.append(c)
            cursor += len(c)
        spec["_chunk_offsets"] = offs
    mdat = _box(b"mdat", *mdat_payload)

    traks = []
    max_dur_movie = 0
    for tid, spec in enumerate(track_specs, start=1):
        n = (
            len(spec["sizes"])
            if spec.get("sizes") is not None
            else sum(len(c) for c in spec["chunks"]) // spec["fixed_size"]
        )
        duration = n * spec["delta"]
        dur_movie = duration * movie_timescale // spec["timescale"]
        max_dur_movie = max(max_dur_movie, dur_movie)

        stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, spec["delta"]))
        stsc_entries = spec.get(
            "stsc_entries", [(1, spec["samples_per_chunk"], 1)]
        )
        stsc = _full(
            b"stsc", 0, 0,
            struct.pack(">I", len(stsc_entries)),
            b"".join(struct.pack(">III", *e) for e in stsc_entries),
        )
        if spec.get("sizes") is not None:
            stsz = _full(
                b"stsz", 0, 0,
                struct.pack(">II", 0, n),
                struct.pack(f">{n}I", *spec["sizes"]),
            )
        else:
            stsz = _full(b"stsz", 0, 0, struct.pack(">II", spec["fixed_size"], n))
        stco = _full(
            b"stco", 0, 0,
            struct.pack(">I", len(spec["_chunk_offsets"])),
            struct.pack(f">{len(spec['_chunk_offsets'])}I", *spec["_chunk_offsets"]),
        )
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1), spec["entry"])
        stbl = _box(b"stbl", stsd, stts, stsc, stsz, stco)

        dinf = _box(
            b"dinf",
            _full(b"dref", 0, 0, struct.pack(">I", 1), _full(b"url ", 0, 1)),
        )
        if spec["handler"] == b"vide":
            mhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        else:
            mhd = _full(b"smhd", 0, 0, struct.pack(">hH", 0, 0))
        minf = _box(b"minf", mhd, dinf, stbl)
        hdlr = _full(
            b"hdlr", 0, 0,
            struct.pack(">I4sIII", 0, spec["handler"], 0, 0, 0),
            b"ck_spark\x00",
        )
        mdhd = _full(
            b"mdhd", 0, 0,
            struct.pack(">IIIIHH", 0, 0, spec["timescale"], duration, 0x55C4, 0),
        )
        mdia = _box(b"mdia", mdhd, hdlr, minf)
        tkhd = _full(
            b"tkhd", 0, 3,
            struct.pack(">IIIII", 0, 0, tid, 0, dur_movie),
            b"\x00" * 8,
            struct.pack(">hhhh", 0, 0, spec.get("volume", 0), 0),
            _UNITY_MATRIX,
            struct.pack(">II", spec.get("width", 0) << 16, spec.get("height", 0) << 16),
        )
        traks.append(_box(b"trak", tkhd, mdia))

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, movie_timescale, max_dur_movie),
        struct.pack(">iHH", 0x00010000, 0x0100, 0),
        b"\x00" * 8,
        _UNITY_MATRIX,
        b"\x00" * 24,
        struct.pack(">I", len(track_specs) + 1),
    )
    moov = _box(b"moov", mvhd, *traks)
    return ftyp + mdat + moov


def _video_entry(w: int, h: int, fourcc: bytes = b"raw ", depth: int = 24) -> bytes:
    name = b"\x03raw" + b"\x00" * 28  # 32-byte pascal compressorname
    body = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HH", 0, 0) + b"\x00" * 12
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">IH", 0, 1)
        + name
        + struct.pack(">Hh", depth, -1)
    )
    return _box(fourcc, body)


def _audio_entry(channels: int, rate: int, fourcc: bytes = b"sowt") -> bytes:
    body = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HHI", 0, 0, 0)
        + struct.pack(">HH", channels, 16)
        + struct.pack(">HH", 0, 0)
        + struct.pack(">I", (rate << 16) & 0xFFFFFFFF)  # 16.16 fixed (rate < 65536)
    )
    return _box(fourcc, body)


def encode_mp4_video(
    frames: np.ndarray, fps: int = 25, codec: str = "raw", quality: int = 85
) -> bytes:
    """frames: uint8 (n, h, w, 3) RGB -> MP4 with one video track.

    codec='raw' packs top-down RGB24 rows (sample entry 'raw '); codec=
    'jpeg' stores one complete baseline JPEG per sample (sample entry
    'jpeg' — the QuickTime/ISO photo-JPEG layout) via ops/jpeg.py, a real
    compressed video track with no codec library."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3) RGB uint8")
    if codec not in ("raw", "jpeg"):
        raise ValueError(f"unknown mp4 video codec: {codec!r} (raw|jpeg)")
    n, h, w, _ = frames.shape
    if codec == "jpeg":
        from ck_spark.ops.jpeg import encode_jpeg

        chunks = [encode_jpeg(frames[i], quality=quality) for i in range(n)]
        entry = _video_entry(w, h, fourcc=b"jpeg")
    else:
        chunks = [frames[i].tobytes() for i in range(n)]
        entry = _video_entry(w, h)
    spec = {
        "handler": b"vide",
        "entry": entry,
        "timescale": fps,
        "delta": 1,
        "chunks": chunks,
        "samples_per_chunk": 1,
        "sizes": [len(c) for c in chunks],
        "width": w,
        "height": h,
    }
    return _mux([spec])


def encode_mp4_audio(
    samples: np.ndarray, rate: int = 16_000, frames_per_chunk: int = 0
) -> bytes:
    """samples: integer array (n,) or (n, ch) -> MP4 with one 'sowt'
    (16-bit little-endian PCM) audio track; one PCM frame per sample.
    frames_per_chunk>0 splits the stream into multiple chunks (a short
    final chunk yields a second stsc entry — the multi-entry
    sample-to-chunk layout real muxers produce)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    blob = s.astype("<i2").tobytes()
    if frames_per_chunk and frames_per_chunk < n:
        bpc = frames_per_chunk * 2 * ch
        chunks = [blob[i : i + bpc] for i in range(0, len(blob), bpc)]
        last = len(chunks[-1]) // (2 * ch)
        entries = [(1, frames_per_chunk, 1)]
        if last != frames_per_chunk:
            entries.append((len(chunks), last, 1))
    else:
        chunks = [blob]
        entries = [(1, n, 1)]
    spec = {
        "handler": b"soun",
        "entry": _audio_entry(ch, rate),
        "timescale": rate,
        "delta": 1,
        "chunks": chunks,
        "samples_per_chunk": n,
        "stsc_entries": entries,
        "fixed_size": 2 * ch,
        "volume": 0x0100,
    }
    return _mux([spec])


# ---------------------------------------------------------------------------
# demuxer
# ---------------------------------------------------------------------------


def _parse_stbl(data: bytes, ps: int, pe: int) -> dict:
    t: dict = {}
    for fourcc, s, e in _iter_boxes(data, ps, pe):
        if fourcc == b"stsd":
            (count,) = struct.unpack_from(">I", data, s + 4)
            entries = []
            off = s + 8
            for _ in range(count):
                (esize,) = struct.unpack_from(">I", data, off)
                entries.append((data[off + 4 : off + 8], off + 8, off + esize))
                off += esize
            t["stsd"] = entries
        elif fourcc == b"stts":
            (count,) = struct.unpack_from(">I", data, s + 4)
            t["stts"] = [
                struct.unpack_from(">II", data, s + 8 + 8 * i) for i in range(count)
            ]
        elif fourcc == b"stsc":
            (count,) = struct.unpack_from(">I", data, s + 4)
            t["stsc"] = [
                struct.unpack_from(">III", data, s + 8 + 12 * i) for i in range(count)
            ]
        elif fourcc == b"stsz":
            fixed, count = struct.unpack_from(">II", data, s + 4)
            if fixed:
                t["sizes"] = [fixed] * count
            else:
                t["sizes"] = list(struct.unpack_from(f">{count}I", data, s + 12))
        elif fourcc == b"stco":
            (count,) = struct.unpack_from(">I", data, s + 4)
            t["stco"] = list(struct.unpack_from(f">{count}I", data, s + 8))
        elif fourcc == b"co64":
            (count,) = struct.unpack_from(">I", data, s + 4)
            t["stco"] = list(struct.unpack_from(f">{count}Q", data, s + 8))
    return t


def _resolve_samples(tables: dict) -> list[tuple[int, int]]:
    """stsc/stco/stsz -> per-sample (absolute_offset, size), in order."""
    sizes = tables.get("sizes", [])
    chunks = tables.get("stco", [])
    stsc = tables.get("stsc", [])
    if not sizes or not chunks or not stsc:
        return []
    per_chunk: list[int] = []
    for i, (first, spc, _idx) in enumerate(stsc):
        last = (stsc[i + 1][0] - 1) if i + 1 < len(stsc) else len(chunks)
        per_chunk.extend([spc] * (last - first + 1))
    out: list[tuple[int, int]] = []
    si = 0
    for ci, coff in enumerate(chunks):
        off = coff
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(sizes):
                break
            out.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    return out


def mp4_info(data: bytes) -> dict:
    """Container metadata: brand, movie duration, per-track codec/shape —
    works for ANY codec (real demux; no decode needed)."""
    if len(data) < 16:
        raise ValueError("not an MP4 (truncated)")
    top = {fc: (s, e) for fc, s, e in _iter_boxes(data, 0, len(data))}
    if b"moov" not in top:
        raise ValueError("not an MP4 (no moov box)")
    brand = data[top[b"ftyp"][0] : top[b"ftyp"][0] + 4].decode(
        "ascii", "replace"
    ) if b"ftyp" in top else None
    ms, me = top[b"moov"]
    mvhd = _find(data, ms, me, b"mvhd")
    timescale = duration = 0
    if mvhd:
        version = data[mvhd[0]]
        if version == 1:
            timescale, duration = struct.unpack_from(">IQ", data, mvhd[0] + 20)
        else:
            timescale, duration = struct.unpack_from(">II", data, mvhd[0] + 12)
    tracks = []
    for ts, te in _find_all(data, ms, me, b"trak"):
        tk: dict = {}
        tkhd = _find(data, ts, te, b"tkhd")
        if tkhd:
            tk["track_id"] = struct.unpack_from(">I", data, tkhd[0] + 12)[0]
        mdhd = _find(data, ts, te, b"mdia", b"mdhd")
        if mdhd:
            mts, mdur = struct.unpack_from(">II", data, mdhd[0] + 12)
            tk["timescale"] = mts
            tk["duration_ms"] = int(mdur * 1000 / mts) if mts else 0
        hdlr = _find(data, ts, te, b"mdia", b"hdlr")
        if hdlr:
            tk["handler"] = data[hdlr[0] + 8 : hdlr[0] + 12].decode("ascii", "replace")
        stbl = _find(data, ts, te, b"mdia", b"minf", b"stbl")
        if stbl:
            tables = _parse_stbl(data, *stbl)
            tk["sample_count"] = len(tables.get("sizes", []))
            tk["_tables"] = tables
            if tables.get("stsd"):
                fourcc, es, _ee = tables["stsd"][0]
                tk["codec"] = fourcc.decode("ascii", "replace")
                if tk.get("handler") == "vide":
                    tk["width"], tk["height"] = struct.unpack_from(">HH", data, es + 24)
                elif tk.get("handler") == "soun":
                    tk["channels"], tk["sample_size"] = struct.unpack_from(
                        ">HH", data, es + 16
                    )
                    tk["sample_rate"] = struct.unpack_from(">I", data, es + 24)[0] >> 16
        tracks.append(tk)
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_ms": int(duration * 1000 / timescale) if timescale else 0,
        "tracks": tracks,
    }


def mp4_track_samples(data: bytes, track: dict) -> list[bytes]:
    """The track's real samples (codec access units), in decode order."""
    return [data[o : o + n] for o, n in _resolve_samples(track["_tables"])]


def decode_mp4_video(data: bytes) -> np.ndarray:
    """MP4 bytes -> uint8 frames (n, h, w, 3) for 'raw ' RGB24 tracks;
    compressed codecs (avc1/hev1/...) raise naming the codec."""
    info = mp4_info(data)
    vids = [t for t in info["tracks"] if t.get("handler") == "vide"]
    if not vids:
        raise ValueError("mp4 has no video track")
    tk = vids[0]
    codec = tk.get("codec", "?")
    if codec == "jpeg":
        # photo-JPEG track: every sample is a complete JPEG — decode
        # through the built-in T.81 codec (same as AVI/MJPG)
        from ck_spark.ops.jpeg import decode_jpeg

        w, h = tk["width"], tk["height"]
        imgs = []
        for i, raw in enumerate(mp4_track_samples(data, tk)):
            img = decode_jpeg(raw)
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            if img.shape[0] != h or img.shape[1] != w:
                raise ValueError(
                    f"jpeg sample {i} is {img.shape[1]}x{img.shape[0]}, "
                    f"track header says {w}x{h}"
                )
            imgs.append(img)
        return (np.stack(imgs) if imgs
                else np.empty((0, h, w, 3), dtype=np.uint8))
    if codec != "raw ":
        raise NotImplementedError(
            f"mp4 video codec {codec!r}: container demuxed "
            f"({tk.get('sample_count', 0)} samples) but bitstream decode "
            "needs a codec library — not in this container"
        )
    w, h = tk["width"], tk["height"]
    samples = mp4_track_samples(data, tk)
    out = np.empty((len(samples), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(samples):
        if len(raw) < w * h * 3:
            raise ValueError(f"mp4 frame {i}: {len(raw)} bytes < {w * h * 3}")
        out[i] = np.frombuffer(raw, np.uint8, w * h * 3).reshape(h, w, 3)
    return out


def decode_mp4_audio(data: bytes) -> tuple[np.ndarray, int]:
    """MP4 bytes -> (float64 samples (n, ch), rate) for sowt/twos 16-bit
    PCM tracks; mp4a/alac raise naming the codec. Matches decode_wav's
    conventions (integer sample units, no normalization)."""
    info = mp4_info(data)
    auds = [t for t in info["tracks"] if t.get("handler") == "soun"]
    if not auds:
        raise ValueError("mp4 has no audio track")
    tk = auds[0]
    codec = tk.get("codec", "?")
    if codec not in ("sowt", "twos"):
        raise NotImplementedError(
            f"mp4 audio codec {codec!r}: container demuxed "
            f"({tk.get('sample_count', 0)} samples) but bitstream decode "
            "needs a codec library — not in this container"
        )
    blob = b"".join(mp4_track_samples(data, tk))
    dtype = "<i2" if codec == "sowt" else ">i2"
    ch = max(1, tk.get("channels", 1))
    a = np.frombuffer(blob, dtype=dtype).astype(np.float64)
    return a.reshape(-1, ch), tk.get("sample_rate", 0)
