"""Minimal pure-Python PDF text extraction (S4).

The reference shells out to the pdf_extract crate
(ck-index/src/lib.rs:1561-1565) and caches the extracted text next to the
index (preprocess_file, lib.rs:1568-1596). This module rebuilds the
extraction for the common machine-generated-PDF shape — literal or
FlateDecode content streams with BT/ET text blocks and Tj / TJ / ' show
operators, standard string escapes — which covers the PDFs a code/docs
tree typically contains. Exotic encodings (CID fonts with ToUnicode
CMaps, crypt filters) are out of scope and extract as empty text rather
than crashing the scan.

Runs inside Arrow-batched mapInPandas/pandas UDFs at ingest (same seam as
the PNG decoder): zlib is stdlib, no third-party dependency.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
# text-showing operators inside a content stream
_TJ_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*(?:Tj|')|\[(?:[^\]\\]|\\.)*\]\s*TJ"
                    rb"|T\*|TD|Td|ET")
_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt in b"01234567":  # octal escape, 1-3 OCTAL digits
                j = i + 1
                while j < min(i + 4, n) and raw[j:j + 1] in b"01234567":
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation / unknown: drop the backslash
            continue
        out += c
        i += 1
    return bytes(out)


def _stream_text(content: bytes) -> str:
    """Walk the content stream's text operators in order: every shown
    string appends; Td/TD/T*/' (line moves) append a newline."""
    parts: list[str] = []
    pending_nl = False
    for m in _TJ_RE.finditer(content):
        tok = m.group(0)
        if tok in (b"T*", b"TD", b"Td"):
            pending_nl = True
            continue
        if tok == b"ET":
            pending_nl = True
            continue
        if pending_nl and parts:
            parts.append("\n")
        pending_nl = False
        for sm in _STR_RE.finditer(tok):
            parts.append(_unescape(sm.group(0)[1:-1]).decode("latin-1"))
        if tok.endswith(b"'"):
            pending_nl = True
    return "".join(parts)


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes -> extracted text ('' for non-PDF / undecodable input)."""
    if not data.startswith(b"%PDF"):
        return ""
    texts: list[str] = []
    for dict_part, body in _STREAM_RE.findall(data):
        raw = body
        if b"/FlateDecode" in dict_part:
            # the regex body may include the EOL before 'endstream'; the
            # compressed bytes can themselves END in 0x0a/0x0d, so trim at
            # most one EOL (never rstrip) and fall back to the raw body
            candidates = [body]
            if body.endswith(b"\r\n"):
                candidates.insert(0, body[:-2])
            elif body.endswith((b"\n", b"\r")):
                candidates.insert(0, body[:-1])
            raw = None
            for cand in candidates:
                try:
                    raw = zlib.decompress(cand)
                    break
                except zlib.error:
                    continue
            if raw is None:
                continue
        if b"BT" not in raw:
            continue
        t = _stream_text(raw)
        if t.strip():
            texts.append(t)
    return "\n".join(texts).strip()


def is_pdf(data: bytes) -> bool:
    return data[:5] == b"%PDF-"


def extract_pdf_text_udf():
    """Arrow pandas UDF: binary payload -> extracted text ('' on failure —
    the scan must never die on one odd PDF)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _udf(payload: pd.Series) -> pd.Series:
        def one(b):
            try:
                return extract_pdf_text(bytes(b)) if b is not None else ""
            except Exception:  # noqa: BLE001 — malformed PDFs extract empty
                return ""

        return payload.map(one)

    return _udf
