"""Driver-side xxHash64 over a single BIGINT, bit-identical to Spark's
`xxhash64(col LONG)` (seed 42).

Spark's XxHash64 expression hashes a LongType input as XXH64 of its
8-byte little-endian encoding (org.apache.spark.sql.catalyst.expressions
XXH64.hashLong). Re-implementing the 8-byte special case lets the driver
derive `seg = pmod(xxhash64(doc_id), S)` for a handful of collected
result ids WITHOUT a Spark job — the SearchResult fetch's segment pruning
becomes pure arithmetic. Equality with the JVM expression is pinned by
tests/test_results_fetch.py against spark.sql on the same values.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64_long(value: int, seed: int = 42) -> int:
    """XXH64 of one 8-byte little-endian long — Spark's xxhash64(BIGINT).
    Returns the SIGNED 64-bit value Spark produces."""
    inp = value & _M64  # two's-complement little-endian bytes
    h = (seed + _P5 + 8) & _M64
    k1 = (inp * _P2) & _M64
    k1 = (_rotl(k1, 31) * _P1) & _M64
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    # avalanche
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def seg_of_doc_id(doc_id: int, n_segments: int) -> int:
    """pmod(xxhash64(doc_id), n_segments) — the builder's seg_expr
    (index/builder.py:134) in driver arithmetic."""
    return xxhash64_long(doc_id) % n_segments
