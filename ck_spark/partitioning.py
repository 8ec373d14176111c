"""Exact partition placement for DataFrame repartitions.

``df.repartition(n, key)`` places a row at ``pmod(murmur3(key), n)``.
When the key has only about as many distinct values as there are
partitions (a segment id, a (seg, bucket) group, a synthetic salt), that
hash assignment is balls-in-bins: ~37% of partitions come up empty and
some get two or three keys' worth of work — a 2-3x straggler on an
otherwise perfectly divisible stage (guide: synthetic partitioning keys
with too few distinct values). ``repartitionByRange`` fixes the balance
but pays a separate sampling pass over the input per exchange.

This module gets exact placement out of the plain hash exchange: for a
target width W, precompute (driver-side, microseconds) a probe table L
with ``pmod(murmur3_int(L[p]), W) == p`` for every p, then repartition
on the literal lookup ``L[p_expr]``. The row lands exactly at partition
``p_expr`` — deterministic, no sampling job, no empty partitions, no
collided stragglers. The murmur3 implementation below mirrors Spark's
Murmur3_x86_32.hashInt with the fixed seed 42 used by HashPartitioning;
a unit test pins placement against spark_partition_id().
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def murmur3_int(x: int, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32.hashInt for a 4-byte int input (the hash
    HashPartitioning applies to an IntegerType expression), as a signed
    int32."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    k = x & 0xFFFFFFFF
    k = (k * c1) & 0xFFFFFFFF
    k = _rotl32(k, 15)
    k = (k * c2) & 0xFFFFFFFF
    h = seed ^ k
    h = _rotl32(h, 13)
    h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    h ^= 4  # fmix: length in bytes
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


@lru_cache(maxsize=64)
def probe_table(width: int) -> tuple[int, ...]:
    """The smallest non-negative ints L with pmod(murmur3(L[p]), width)
    == p. Expected search cost ~width * H(width) hash trials (coupon
    collector) — microseconds for any realistic width."""
    out: list[int | None] = [None] * width
    found, x = 0, 0
    while found < width:
        p = murmur3_int(x) % width
        if out[p] is None:
            out[p] = x
            found += 1
        x += 1
    return tuple(out)  # type: ignore[arg-type]


def exact_repartition(df: DataFrame, width: int, p_expr: Column) -> DataFrame:
    """Repartition into exactly `width` partitions with every row placed
    at partition ``p_expr`` (an int expression in [0, width)). Rows whose
    p_expr is null or out of range fall into whatever partition the null/
    probed value hashes to — callers guarantee the range."""
    probes = probe_table(int(width))
    arr = F.array(*[F.lit(int(v)).cast("int") for v in probes])
    return df.repartition(int(width),
                          F.element_at(arr, p_expr.cast("int") + 1))
