"""Similarity search over an embedding column (array<float>).

- Brute-force cosine top-k: F.zip_with + F.aggregate dot product — stays
  in the JVM (no Python), the exact baseline.
- LSH-bucketed top-k: deterministic random-hyperplane signatures (planes
  generated from sin(), so the SQL oracle can regenerate them bit-for-bit);
  the scale path searches only the query's bucket (optionally neighbors).
- Embedding near-dup: LSH buckets -> within-bucket exact cosine >= thr.

SURVEY.md §2.8 X8 is the reference's cosine (ck-engine/src/semantic_v3.rs:
321-335 / ck-ann/src/lib.rs:37-48 — brute force there too).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_PLANES = 8


def hyperplane(i: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane; same closed form is emitted
    into the oracle SQL (sin is IEEE-identical across libm/JVM here,
    verified in tests)."""
    return [math.sin(i * 101 + j + 1) for j in range(dim)]


def _dot_const(emb: Column, vec: list[float]) -> Column:
    arr = F.array(*[F.lit(float(x)) for x in vec])
    return F.aggregate(
        F.zip_with(emb, arr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(emb: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(emb, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_scores(
    df: DataFrame, query_vec: list[float],
    id_col: str = "vec_id", emb_col: str = "embedding",
) -> DataFrame:
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    cos = _dot_const(F.col(emb_col), query_vec) / (_norm(F.col(emb_col)) * F.lit(qn))
    return df.select(F.col(id_col), cos.alias("cosine"))


def cosine_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", emb_col: str = "embedding",
) -> DataFrame:
    return (
        cosine_scores(df, query_vec, id_col, emb_col)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def lsh_bucket_col(emb_col: Column, dim: int, n_planes: int = DEFAULT_PLANES) -> Column:
    bucket = None
    for i in range(n_planes):
        bit = F.when(_dot_const(emb_col, hyperplane(i, dim)) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def lsh_bucket_of(vec: list[float], n_planes: int = DEFAULT_PLANES) -> int:
    b = 0
    for i in range(n_planes):
        d = sum(float(v) * h for v, h in zip(vec, hyperplane(i, len(vec))))
        if d > 0:
            b |= 1 << i
    return b


def lsh_cosine_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", emb_col: str = "embedding",
    n_planes: int = DEFAULT_PLANES,
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's LSH bucket only.
    At 10^12 vectors this prunes the scan to ~N/2^planes; a partitioned
    table bucketed by this key turns it into partition pruning."""
    dim = len(query_vec)
    qb = lsh_bucket_of(query_vec, n_planes)
    bucketed = df.withColumn("lsh_bucket", lsh_bucket_col(F.col(emb_col), dim, n_planes))
    return (
        bucketed.where(F.col("lsh_bucket") == qb)
        .select(F.col(id_col), F.col(emb_col))
        .transform(lambda d: cosine_topk(d, query_vec, k, id_col, emb_col))
    )


def embedding_near_dup(
    df: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", emb_col: str = "embedding",
    n_planes: int = DEFAULT_PLANES, dim: int | None = None,
) -> DataFrame:
    """Near-duplicate vectors: same LSH bucket AND exact cosine >= thr.
    The bucket join bounds the quadratic blowup to within-bucket pairs."""
    if dim is None:
        dim = len(df.select(emb_col).first()[0])
    b = df.select(
        F.col(id_col), F.col(emb_col),
        lsh_bucket_col(F.col(emb_col), dim, n_planes).alias("lsh_bucket"),
        _norm(F.col(emb_col)).alias("nrm"),
    )
    l, r = b.alias("a"), b.alias("b")
    pair_dot = F.aggregate(
        F.zip_with(
            F.col(f"a.{emb_col}"), F.col(f"b.{emb_col}"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        l.join(r, "lsh_bucket")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (pair_dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
