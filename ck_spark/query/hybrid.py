"""Reciprocal-Rank-Fusion hybrid search.

The rebuild of ck's hybrid mode (/root/reference/ck-engine/src/lib.rs:
992-1060): run two retrieval modes, key-merge their rank lists, score
score(d) = Σ_lists 1/(rrf_k + rank) with rrf_k = 60 (lib.rs:1024-1034),
sort desc and truncate. ck merges on file:line_start; the engine fuses on
caller-supplied key columns (doc granularity for lexical+semantic, line
granularity for regex+semantic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ck_spark.constants import RRF_K


def add_rank(df: DataFrame, order_cols: list, rank_col: str = "rank") -> DataFrame:
    """1-based rank by the given ordering (deterministic: callers must
    include a unique tiebreaker column)."""
    w = Window.orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w))


def rrf_fuse(
    ranked: list[DataFrame],
    key_cols: list[str],
    k: int | None = None,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Fuse rank lists: each input must carry key_cols + 'rank'.
    Returns key_cols + rrf_score, ordered desc with key tiebreak.

    union + groupBy(sum) rather than N-way outer join: one shuffle on the
    fused key regardless of list count.
    """
    tagged = None
    for df in ranked:
        part = df.select(*key_cols, "rank")
        tagged = part if tagged is None else tagged.unionByName(part)
    fused = tagged.groupBy(*key_cols).agg(
        F.sum(1.0 / (F.lit(rrf_k) + F.col("rank"))).alias("rrf_score")
    )
    out = fused.orderBy(F.desc("rrf_score"), *key_cols)
    if k is not None:
        out = out.limit(k)
    return out
