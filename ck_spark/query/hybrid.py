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

from ck_spark.constants import RRF_K


def add_rank(
    df: DataFrame, order_cols: list, limit: int, rank_col: str = "rank"
) -> DataFrame:
    """1-based rank by the given ordering over the TOP `limit` rows.

    RRF consumes bounded rank lists by definition (a doc at rank > limit
    contributes < 1/(rrf_k+limit) — the caller picks the cutoff), so rank
    assignment is: distributed top-limit (TakeOrderedAndProject), collapse
    the ≤limit survivors to one partition, re-sort locally, number rows.
    No unpartitioned WindowExec — an unbounded input can never be moved
    whole to a single partition (the 100×-scale footgun this replaces).

    order_cols must include a unique tiebreaker column for determinism."""
    bounded = (
        df.orderBy(*order_cols)
        .limit(int(limit))
        .coalesce(1)
        # re-sort within the single partition: guarantees row order no
        # matter how the limit was executed
        .sortWithinPartitions(*order_cols)
    )
    # single partition => monotonically_increasing_id is 0..n-1 in row order
    return bounded.withColumn(
        rank_col, (F.monotonically_increasing_id() + 1).cast("int")
    )


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
