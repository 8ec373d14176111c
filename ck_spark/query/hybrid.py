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


_SR_META = ["repo", "preview", "byte_start", "byte_end", "line_end", "lang",
            "score"]


def hybrid_results(
    regex_results: DataFrame,
    semantic_results: DataFrame,
    limit: int = 30,
    k: int | None = None,
    threshold: float | None = None,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """ck `SearchResult`-level hybrid fusion (ck-engine/src/lib.rs:
    1006-1060): both inputs are SearchResult-shaped frames (grep_results /
    semantic_results); the merge key is (path, line_start); the RRF score
    sums 1/(rrf_k + rank) over EVERY pushed entry — a line with several
    regex matches contributes once per match, exactly like ck's
    per-key Vec of (rank, result). The merged row's metadata
    (span/preview/lang) comes from the first entry pushed for its key:
    the regex list's lowest-rank row when present (regex inserts first),
    else the semantic row. score is replaced by the RRF sum; an optional
    threshold filters RAW rrf scores (lib.rs:1036-1043); output is
    (score desc, path, line_start) with top-k truncation.

    Ranks are assigned in each mode's own output order — regex
    (path, line_start, byte_start), semantic (score desc) — bounded to
    `limit` rows each (the RRF cutoff), so every frame past the inputs
    is driver-sized and the joins stay broadcast."""
    key = ["path", "line_start"]
    rx = add_rank(
        regex_results,
        [F.asc("path"), F.asc("line_start"), F.asc("byte_start")],
        limit,
    )
    sm = add_rank(
        semantic_results,
        [F.desc("score"), F.asc("path"), F.asc("line_start")],
        limit,
    )
    fused = rrf_fuse([rx, sm], key, k=None, rrf_k=rrf_k)

    def first_meta(df: DataFrame, prefix: str) -> DataFrame:
        # the key's lowest-rank row carries the metadata (ranks[0].1)
        return df.groupBy(*key).agg(
            F.min_by(F.struct(*_SR_META), F.col("rank")).alias("m")
        ).select(*key, *[F.col(f"m.{c}").alias(f"{prefix}{c}")
                         for c in _SR_META])

    rxm = first_meta(rx, "r_")
    smm = first_meta(sm, "s_")
    meta = rxm.join(smm, key, "full_outer").select(
        *key,
        *[F.coalesce(F.col(f"r_{c}"), F.col(f"s_{c}")).alias(c)
          for c in _SR_META if c != "score"],
    )
    out = (
        fused.join(meta, key)
        .select(
            "repo", "path",
            F.col("rrf_score").alias("score"),
            "preview", "byte_start", "byte_end", "line_start", "line_end",
            "lang",
        )
    )
    if threshold is not None:
        out = out.where(F.col("score") >= F.lit(threshold))
    out = out.orderBy(F.desc("score"), F.asc("path"), F.asc("line_start"))
    if k is not None:
        out = out.limit(k)
    return out


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
