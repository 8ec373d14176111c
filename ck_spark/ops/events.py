"""Event-stream analytics operators (the general-analytics side of the
engine: the same DataFrame-first patterns over the events table).

sessionize() uses Spark's native session_window — in batch it compiles to
a single shuffle on the session keys with a sort-based session merge; in
Structured Streaming the identical expression becomes stateful session
aggregation with watermark-driven eviction, so the operator is
batch/stream portable by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SESSION_GAP = "30 minutes"


def sessionize(
    events: DataFrame,
    gap: str = DEFAULT_SESSION_GAP,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user sessions: consecutive events closer than `gap` merge into
    one session (session end = last event + gap, Spark session_window
    semantics). Returns one row per session with exact micro-second
    boundaries and decimal-exact value sums (hash-comparable with the
    SQL oracle's gaps-and-islands formulation)."""
    w = F.session_window(F.col(ts_col), gap)
    if not events.isStreaming:
        # a narrow input (one parquet row group = one scan task at test
        # scale) would run the PARTIAL session aggregation single-task —
        # measured ~1 s serialized over 1M events. When the input is
        # narrower than half the cluster, pre-shuffle by the session key
        # (the same clustering the aggregation needs, so no extra
        # exchange is added — the partial pass just runs full-width). A
        # corpus-scale input arrives wider than the cluster and keeps
        # the map-side partial aggregation untouched.
        par = events.sparkSession.sparkContext.defaultParallelism
        if events.rdd.getNumPartitions() < max(2, par // 2):
            events = events.repartition(par, F.col(user_col))
    return (
        events.groupBy(F.col(user_col), w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col(user_col),
            # parquet timestamps may arrive as TIMESTAMP_NTZ; the session
            # runs in UTC so the cast is instant-preserving
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("session_start_us"),
            F.unix_micros(F.col("w.end").cast("timestamp")).alias("session_end_us"),
            F.col("n_events").cast("long").alias("n_events"),
            "sum_value",
        )
    )
