"""Streaming deduplication over a document stream.

Two operators, two Spark state mechanisms — the batch analogue is
ops/dedup.py's exact_dedup (sha256 groupBy):

- `stream_dedup_exact` — NATIVE `dropDuplicatesWithinWatermark` keyed on
  sha2(content,256): emits only the first-seen copy of each payload;
  duplicate arrivals within the watermark horizon are dropped across
  micro-batch boundaries. State is bounded by the watermark (keys older
  than max(event time) − delay are evicted), so state size tracks the
  dedup horizon, not stream length — the property that matters on an
  unbounded 100 TB/day ingest feed.

- `stream_dup_stats` — CUSTOM stateful operator via
  `applyInPandasWithState` (the escape hatch for semantics the native
  operators can't express): per content-hash running state
  (n_copies, first_doc_id, last_ts) emitting an updated row per batch a
  key appears in — running duplicate counts WITH first-seen attribution,
  which no built-in streaming op produces. State is evicted by an
  EVENT-TIME timeout `ttl` past the key's last arrival: after the
  watermark passes that point the key is forgotten, so a much-later
  re-arrival counts as new — the same bounded-state trade
  dropDuplicatesWithinWatermark makes, here explicit in user code.

Both operate on the corpus/documents shape with an event-time column.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DUP_STATS_OUT = (
    "content_sha256 string, n_copies long, first_doc_id long, batch_new_copies long"
)
DUP_STATS_STATE = "n_copies long, first_doc_id long, last_ts_ms long"


def with_content_sha(df: DataFrame, content_col: str = "text") -> DataFrame:
    return df.withColumn("content_sha256", F.sha2(F.col(content_col), 256))


def stream_dedup_exact(
    stream: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    content_col: str = "text",
) -> DataFrame:
    """First-seen-only document stream: exact payload dedup across
    micro-batches, state bounded by `watermark`."""
    return (
        with_content_sha(stream, content_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_sha256"])
    )


def _ttl_ms(ttl: str) -> int:
    unit_ms = {
        "millisecond": 1, "second": 1000, "minute": 60_000,
        "hour": 3_600_000, "day": 86_400_000,
    }
    n, unit = ttl.strip().split()
    return int(n) * unit_ms[unit.rstrip("s")]


def _dup_stats_fn(ttl_ms: int):
    def fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (sha,) = key
        if state.hasTimedOut:
            # horizon passed with no new arrivals: forget the key (a later
            # re-arrival restarts as new — the documented bounded-state trade)
            state.remove()
            return
        n_copies, first_doc, last_ts_ms = (
            state.get if state.exists else (0, None, 0)
        )
        batch_new = 0
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            batch_new += len(pdf)
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            last_ts_ms = max(last_ts_ms, int(ts_ms.max()))
            if first_doc is None:
                # first copy = earliest event time, ties to the lower doc_id
                order = pdf.assign(_ts=ts_ms).sort_values(["_ts", "doc_id"])
                first_doc = int(order["doc_id"].iloc[0])
        n_copies += batch_new
        state.update((n_copies, first_doc, last_ts_ms))
        # event-time timeout: evict once the watermark passes last_ts + ttl
        state.setTimeoutTimestamp(last_ts_ms + ttl_ms)
        yield pd.DataFrame(
            [[sha, n_copies, first_doc, batch_new]],
            columns=["content_sha256", "n_copies", "first_doc_id",
                     "batch_new_copies"],
        )

    return fn


def stream_dup_stats(
    stream: DataFrame,
    watermark: str = "1 hour",
    ttl: str = "1 hour",
    ts_col: str = "ts",
    content_col: str = "text",
) -> DataFrame:
    """Running duplicate statistics per content hash (custom stateful
    operator): each micro-batch a hash appears in emits one updated row
    (total copies so far, the first-seen doc_id, copies in this batch).
    Keys idle past `ttl` of event time are evicted when the watermark
    passes them."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = (
        with_content_sha(stream, content_col)
        .withWatermark(ts_col, watermark)
        .select("content_sha256", F.col("doc_id").cast("long").alias("doc_id"),
                F.col(ts_col).alias("ts"))
    )
    return hashed.groupBy("content_sha256").applyInPandasWithState(
        _dup_stats_fn(_ttl_ms(ttl)),
        outputStructType=DUP_STATS_OUT,
        stateStructType=DUP_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
