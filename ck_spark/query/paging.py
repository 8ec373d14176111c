"""Cursorless pagination over a deterministic ordering.

The rebuild of ck's MCP pagination (cursor + page_size, default 50, max
200 — ck-cli/src/mcp_server.rs:123-237). Distributed top-(offset+page)
via TakeOrderedAndProject, then a local slice of the bounded survivors —
never an unpartitioned window over the full input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PAGE_SIZE = 50
MAX_PAGE_SIZE = 200


def paginate(
    df: DataFrame, order_cols: list, page: int = 0,
    page_size: int = DEFAULT_PAGE_SIZE,
) -> DataFrame:
    """Return page `page` (0-based). order_cols must totally order the
    rows (include a unique tiebreaker) or pages can overlap.

    Plan: orderBy().limit(offset+page_size) is a distributed partial
    top-k (each task keeps ≤ offset+page_size rows); only that bounded
    set collapses to one partition for row numbering. The previous
    row_number-over-everything formulation single-partitioned the whole
    input — this one is safe under a 100× caller."""
    page_size = min(page_size, MAX_PAGE_SIZE)
    lo = page * page_size
    bounded = (
        df.orderBy(*order_cols)
        .limit(lo + page_size)
        .coalesce(1)
        .sortWithinPartitions(*order_cols)
    )
    return (
        bounded.withColumn("_rn", F.monotonically_increasing_id() + 1)
        .where(F.col("_rn") > lo)
        .drop("_rn")
    )
