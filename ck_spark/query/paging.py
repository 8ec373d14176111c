"""Cursorless pagination over a deterministic ordering.

The rebuild of ck's MCP pagination (cursor + page_size, default 50, max
200 — ck-cli/src/mcp_server.rs:123-237). row_number over the caller's
total ordering, sliced to [offset+1, offset+page_size].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_PAGE_SIZE = 50
MAX_PAGE_SIZE = 200


def paginate(
    df: DataFrame, order_cols: list, page: int = 0,
    page_size: int = DEFAULT_PAGE_SIZE,
) -> DataFrame:
    """Return page `page` (0-based). order_cols must totally order the
    rows (include a unique tiebreaker) or pages can overlap."""
    page_size = min(page_size, MAX_PAGE_SIZE)
    w = Window.orderBy(*order_cols)
    lo = page * page_size
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") > lo) & (F.col("_rn") <= lo + page_size))
        .drop("_rn")
    )
