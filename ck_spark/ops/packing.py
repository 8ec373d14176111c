"""Sequence-packing operators — assigning documents to fixed-length
training sequences, the step between a cleaned corpus and an LLM data
loader (round brief: training-pipeline extensions are first-class).

Two packing disciplines, matching how real pipelines differ:

1. `pack_concat_split` — GPT-style "concatenate the shard's token
   stream, cut every seq_len tokens" packing. Documents may span
   sequence boundaries. This is a pure prefix-sum: window cumsum per
   shard → span arithmetic, all Catalyst expressions, and therefore
   DuckDB-oracle-verifiable (hash-checked by the driver contract).
2. `pack_greedy` — first-fit-in-order bin packing WITHOUT splitting
   documents: a sequence is closed when the next document would
   overflow seq_len. The capacity-reset recurrence is inherently
   sequential per shard, so it runs as applyInPandas over shards with a
   numpy loop per shard (state is two scalars; the loop is over the
   shard's docs). Verified by invariant tests (capacity, order
   preservation, greedy tightness, exactly-once) rather than SQL.

Scale design: both operators partition by a hash shard (`n_shards`
controls parallelism, default 1 shard per ~64 MB of tokens is sane at
100 TB). All windows are PARTITIONED — no global ordering, no single
reducer; skew is bounded because shards are hash-assigned. Oversized
documents (> seq_len) are flagged, not dropped silently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_shard_tokens(df: DataFrame, id_col: str, token_count_col: str,
                       text_col: str, n_shards: int,
                       shard_col: str | None = None):
    if token_count_col:
        toks = F.col(token_count_col)
    else:
        # count non-empty \s+-separated tokens: robust to leading /
        # trailing whitespace of ANY kind (trim only strips spaces) and
        # to whitespace-only documents
        toks = F.size(F.filter(F.split(F.col(text_col), r"\s+"),
                               lambda x: x != F.lit("")))
    shard = (F.col(shard_col) if shard_col
             else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)))
    return (
        df.withColumn("n_tokens", toks.cast("long"))
        .withColumn("shard", shard.cast("int"))
    )


def pack_concat_split(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
    n_shards: int = 64,
    shard_col: str | None = None,
) -> DataFrame:
    """Concat-and-split packing: per shard, documents in `id_col` order
    form one token stream cut every `seq_len` tokens.

    Output per doc: shard, n_tokens, start_tok (exclusive prefix sum),
    seq_first / seq_last (sequence ids the doc's tokens land in, shard-
    local), n_seqs_spanned. Empty docs occupy no tokens and are tagged
    to the sequence at their stream position."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    base = _with_shard_tokens(df, id_col, token_count_col, text_col,
                              n_shards, shard_col)
    w = Window.partitionBy("shard").orderBy(id_col)
    start = F.coalesce(
        F.sum("n_tokens").over(w) - F.col("n_tokens"), F.lit(0))
    out = (
        base.withColumn("start_tok", start)
        .withColumn("seq_first", (F.col("start_tok") / seq_len).cast("long"))
        .withColumn(
            "seq_last",
            F.when(F.col("n_tokens") == 0, F.col("seq_first")).otherwise(
                ((F.col("start_tok") + F.col("n_tokens") - 1) / seq_len)
                .cast("long")),
        )
        .withColumn("n_seqs_spanned",
                    (F.col("seq_last") - F.col("seq_first") + 1).cast("int"))
    )
    return out.select(id_col, "shard", "n_tokens", "start_tok",
                      "seq_first", "seq_last", "n_seqs_spanned")


PACK_GREEDY_SCHEMA = (
    "doc_id long, shard int, n_tokens long, seq_id long, "
    "offset_in_seq long, oversize boolean"
)


def pack_greedy(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
    n_shards: int = 64,
    shard_col: str | None = None,
) -> DataFrame:
    """First-fit-in-order packing without splitting: per shard, walk the
    documents in `id_col` order; if the current sequence cannot hold the
    next document, close it and open the next. Documents longer than
    seq_len get a sequence of their own and oversize=true (the caller
    decides truncate/split policy — never silently dropped).

    seq_id is shard-local; (shard, seq_id) is the global sequence key."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    base = _with_shard_tokens(df, id_col, token_count_col, text_col,
                              n_shards, shard_col).select(
        F.col(id_col).cast("long").alias("doc_id"), "shard", "n_tokens")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        toks = pdf["n_tokens"].to_numpy(np.int64)
        n = toks.size
        seq_ids = np.empty(n, dtype=np.int64)
        offsets = np.empty(n, dtype=np.int64)
        seq = 0
        fill = 0
        for i in range(n):
            t = toks[i]
            if fill and fill + t > seq_len:
                seq += 1
                fill = 0
            offsets[i] = fill
            seq_ids[i] = seq
            fill += t
            if fill >= seq_len:
                seq += 1
                fill = 0
        return pd.DataFrame({
            "doc_id": pdf["doc_id"].to_numpy(),
            "shard": pdf["shard"].to_numpy(),
            "n_tokens": toks,
            "seq_id": seq_ids,
            "offset_in_seq": offsets,
            "oversize": toks > seq_len,
        })

    return base.groupBy("shard").applyInPandas(pack, PACK_GREEDY_SCHEMA)


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Roll-up over pack_greedy output: sequences, fill factor, waste.
    One aggregation, broadcast-friendly (a handful of rows out)."""
    per_seq = packed.groupBy("shard", "seq_id").agg(
        F.sum("n_tokens").alias("seq_tokens"),
        F.count("*").alias("docs_in_seq"),
    )
    return per_seq.agg(
        F.count("*").alias("n_seqs"),
        F.sum("seq_tokens").alias("total_tokens"),
        F.avg("seq_tokens").alias("avg_seq_tokens"),
        F.avg("docs_in_seq").alias("avg_docs_per_seq"),
        (F.avg("seq_tokens") / seq_len).alias("fill_factor"),
    )
