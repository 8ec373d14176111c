"""Benchmark decontamination — flagging training documents that overlap
an evaluation set, the step every serious pretraining pipeline runs
before training (GPT-3 appendix C / The Pile lineage: n-gram collision
against held-out benchmarks).

Method: both sides are shingled into word n-grams (lowercased,
non-alphanumeric-split — the same normalization as the dedup operators);
a training doc is contaminated when it shares >= min_hits DISTINCT
shingles with ANY benchmark doc.

Scale design: the benchmark side is small by nature (eval sets are
thousands of rows, not billions) — its distinct shingle set BROADCASTS,
so the training corpus is one narrow scan + explode with a map-side
hash-semijoin: no corpus-scale shuffle. Shingles join as strings by
default (exact, contract-verifiable); pass hash_shingles=True at
production scale to join on xxhash64(shingle) instead (8-byte keys in
the broadcast map instead of strings; collision odds ~ |shingles|^2 /
2^64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingle_ngrams(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = True,
) -> DataFrame:
    """Word-n-gram shingles per doc: (id_col, shingle). distinct=True
    dedupes per (doc, shingle) — note that costs a shuffle; callers that
    follow with a filtering join should pass distinct=False and dedupe
    the (much smaller) post-join set instead."""
    from ck_spark.tokenizer import let_col

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )

    # let-bind the token array (tokenizer.let_col): slice(toks, i, n)
    # inside the transform lambda would otherwise re-tokenize the doc per
    # shingle — O(tokens^2) per row in interpreted higher-order eval
    def build(t):
        cnt = F.size(t)
        # sequence(1, 0) would generate a DESCENDING range — guard short docs
        idxs = F.when(cnt >= n, F.sequence(F.lit(1), cnt - n + 1)).otherwise(
            F.array().cast("array<int>"))
        return F.transform(idxs, lambda i: F.concat_ws(" ", F.slice(t, i, n)))

    sh = let_col(toks, build)
    out = (
        df.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .where(F.col("shingle") != "")
    )
    return out.distinct() if distinct else out


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    hash_shingles: bool = False,
) -> DataFrame:
    """Per training doc: n_shared (distinct shingles shared with the
    benchmark set) and contaminated = n_shared >= min_hits. Every input
    doc appears exactly once (docs with no overlap report 0)."""
    # corpus side stays NON-distinct (no corpus-scale shuffle before the
    # join); only the post-join matched set — tiny by construction — pays
    # a countDistinct
    d = shingle_ngrams(docs, n=n, id_col=id_col, text_col=text_col,
                       distinct=False)
    bench = benchmark.select(
        F.lit(0).alias("_bid"), F.col(bench_text_col).alias("text"))
    b = shingle_ngrams(bench, n=n, id_col="_bid", text_col="text",
                       distinct=False).select("shingle").distinct()
    if hash_shingles:
        d = d.withColumn("shingle", F.xxhash64("shingle"))
        b = b.withColumn("shingle", F.xxhash64("shingle"))
    hits = (
        d.join(F.broadcast(b), "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("n_shared"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .withColumn("n_shared", F.coalesce("n_shared", F.lit(0)))
        .withColumn("contaminated", F.col("n_shared") >= min_hits)
    )
