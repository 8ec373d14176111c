"""Canonical schemas (SURVEY §7 target schemas). Fixed and code-defined —
the reference has no schema inference anywhere (SURVEY §1.3) and neither
does this engine."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _f(name, t, nullable=True):
    return StructField(name, t, nullable)


CORPUS = StructType([
    _f("repo", StringType()),
    _f("path", StringType()),
    _f("commit", StringType()),
    _f("lang", StringType()),
    _f("content", StringType()),
])

DOC_MAP = StructType([
    _f("doc_id", LongType()),
    _f("repo", StringType()),
    _f("path", StringType()),
    _f("commit", StringType()),
    _f("lang", StringType()),
    _f("content_sha256", StringType()),
    _f("doc_len", IntegerType()),
    _f("is_binary", BooleanType()),
    _f("seg", IntegerType()),
    # the per-doc tf and positions maps ride in doc_map (single tokenize
    # artifact); narrow readers column-prune both at the parquet scan.
    # tf == size(positions) by construction (tfm derived JVM-side).
    _f("tfm", MapType(StringType(), IntegerType())),
    _f("posm", MapType(StringType(), ArrayType(IntegerType()))),
    # v6 stored content (build_index(store_content=True), the default):
    # Zoekt-style — candidate fetch and service scans read the index's
    # own seg-partitioned, doc_id-sorted copy instead of a corpus pass.
    # Narrow readers prune it like tfm/posm; store_content=False builds
    # omit the column entirely.
    _f("content", StringType()),
])

POSTINGS = StructType([
    _f("term", StringType()),
    _f("n_docs", IntegerType()),
    _f("ids_blocks", ArrayType(BinaryType())),
    _f("tfs_blocks", ArrayType(BinaryType())),
    _f("dls_blocks", ArrayType(BinaryType())),
    # per-block varint positions stream (phrase queries); pruned by every
    # non-phrase query's explicit column projection
    _f("pos_blocks", ArrayType(BinaryType())),
    _f("block_max", ArrayType(FloatType())),
    _f("block_last", ArrayType(LongType())),
    _f("avgdl_enc", DoubleType()),
    _f("seg", IntegerType()),
    _f("bucket", IntegerType()),
])

TERM_STATS = StructType([
    _f("bucket", IntegerType()),
    _f("term", StringType()),
    _f("df", LongType()),
    _f("n_segments", LongType()),
])

CORPUS_STATS = StructType([
    _f("n_docs", LongType()),
    _f("avgdl", DoubleType()),
    _f("total_tokens", LongType()),
])

SEARCH_RESULT = StructType([
    _f("doc_id", LongType()),
    _f("score", DoubleType()),
])

# SURVEY §1.1 Span — every grep/chunk result carries one
SPAN = StructType([
    _f("byte_start", LongType()),
    _f("byte_end", LongType()),
    _f("line_start", IntegerType()),
    _f("line_end", IntegerType()),
])


def empty_df(spark, schema: str):
    """JVM-only empty DataFrame for a flat 'name type, …' schema string.

    spark.createDataFrame([], schema) goes through the python-object
    local-relation path — defaultParallelism tasks each spinning a Python
    worker (~4 s cold, ~0.5 s warm, for ZERO rows). range(0)+casts stays
    entirely JVM-side (~50 ms) and yields the identical schema."""
    from pyspark.sql import functions as F

    cols = []
    for part in schema.split(","):
        name, typ = part.strip().rsplit(" ", 1)
        cols.append(F.lit(None).cast(typ).alias(name))
    return spark.range(0).select(*cols)
