"""Corpus source/sink seam: parquet in this sandbox, Iceberg in production.

The engine is storage-agnostic — every read/write of the corpus and the
index side tables goes through these helpers, so switching to Iceberg is
a format string + catalog config, not a code change. Iceberg specifics
that matter at 10^12 files (and where they land here):

- partition spec: `bucket(N, repo)` or `(lang, bucket(repo))` on the
  corpus table → partition pruning for scoped searches;
- snapshot ids: `read_corpus(..., snapshot_id=…)` pins the build input —
  the manifest's input fingerprint is the sandbox stand-in;
- `overwritePartitions()`: the transactional equivalent of the
  delete-dir + dynamic-overwrite swap used by update_index locally;
- incremental reads between snapshots feed update_index's diff directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _is_iceberg(ref: str) -> bool:
    # catalog table references look like cat.db.table; paths contain '/'
    return "/" not in ref and "." in ref


def read_corpus(
    spark: SparkSession,
    ref: str,
    snapshot_id: int | None = None,
    fmt: str | None = None,
) -> DataFrame:
    """ref: a parquet directory path or an Iceberg table identifier."""
    use_iceberg = fmt == "iceberg" or (fmt is None and _is_iceberg(ref))
    if use_iceberg:
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(ref)
    return spark.read.schema(CORPUS_SCHEMA).parquet(ref)


def write_corpus(df: DataFrame, ref: str, fmt: str | None = None, mode: str = "overwrite") -> None:
    use_iceberg = fmt == "iceberg" or (fmt is None and _is_iceberg(ref))
    if use_iceberg:
        if mode == "overwrite":
            df.writeTo(ref).createOrReplace()
        else:
            df.writeTo(ref).append()
        return
    df.write.mode(mode).parquet(ref)
