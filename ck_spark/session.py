"""SparkSession factory with scale-minded defaults.

Tests/bench run on local[N]; the same settings are what we would ship to a
1000-executor cluster (AQE on, sane shuffle partitioning, Arrow for every
pandas UDF). Nothing here is sandbox-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _pin_malloc_env() -> None:
    """Keep glibc from mmap/munmap-ing every large numpy buffer.

    The pandas-UDF kernels (tokenize, trigram extract, postings encode)
    allocate and free ~100 MB arrays per task; with the default
    M_MMAP_THRESHOLD every task re-faults those pages in, and first-touch
    page faults on this class of host cost ~50 us/4 KB and SERIALIZE
    across concurrent workers — measured as the dominant share of the
    per-task wall at 8-way concurrency (a warm-allocator rerun of the
    same kernel is 2-5x faster and scales flat). Raising the mmap and
    trim thresholds keeps freed big blocks on the heap free list so the
    NEXT task reuses already-faulted pages. Must be set before the JVM
    (and hence the pyspark worker daemon) is spawned — os.environ here
    propagates: python driver -> JVM -> daemon -> workers. Opt out with
    CK_SPARK_NO_MALLOC_TUNING=1.
    """
    if os.environ.get("CK_SPARK_NO_MALLOC_TUNING"):
        return
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))


def get_spark(
    app_name: str = "ck_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores=None -> local[*]. On a real cluster the master is supplied by
    spark-submit and this builder only contributes conf.
    """
    _pin_malloc_env()
    master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        n = cores or os.environ.get("SPARK_GRAFT_CPUS") or "*"
        master = f"local[{n}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(8, int(str(cores or os.cpu_count() or 8)))
        except ValueError:  # cores == "*"
            shuffle_partitions = os.cpu_count() or 8

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of shuffle partitions + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # UDF-heavy stages (tokenize/encode) are CPU-bound on small bytes;
        # the 64m default would coalesce them to 1-2 tasks and serialize.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow everywhere: the tokenizer/codec/scorer are pandas UDFs.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # Parquet scan sizing: at 100 TB this bounds task input size.
        .config("spark.sql.files.maxPartitionBytes", "256m")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # local mode defaults to maxFailures=1: one transient python-worker
        # crash (observed ~1/60 long runs: Arrow socket reset mid-batch)
        # aborts a whole build instead of retrying the task. Cluster
        # deployments default to 4; match that resilience here. Every
        # operator is deterministic and idempotent per-task, so a retry
        # cannot change results.
        .config("spark.task.maxFailures", "4")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
