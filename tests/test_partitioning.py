"""Exact partition placement (ck_spark/partitioning.py) — the probe
table must pin rows to exactly the requested partition, which in turn
requires murmur3_int to match Spark's Murmur3Hash for IntegerType."""

import pytest
from pyspark.sql import functions as F

from ck_spark.partitioning import exact_repartition, murmur3_int, probe_table


def test_murmur3_matches_spark_hash(spark):
    vals = list(range(0, 50)) + [1 << 20, (1 << 31) - 1]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "x int")
        .select("x", F.hash("x").alias("h"))
        .collect()
    )
    for r in rows:
        assert murmur3_int(r["x"]) == r["h"], r


@pytest.mark.parametrize("width", [1, 2, 7, 8, 32, 96])
def test_probe_table_covers_every_partition(width):
    probes = probe_table(width)
    assert len(probes) == width
    assert sorted(murmur3_int(x) % width for x in probes) == list(range(width))


@pytest.mark.parametrize("width", [4, 16, 48])
def test_exact_repartition_places_rows(spark, width):
    df = spark.range(width * 20).select(
        (F.col("id") % width).cast("int").alias("p"), "id"
    )
    placed = exact_repartition(df, width, F.col("p")).select(
        "p", F.spark_partition_id().alias("pid")
    )
    assert placed.where(F.col("p") != F.col("pid")).count() == 0
    # no empty partitions: every p value present maps to its own partition
    assert placed.select("pid").distinct().count() == width
