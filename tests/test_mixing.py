"""Data-mixing operator tests (the mixture_weights contract query
hash-verifies the sampled output against a DuckDB oracle)."""

import pytest
from pyspark.sql import functions as F

from ck_spark.ops.mixing import mixture_stats, weighted_mixture


def _df(spark):
    rows = [(i, f"s{i % 3}", f"text {i}") for i in range(300)]
    return spark.createDataFrame(
        rows, schema="doc_id long, source string, text string")


def test_whole_weights_replicate_exactly(spark):
    out = weighted_mixture(_df(spark), {"s0": 2.0, "s1": 1.0, "s2": 0.0},
                           strict=True)
    stats = {r["source"]: r for r in mixture_stats(out).collect()}
    assert stats["s0"]["achieved_weight"] == 2.0
    assert stats["s1"]["achieved_weight"] == 1.0
    assert "s2" not in stats  # weight 0 -> dropped
    # copy ids enumerate within each doc
    copies = out.where("source = 's0'").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("copy_id")).alias("c")).collect()
    assert all(r["c"] == [0, 1] for r in copies)


def test_fractional_weight_is_deterministic_and_close(spark):
    df = _df(spark)
    out1 = weighted_mixture(df, {"s0": 0.4, "s1": 2.5, "s2": 1.0})
    out2 = weighted_mixture(df.repartition(7), {"s0": 0.4, "s1": 2.5,
                                                "s2": 1.0})
    a = sorted(tuple(r) for r in out1.select("doc_id", "copy_id").collect())
    b = sorted(tuple(r) for r in out2.select("doc_id", "copy_id").collect())
    assert a == b  # partitioning-independent determinism
    stats = {r["source"]: r["achieved_weight"]
             for r in mixture_stats(out1, input_df=df).collect()}
    assert abs(stats["s0"] - 0.4) < 0.15  # 100 docs/source: rough law
    assert abs(stats["s1"] - 2.5) < 0.15
    assert stats["s2"] == 1.0


def test_strict_mode_rejects_unweighted_sources(spark):
    with pytest.raises(ValueError, match="no mixture weight.*s2"):
        weighted_mixture(_df(spark), {"s0": 1.0, "s1": 1.0})
    # non-strict silently drops them
    out = weighted_mixture(_df(spark), {"s0": 1.0}, strict=False)
    assert out.select("source").distinct().collect()[0]["source"] == "s0"


def test_negative_weight_rejected(spark):
    with pytest.raises(ValueError, match="negative weight"):
        weighted_mixture(_df(spark), {"s0": -1.0, "s1": 0, "s2": 0})


def test_mixture_plan_is_narrow(spark):
    df = _df(spark)
    plan = weighted_mixture(df, {"s0": 2.5, "s1": 1.0, "s2": 0.3}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map + explode, no shuffle
    assert "Python" not in plan
