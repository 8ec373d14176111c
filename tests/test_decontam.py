"""Benchmark-decontamination operator tests (the contract query
decontam_overlap hash-verifies against a DuckDB oracle; these cover the
semantics and the hashed-shingle production mode)."""

from pyspark.sql import functions as F

from ck_spark.ops.decontam import contamination_flags, shingle_ngrams


def _df(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_shingles_basic_and_short_docs(spark):
    df = _df(spark, [
        (0, "a b c d e"),          # 3 trigrams
        (1, "a b"),                # shorter than n -> none
        (2, ""),                   # empty -> none
        (3, "X--y z W"),           # normalization: lower + non-alnum split
    ])
    sh = shingle_ngrams(df, n=3)
    got = {(r["doc_id"], r["shingle"]) for r in sh.collect()}
    assert got == {
        (0, "a b c"), (0, "b c d"), (0, "c d e"),
        (3, "x y z"), (3, "y z w"),
    }


def test_contamination_flags_exact_and_threshold(spark):
    docs = _df(spark, [
        (0, "one two three four five six"),   # shares 2 shingles w/ bench
        (1, "totally different words here now"),
        (2, "one two three unrelated tail words"),  # shares 1
        (3, "x y"),                            # too short to shingle
    ])
    bench = _df(spark, [(100, "zero one two three four ...")])
    out = {r["doc_id"]: r for r in
           contamination_flags(docs, bench, n=3).collect()}
    assert len(out) == 4  # every doc reported exactly once
    assert out[0]["n_shared"] == 2 and out[0]["contaminated"]
    assert out[1]["n_shared"] == 0 and not out[1]["contaminated"]
    assert out[2]["n_shared"] == 1 and out[2]["contaminated"]
    assert out[3]["n_shared"] == 0
    # min_hits raises the bar
    out2 = {r["doc_id"]: r["contaminated"] for r in
            contamination_flags(docs, bench, n=3, min_hits=2).collect()}
    assert out2 == {0: True, 1: False, 2: False, 3: False}


def test_hashed_shingle_mode_matches_string_mode(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(120)
    bench = docs.where(F.col("doc_id") % 11 == 2)
    a = contamination_flags(docs, bench, n=6).orderBy("doc_id").collect()
    b = contamination_flags(docs, bench, n=6,
                            hash_shingles=True).orderBy("doc_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # benchmark members self-collide by construction
    bench_ids = {r["doc_id"] for r in bench.select("doc_id").collect()}
    flagged = {r["doc_id"] for r in a if r["contaminated"]}
    import re

    long_bench = {  # count tokens with the operator's own split regex
        r["doc_id"] for r in bench.collect()
        if len([t for t in re.split("[^a-z0-9]+", r["text"].lower())
                if t]) >= 6
    }
    assert long_bench <= flagged
    assert bench_ids >= long_bench  # sanity: proxy stayed within bench


def test_benchmark_side_broadcasts(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.limit(5)
    plan = contamination_flags(docs, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
