import pytest
from pyspark.sql import functions as F

from ck_spark.query.hybrid import add_rank, rrf_fuse


@pytest.fixture(scope="module")
def two_lists(spark):
    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7), (4, 0.6)], ["doc_id", "score"]
    )
    b = spark.createDataFrame(
        [(3, 10.0), (5, 9.0), (1, 8.0)], ["doc_id", "score"]
    )
    ra = add_rank(a, [F.desc("score"), F.asc("doc_id")], 10)
    rb = add_rank(b, [F.desc("score"), F.asc("doc_id")], 10)
    return ra, rb


def test_rrf_formula(spark, two_lists):
    ra, rb = two_lists
    out = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([ra, rb], ["doc_id"]).collect()}
    # doc 1: rank 1 in A, rank 3 in B
    assert abs(out[1] - (1 / 61 + 1 / 63)) < 1e-12
    # doc 3: rank 3 in A, rank 1 in B
    assert abs(out[3] - (1 / 63 + 1 / 61)) < 1e-12
    # doc 5: only in B at rank 2
    assert abs(out[5] - 1 / 62) < 1e-12
    assert set(out) == {1, 2, 3, 4, 5}


def test_rrf_topk_and_tiebreak(spark, two_lists):
    ra, rb = two_lists
    rows = rrf_fuse([ra, rb], ["doc_id"], k=3).collect()
    assert len(rows) == 3
    # docs 1 and 3 tie exactly -> tiebreak by doc_id asc
    assert [r["doc_id"] for r in rows[:2]] == [1, 3]
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
