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


# ---------------------------------------------------------------------------
# hybrid_results: SearchResult-level fusion (ck-engine/src/lib.rs:1006-1060)
# ---------------------------------------------------------------------------


def _sr_frame(spark, rows):
    vals = ",".join(
        f"('r','{p}',CAST({s} AS DOUBLE),'{pv}',{b0}L,{b1}L,{ls},{le},'x')"
        for p, ls, le, b0, b1, s, pv in rows
    )
    return spark.sql(
        f"SELECT * FROM VALUES {vals} AS t(repo, path, score, preview, "
        "byte_start, byte_end, line_start, line_end, lang)"
    )


def test_hybrid_results_rrf_and_metadata_precedence(spark):
    from ck_spark.query.hybrid import hybrid_results

    # regex list in its natural order: two matches on a.py line 1, one on
    # b.py line 2 -> ranks 1, 2, 3
    rx = _sr_frame(spark, [
        ("a.py", 1, 1, 0, 3, 1.0, "ra1"),
        ("a.py", 1, 1, 5, 8, 1.0, "ra2"),
        ("b.py", 2, 2, 10, 13, 1.0, "rb"),
    ])
    # semantic list: a.py line 1 (rank 1), c.py line 1 (rank 2)
    sm = _sr_frame(spark, [
        ("a.py", 1, 9, 0, 90, 0.9, "sa"),
        ("c.py", 1, 7, 0, 70, 0.8, "sc"),
    ])
    out = {(r["path"], r["line_start"]): r
           for r in hybrid_results(rx, sm, limit=30).collect()}
    # every pushed entry contributes: a.py:1 gets regex ranks 1+2 AND sem 1
    assert abs(out[("a.py", 1)]["score"] - (1/61 + 1/62 + 1/61)) < 1e-12
    assert abs(out[("b.py", 2)]["score"] - 1/63) < 1e-12
    assert abs(out[("c.py", 1)]["score"] - 1/62) < 1e-12
    # metadata = first pushed entry: regex rank-1 row wins over semantic
    a = out[("a.py", 1)]
    assert (a["preview"], a["byte_start"], a["byte_end"], a["line_end"]) == \
        ("ra1", 0, 3, 1)
    # semantic-only key keeps semantic metadata
    c = out[("c.py", 1)]
    assert (c["preview"], c["byte_end"], c["line_end"]) == ("sc", 70, 7)


def test_hybrid_results_threshold_topk_order(spark):
    from ck_spark.query.hybrid import hybrid_results

    rx = _sr_frame(spark, [
        ("a.py", 1, 1, 0, 3, 1.0, "ra"),
        ("b.py", 2, 2, 0, 3, 1.0, "rb"),
    ])
    sm = _sr_frame(spark, [("a.py", 1, 9, 0, 90, 0.9, "sa")])
    rows = hybrid_results(rx, sm, limit=30, threshold=0.02).collect()
    # only the doubly-ranked key (1/61 + 1/61 ≈ .0328) clears 0.02;
    # single-list keys max out at 1/61 ≈ .0164
    assert [(r["path"], r["line_start"]) for r in rows] == [("a.py", 1)]
    rows = hybrid_results(rx, sm, limit=30, k=1).collect()
    assert len(rows) == 1 and rows[0]["path"] == "a.py"
    # deterministic order: score desc then (path, line_start)
    rows = hybrid_results(rx, sm, limit=30).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
