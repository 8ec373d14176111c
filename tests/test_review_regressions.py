"""Regressions for defects found in code review: AND-mode false positives
from term-missing segments, stale resume across different corpora, empty
segment-group builds, and grep context window size."""

import pandas as pd
import pytest


def _corpus(rows):
    return pd.DataFrame(
        [(f"r{i}", f"p{i}.py", f"c{i}", "python", text) for i, text in enumerate(rows)],
        columns=["repo", "path", "commit", "lang", "content"],
    )


def test_and_mode_requires_all_terms_in_segment(spark, tmp_path):
    from ck_spark.index import build_index
    from ck_spark.query import BM25Index

    # one true conjunctive match + many docs with only one term; with 4
    # doc-hash segments, most segments have no 'zebra' posting row at all
    rows = ["alpha zebra together here"] + [f"alpha only doc {i}" for i in range(40)]
    root = str(tmp_path / "andidx")
    build_index(spark, spark.createDataFrame(_corpus(rows)), root, mode="code",
                n_segments=4, term_buckets=4, build_groups=1)
    idx = BM25Index.load(spark, root)
    got = idx.search("alpha zebra", mode="and", k=50).collect()
    assert len(got) == 1
    batch = idx.search_many([("alpha zebra", "and")], k=50).collect()
    assert len(batch) == 1
    assert batch[0]["doc_id"] == got[0]["doc_id"]


def test_resume_does_not_reuse_stale_corpus(spark, tmp_path):
    from ck_spark.index import build_index
    from ck_spark.query import BM25Index

    root = str(tmp_path / "staleidx")
    build_index(spark, spark.createDataFrame(_corpus(["old words here"] * 3)),
                root, mode="simple", n_segments=2, term_buckets=2,
                build_groups=1, snapshot_id="v1")
    # different corpus, same out_dir, resume on — new snapshot forces rebuild
    build_index(spark, spark.createDataFrame(_corpus(["fresh tokens now"] * 3)),
                root, mode="simple", n_segments=2, term_buckets=2,
                build_groups=1, snapshot_id="v2")
    idx = BM25Index.load(spark, root)
    assert idx.search("fresh", k=5).count() == 3
    assert idx.search("old", k=5).count() == 0


def test_build_with_empty_segment_group(spark, tmp_path):
    from ck_spark.index import build_index
    from ck_spark.query import BM25Index

    # 3 docs, 8 segments, 4 groups -> at least one group has no docs
    root = str(tmp_path / "tinyidx")
    build_index(spark, spark.createDataFrame(_corpus(["a b", "c d", "e f"])),
                root, mode="simple", n_segments=8, term_buckets=4, build_groups=4)
    idx = BM25Index.load(spark, root)
    assert idx.search("a", k=5).count() == 1


def test_update_removing_all_docs_of_affected_segments(spark, tmp_path):
    from ck_spark.index import build_index
    from ck_spark.index.builder import update_index
    from ck_spark.query import BM25Index

    root = str(tmp_path / "rmidx")
    base = _corpus(["kept words", "gone words", "also kept"])
    build_index(spark, spark.createDataFrame(base), root, mode="simple",
                n_segments=8, term_buckets=4, build_groups=1)
    smaller = base[base["content"] != "gone words"]
    stats = update_index(spark, spark.createDataFrame(smaller), root)
    assert stats["removed"] == 1
    idx = BM25Index.load(spark, root)
    assert idx.search("gone", k=5).count() == 0
    assert idx.search("kept", k=5).count() == 2


def test_grep_context_window_exact(spark):
    from ck_spark.query.grep import grep_with_context

    text = "\n".join(f"line{i}" for i in range(1, 31))
    df = spark.createDataFrame(
        [("r", "p", "c", "t", text)], ["repo", "path", "commit", "lang", "content"]
    )
    rows = grep_with_context(df, "^line15$", before=2, after=1).collect()
    assert len(rows) == 1
    assert rows[0]["context"] == ["line13", "line14", "line15", "line16"]
