import os

import numpy as np
import pytest

from ck_spark.corpus import generate_corpus
from ck_spark.index import build_index
from ck_spark.query import BM25Index
from ck_spark.streaming.ingest import start_index_stream


@pytest.fixture(scope="module")
def parts():
    full = generate_corpus(200, seed=42)
    edge_mask = full["repo"] == "org-edge/repo-edge"
    body = full[~edge_mask]
    part1 = body.iloc[:120]
    part2 = body.iloc[120:]
    return full, part1, part2, full[edge_mask]


def test_stream_upserts_match_batch_build(spark, parts, tmp_path):
    full, part1, part2, edge = parts
    inp = str(tmp_path / "incoming")
    os.makedirs(inp)
    root = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")

    # bootstrap: initial batch build over part1 (+ edge docs so binary
    # handling is exercised); doc_map carries tfm for upserts
    seed_df = spark.createDataFrame(__import__("pandas").concat([part1, edge]))
    build_index(spark, seed_df, root, mode="code", n_segments=4,
                term_buckets=8, build_groups=2)

    # drop part2 into the stream dir -> drain with availableNow
    spark.createDataFrame(part2).write.mode("overwrite").parquet(inp)
    stats_log: list = []
    q = start_index_stream(spark, inp, root, ckpt, available_now=True,
                           stats_log=stats_log)
    q.awaitTermination(300)
    assert stats_log, "stream processed no batches"
    assert sum(s["added"] for s in stats_log) == len(part2)
    assert all(s["removed"] == 0 for s in stats_log)

    # streamed index == batch index over the full corpus
    fresh_root = str(tmp_path / "fresh_idx")
    build_index(spark, spark.createDataFrame(full), fresh_root, mode="code",
                n_segments=4, term_buckets=8, build_groups=2)
    streamed = BM25Index.load(spark, root)
    fresh = BM25Index.load(spark, fresh_root)
    for qstr in ["parse buffer", "def", "merge split cache"]:
        a = [(r["doc_id"], r["score"]) for r in streamed.search(qstr, k=10).collect()]
        b = [(r["doc_id"], r["score"]) for r in fresh.search(qstr, k=10).collect()]
        assert [d for d, _ in a] == [d for d, _ in b], qstr
        np.testing.assert_allclose([s for _, s in a], [s for _, s in b], rtol=1e-12)

    # re-draining with the same checkpoint is a no-op (exactly-once)
    stats2: list = []
    q2 = start_index_stream(spark, inp, root, ckpt, available_now=True,
                            stats_log=stats2)
    q2.awaitTermination(300)
    assert stats2 == []

    # idempotence: replaying the same docs through a fresh checkpoint
    # changes nothing (sha-gated upsert)
    stats3: list = []
    q3 = start_index_stream(spark, inp, root, str(tmp_path / "ckpt2"),
                            available_now=True, stats_log=stats3)
    q3.awaitTermination(300)
    assert all(s["added"] == s["modified"] == 0 for s in stats3)
