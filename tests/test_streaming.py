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


# ---- watermarked stateful aggregation (sessions + windows) ------------------


def test_stream_sessionize_watermark_and_late_data(spark, tmp_path):
    """Cross-batch session merge, watermark-driven finalization, and the
    late-data drop contract: an event older than the watermark whose
    session state was already finalized is dropped (Spark reports it in
    numRowsDroppedByWatermark), while an open session still merges."""
    import datetime as dt
    import os as _os
    import time as _time

    from ck_spark.streaming.ingest import stream_sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, minutes, user):
        return (eid, t0 + dt.timedelta(minutes=minutes), user, "click", 1.0)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    inp = str(tmp_path / "ev_in")
    batches = [
        # b0: two u1 events (one session), u2, and the u9 watermark driver
        [ev(1, 0, 1), ev(2, 10, 1), ev(3, 5, 2), ev(4, 300, 9)],
        # b1: u9 keep-alive; DURING this batch wm=03:00 so the early
        # sessions finalize+emit and their state is evicted
        [ev(7, 310, 9)],
        # b2: u2 00:20 is LATE (wm 03:10, state gone) -> dropped; the far-
        # future sentinel advances the watermark so u9's session finalizes
        [ev(6, 20, 2), (99, t0 + dt.timedelta(days=10), 99, "click", 1.0)],
    ]
    now = _time.time()
    for i, b in enumerate(batches):
        d = inp + f"/b={i}"
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(d)
        # file source orders micro-batches by modification time
        for f in _os.listdir(d):
            _os.utime(_os.path.join(d, f), (now - 3600 * (3 - i),) * 2)

    stream = (
        spark.readStream.schema(schema + ", b int")
        .option("maxFilesPerTrigger", "1")
        .parquet(inp)
    )
    sess = stream_sessionize(stream, gap="30 minutes", watermark="2 hours")
    q = (
        sess.writeStream.format("memory").queryName("sess_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress for op in p["stateOperators"]
    )
    rows = spark.sql("select * from sess_out").collect()
    got = {(r["user_id"], r["session_start_us"] // 60_000_000): r["n_events"]
           for r in rows}

    def mins(m):
        return int((t0 + dt.timedelta(minutes=m)).timestamp() // 60)

    assert dropped == 1                     # exactly the late u2 event
    assert got.get((1, mins(0))) == 2       # u1 session: 00:00+00:10 merged
    assert got.get((2, mins(5))) == 1       # u2: late 00:20 NOT merged
    assert got.get((9, mins(300))) == 2     # u9 merged across micro-batches
    assert all(u != 99 for u, _ in got)     # sentinel session never finalized

    # batch sessionize over the same non-late, non-sentinel events agrees
    from ck_spark.ops.events import sessionize

    kept = [e for b in batches for e in b if e[0] not in (6, 99)]
    batch = {(r["user_id"], r["session_start_us"] // 60_000_000): r["n_events"]
             for r in sessionize(spark.createDataFrame(kept, schema)).collect()}
    assert batch == got


def test_stream_event_stats_matches_batch(spark, tmp_path):
    """The watermarked windowed aggregation equals the batch groupBy on
    fully-arrived data (late-free input)."""
    import datetime as dt

    from ck_spark.streaming.ingest import stream_event_stats

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    rows = [(i, t0 + dt.timedelta(minutes=7 * i), i % 3, ["view", "click"][i % 2],
             float(i)) for i in range(40)]
    rows.append((999, t0 + dt.timedelta(days=5), 0, "view", 0.0))  # wm driver
    inp = str(tmp_path / "ev2_in")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(inp)

    stream = spark.readStream.schema(schema).parquet(inp)
    agg = stream_event_stats(stream, window="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.format("memory").queryName("win_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["window_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
           for r in spark.sql("select * from win_out").collect()}

    batch_df = spark.createDataFrame(rows[:-1], schema)  # the finalized part
    from ck_spark.streaming.ingest import stream_event_stats as _agg
    exp = {(r["window_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
           for r in _agg(batch_df).collect()}
    assert got == exp


def test_stream_batch_with_duplicate_keys_does_not_wedge(spark, tmp_path):
    """Two files in one trigger window carrying the SAME (repo, path,
    commit) doc used to fail update_index's collision check — and the
    checkpoint replays the identical batch forever (a wedged stream).
    The sink dedups within the batch; the stream completes and the doc
    is indexed once."""
    import os

    from ck_spark.query import BM25Index

    from ck_spark.index import build_index

    inp = str(tmp_path / "in")
    root = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inp)
    rows = [("r0", "dup.py", "c0", "python", "zebra alpha content")]
    cols = ["repo", "path", "commit", "lang", "content"]
    seed = [("r0", "seed.py", "c0", "python", "seed doc alpha")]
    build_index(spark, spark.createDataFrame(seed, cols), root,
                mode="code", n_segments=2, term_buckets=4)
    spark.createDataFrame(rows, cols).coalesce(1).write.mode(
        "overwrite").parquet(inp + "/a")
    spark.createDataFrame(rows, cols).coalesce(1).write.mode(
        "overwrite").parquet(inp + "/b")
    # both files under one input dir -> one availableNow drain; the 64-file
    # trigger puts them in the same micro-batch
    import shutil

    for sub in ("a", "b"):
        for f in os.listdir(os.path.join(inp, sub)):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(inp, sub, f),
                            os.path.join(inp, f"{sub}_{f}"))
        shutil.rmtree(os.path.join(inp, sub))
    stats = []
    q = start_index_stream(spark, inp, root, ckpt, available_now=True,
                           stats_log=stats)
    q.awaitTermination(120)
    assert stats, "batch must be processed, not crash the stream"
    idx = BM25Index.load(spark, root)
    assert int(idx.meta["n_docs"]) == 2  # seed + the dup doc exactly once
    hits = idx.search("zebra", k=5).collect()
    assert len(hits) == 1
