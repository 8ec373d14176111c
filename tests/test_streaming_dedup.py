"""Streaming dedup (streaming/dedup.py): native dropDuplicatesWithinWatermark
exact dedup + the custom applyInPandasWithState running dup-stats operator."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

SCHEMA = "doc_id long, text string, ts timestamp"


def _write_batch(spark, pdf: pd.DataFrame, dirpath: str, name: str, mtime: int):
    """One parquet FILE at the top of the stream dir (the file source does
    not recurse); micro-batch order is forced via file mtime."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="ck_sd_batch_")
    spark.createDataFrame(pdf, schema=SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = next(
        f for f in os.listdir(tmp) if f.endswith(".parquet") and f.startswith("part-")
    )
    dest = os.path.join(dirpath, f"{name}.parquet")
    shutil.move(os.path.join(tmp, part), dest)
    shutil.rmtree(tmp, ignore_errors=True)
    os.utime(dest, (mtime, mtime))


def _drain(spark, src_dir: str, op, ckpt: str) -> list[dict]:
    rows: list[dict] = []

    def collect(batch_df, batch_id):
        for r in batch_df.collect():
            rows.append({**r.asDict(), "batch_id": batch_id})

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        op(stream)
        .writeStream.foreachBatch(collect)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return rows


def _ts(minute: int) -> pd.Timestamp:
    return pd.Timestamp(2026, 1, 1, 10, minute)


@pytest.fixture()
def feed(spark, tmp_path):
    """Five micro-batches (watermark only advances at batch boundaries,
    and state timeouts only fire for keys with NO data in a batch):

      b0: aaa(1), bbb(2), aaa(3)        @10:00-02
      b1: bbb(4), ccc(5)                @10:10-11   (dups within horizon)
      b2: ddd(6)                        @12:00      (advances watermark past
                                                     the 30-min horizon of b0/b1)
      b3: eee(7)                        @13:00      (aaa/bbb/ccc time out here)
      b4: aaa(9)                        @13:30      (re-arrival AFTER eviction)
    """
    src = str(tmp_path / "feed")
    os.makedirs(src)
    now = int(time.time())
    batches = [
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["aaa", "bbb", "aaa"],
                      "ts": [_ts(0), _ts(1), _ts(2)]}),
        pd.DataFrame({"doc_id": [4, 5], "text": ["bbb", "ccc"],
                      "ts": [_ts(10), _ts(11)]}),
        pd.DataFrame({"doc_id": [6], "text": ["ddd"],
                      "ts": [pd.Timestamp(2026, 1, 1, 12, 0)]}),
        pd.DataFrame({"doc_id": [7], "text": ["eee"],
                      "ts": [pd.Timestamp(2026, 1, 1, 13, 0)]}),
        pd.DataFrame({"doc_id": [9], "text": ["aaa"],
                      "ts": [pd.Timestamp(2026, 1, 1, 13, 30)]}),
    ]
    for i, b in enumerate(batches):
        _write_batch(spark, b, src, f"b{i}", now - 600 + i * 60)
    return src


def test_stream_dedup_exact_first_seen_only(spark, feed, tmp_path):
    from ck_spark.streaming.dedup import stream_dedup_exact

    rows = _drain(
        spark, feed,
        lambda s: stream_dedup_exact(s, watermark="30 minutes"),
        str(tmp_path / "ck1"),
    )
    by_doc = sorted(r["doc_id"] for r in rows)
    # 3 (dup of 1, same batch) and 4 (dup of 2, later batch within the
    # watermark horizon) are dropped; 9 re-admits "aaa" because the
    # watermark passed its state's horizon (evicted after b2/b3)
    assert by_doc == [1, 2, 5, 6, 7, 9]


def test_stream_dup_stats_running_counts(spark, feed, tmp_path):
    from ck_spark.streaming.dedup import stream_dup_stats

    rows = _drain(
        spark, feed,
        lambda s: stream_dup_stats(s, watermark="30 minutes", ttl="30 minutes"),
        str(tmp_path / "ck2"),
    )
    import hashlib

    sha = {t: hashlib.sha256(t.encode()).hexdigest() for t in ("aaa", "bbb", "ccc")}
    # batch 1: aaa seen twice (docs 1,3 — first = earlier ts = doc 1), bbb once
    b1 = {r["content_sha256"]: r for r in rows if r["batch_id"] == 0}
    assert b1[sha["aaa"]]["n_copies"] == 2
    assert b1[sha["aaa"]]["first_doc_id"] == 1
    assert b1[sha["aaa"]]["batch_new_copies"] == 2
    assert b1[sha["bbb"]]["n_copies"] == 1
    # batch 2: bbb count advances to 2 keeping first-seen attribution;
    # ccc enters new; aaa (no arrivals) emits nothing
    b2 = {r["content_sha256"]: r for r in rows if r["batch_id"] == 1}
    assert b2[sha["bbb"]]["n_copies"] == 2
    assert b2[sha["bbb"]]["first_doc_id"] == 2
    assert b2[sha["bbb"]]["batch_new_copies"] == 1
    assert b2[sha["ccc"]]["n_copies"] == 1
    assert sha["aaa"] not in b2
    # final batch: aaa re-arrives AFTER the watermark passed its
    # event-time ttl (state evicted in the eee batch) — counted as new,
    # attribution restarts at doc 9
    b4 = {r["content_sha256"]: r for r in rows if r["batch_id"] == 4}
    assert b4[sha["aaa"]]["n_copies"] == 1
    assert b4[sha["aaa"]]["first_doc_id"] == 9
    assert b4[sha["aaa"]]["batch_new_copies"] == 1


def test_stream_dedup_matches_batch_within_horizon(spark, tmp_path):
    """Within one watermark horizon the streamed dedup keeps exactly the
    batch exact-dedup canonicals (first == min doc_id here because ts
    order == doc_id order)."""
    from ck_spark.ops.dedup import exact_dedup
    from ck_spark.streaming.dedup import stream_dedup_exact

    src = str(tmp_path / "feed2")
    os.makedirs(src)
    pdf = pd.DataFrame(
        {"doc_id": range(1, 9),
         "text": ["x", "y", "x", "z", "y", "x", "w", "z"],
         "ts": [_ts(i) for i in range(8)]}
    )
    _write_batch(spark, pdf.iloc[:4], src, "b1", int(time.time()) - 300)
    _write_batch(spark, pdf.iloc[4:], src, "b2", int(time.time()) - 200)
    rows = _drain(
        spark, src,
        lambda s: stream_dedup_exact(s, watermark="2 hours"),
        str(tmp_path / "ck3"),
    )
    batch_canonicals = {
        r["canonical_id"]
        for r in exact_dedup(
            spark.createDataFrame(pdf, schema=SCHEMA)
        ).collect()
    }
    assert sorted(r["doc_id"] for r in rows) == sorted(batch_canonicals)
