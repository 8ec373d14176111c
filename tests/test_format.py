"""Table-format strategy seam (index/format.py): update_index/repair_index
drive the swap ONLY through the SegmentStore interface, so the Iceberg
path (overwritePartitions commit) is a constructor argument, not a
rewrite. A fake store records the call protocol."""

from __future__ import annotations

import os

import pytest

from ck_spark.corpus import generate_corpus
from ck_spark.index import build_index
from ck_spark.index.builder import update_index
from ck_spark.index.format import ParquetDirStore, SegmentStore
from ck_spark.query import BM25Index


class RecordingStore(SegmentStore):
    """Delegates to ParquetDirStore but records the protocol order."""

    name = "recording"

    def __init__(self):
        self.inner = ParquetDirStore()
        self.calls: list[str] = []

    def stage(self, df, root, n_segments):
        self.calls.append("stage")
        return self.inner.stage(df, root, n_segments)

    def swap(self, doc_map_dir, segs, staging):
        self.calls.append(f"swap:{sorted(segs)}")
        return self.inner.swap(doc_map_dir, segs, staging)

    def heal(self, doc_map_dir, segs, staging):
        self.calls.append("heal")
        return self.inner.heal(doc_map_dir, segs, staging)

    def cleanup(self, staging):
        self.calls.append("cleanup")
        return self.inner.cleanup(staging)


def test_update_goes_through_store_protocol(spark, tmp_path):
    root = str(tmp_path / "idx")
    pdf = generate_corpus(60, seed=4)
    build_index(spark, spark.createDataFrame(pdf), root, mode="code",
                n_segments=2, term_buckets=4, build_groups=1)
    pdf2 = pdf.copy()
    pdf2.loc[pdf2.index[:5], "content"] = "changed content zebra"
    store = RecordingStore()
    stats = update_index(spark, spark.createDataFrame(pdf2), root, store=store)
    assert stats["modified"] == 5
    # protocol: stage -> (marker) -> swap -> cleanup; no heal on clean path
    assert store.calls[0] == "stage"
    assert store.calls[1].startswith("swap:")
    assert store.calls[2] == "cleanup"
    assert "heal" not in store.calls
    # results identical to a plain-store update path
    idx = BM25Index.load(spark, root)
    assert idx.search("zebra", k=10).count() == 5


def test_iceberg_store_requires_catalog(spark):
    from ck_spark.index.format import IcebergStore

    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        IcebergStore(spark, "cat.db.doc_map")


def test_fake_commit_store_marker_and_heal(spark, tmp_path):
    """A store whose swap 'crashes' mid-protocol: the marker stays, and the
    next update heals through the SAME interface before proceeding."""
    root = str(tmp_path / "idx2")
    pdf = generate_corpus(50, seed=5)
    build_index(spark, spark.createDataFrame(pdf), root, mode="code",
                n_segments=2, term_buckets=4, build_groups=1)

    class CrashingStore(RecordingStore):
        def swap(self, doc_map_dir, segs, staging):
            self.calls.append("swap-crash")
            raise RuntimeError("simulated crash mid-swap")

    pdf2 = pdf.copy()
    pdf2.loc[pdf2.index[:3], "content"] = "crashy update marker"
    crash = CrashingStore()
    with pytest.raises(RuntimeError, match="simulated crash"):
        update_index(spark, spark.createDataFrame(pdf2), root, store=crash)
    from ck_spark.index.manifest import Manifest

    assert Manifest(root).load_marker("update_inprogress") is not None

    # the next update heals first (heal call observed), then completes
    store = RecordingStore()
    stats = update_index(spark, spark.createDataFrame(pdf2), root, store=store)
    assert store.calls[0] == "heal"
    assert stats["modified"] == 3 or stats["unchanged"] >= 47
    assert Manifest(root).load_marker("update_inprogress") is None
    idx = BM25Index.load(spark, root)
    assert idx.search("crashy", k=10).count() == 3
