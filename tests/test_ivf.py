"""IVF ANN index (ops/ivf.py): exactness under full probing, recall under
partial probing, determinism across build parallelism, partition pruning."""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _query_vec(dim: int = 64) -> list[float]:
    return [math.sin(3 * j + 2) for j in range(dim)]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


@pytest.fixture(scope="module")
def ivf_dir(spark, emb):
    d = tempfile.mkdtemp(prefix="ck_ivf_")
    from ck_spark.ops.ivf import build_ivf_index

    build_ivf_index(spark, emb, d, k_lists=8, sample_size=256, iters=10, seed=7)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_kmeans_deterministic_and_unit():
    from ck_spark.ops.ivf import kmeans_train

    rng = np.random.default_rng(0)
    X = rng.normal(size=(500, 16))
    c1 = kmeans_train(X, 8, iters=12, seed=3)
    c2 = kmeans_train(X, 8, iters=12, seed=3)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 16)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_kmeans_empty_cluster_reseed():
    from ck_spark.ops.ivf import kmeans_train

    # 3 tight clusters, ask for 8 centroids: some inevitably go empty and
    # must be reseeded (no NaNs, still unit rows)
    rng = np.random.default_rng(1)
    base = rng.normal(size=(3, 8))
    X = np.repeat(base, 40, axis=0) + rng.normal(scale=1e-3, size=(120, 8))
    c = kmeans_train(X, 8, iters=10, seed=0)
    assert np.isfinite(c).all()
    assert np.allclose(np.linalg.norm(c, axis=1), 1.0)


def test_exhaustive_probe_equals_brute_force(spark, emb, ivf_dir):
    """nprobe >= k_lists probes every list: the index path must reproduce
    brute-force top-k EXACTLY (ids and cosines) — proves assignment,
    stored norms and probe ordering are lossless."""
    from ck_spark.ops.ivf import ivf_topk
    from ck_spark.ops.similarity import cosine_topk

    q = _query_vec()
    exact = [(r["vec_id"], round(r["cosine"], 9))
             for r in cosine_topk(emb, q, k=15).collect()]
    via_index = [(r["vec_id"], round(r["cosine"], 9))
                 for r in ivf_topk(spark, ivf_dir, q, k=15, nprobe=8).collect()]
    assert via_index == exact


def test_partial_probe_recall(spark, emb, ivf_dir):
    from ck_spark.ops.ivf import ivf_topk
    from ck_spark.ops.similarity import cosine_topk

    q = _query_vec()
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    got = {r["vec_id"] for r in ivf_topk(spark, ivf_dir, q, k=10, nprobe=3).collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.5, f"recall@10 at nprobe=3/8 collapsed: {recall}"
    # probing more lists is monotone non-degrading in this setup
    got5 = {r["vec_id"] for r in ivf_topk(spark, ivf_dir, q, k=10, nprobe=5).collect()}
    assert len(exact & got5) >= len(exact & got)


def test_build_parallelism_independent(spark, emb, ivf_dir):
    """Same table repartitioned differently -> identical centroids and an
    identical exhaustive answer (the training sample is a TakeOrdered, the
    assignment a pure map)."""
    from ck_spark.ops.ivf import build_ivf_index, ivf_topk, load_centroids

    d2 = tempfile.mkdtemp(prefix="ck_ivf_p_")
    try:
        build_ivf_index(spark, emb.repartition(13), d2,
                        k_lists=8, sample_size=256, iters=10, seed=7)
        assert np.array_equal(load_centroids(ivf_dir), load_centroids(d2))
        q = _query_vec()
        a = [(r["vec_id"], round(r["cosine"], 9))
             for r in ivf_topk(spark, ivf_dir, q, k=10, nprobe=8).collect()]
        b = [(r["vec_id"], round(r["cosine"], 9))
             for r in ivf_topk(spark, d2, q, k=10, nprobe=8).collect()]
        assert a == b
    finally:
        shutil.rmtree(d2, ignore_errors=True)


def test_partition_pruning_in_plan(spark, ivf_dir):
    """The probed scan must show centroid_id PartitionFilters — the 100 TB
    property: a query reads nprobe lists, not the corpus."""
    from ck_spark.ops.ivf import ivf_topk

    df = ivf_topk(spark, ivf_dir, _query_vec(), k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan
    scan = plan[plan.index("PartitionFilters"):]
    assert "centroid_id" in scan[: scan.index("]")]


def _synth_emb(spark, n, start_id, seed):
    from pyspark.sql import functions as F

    return spark.range(start_id, start_id + n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: F.sin(F.col("id") * 7919 + j * 13 + seed).cast("float"),
        ).alias("embedding"),
    )


def test_append_exact_after_add(spark, emb):
    """ivf_append assigns against frozen centroids; exhaustive probing over
    the grown index still equals brute force over the UNION — the add path
    is lossless."""
    from ck_spark.ops.ivf import build_ivf_index, ivf_append, ivf_topk
    from ck_spark.ops.similarity import cosine_topk

    d = tempfile.mkdtemp(prefix="ck_ivf_app_")
    try:
        base = _synth_emb(spark, 300, 0, seed=1)
        build_ivf_index(spark, base, d, k_lists=8, sample_size=256,
                        iters=10, seed=7)
        extra = _synth_emb(spark, 150, 1000, seed=2)
        n = ivf_append(spark, d, extra, batch_tag="b1")
        assert n == 150
        q = _query_vec()
        exact = [(r["vec_id"], round(r["cosine"], 9))
                 for r in cosine_topk(base.unionByName(extra), q, k=12).collect()]
        got = [(r["vec_id"], round(r["cosine"], 9))
               for r in ivf_topk(spark, d, q, k=12, nprobe=8).collect()]
        assert got == exact
        # a committed tag replays as a no-op — row count unchanged
        assert ivf_append(spark, d, extra, batch_tag="b1") == 0
        n_rows = spark.read.parquet(os.path.join(d, "lists")).count()
        assert n_rows == 450
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_append_crash_replay_never_duplicates(spark, emb):
    """A crashed (uncommitted) append leaves partial delta files; replaying
    the same batch_tag scrubs them first — no duplicate rows."""
    import glob as _glob

    from ck_spark.ops.ivf import build_ivf_index, ivf_append

    d = tempfile.mkdtemp(prefix="ck_ivf_crash2_")
    try:
        base = _synth_emb(spark, 200, 0, seed=1)
        build_ivf_index(spark, base, d, k_lists=4, sample_size=256,
                        iters=8, seed=7)
        extra = _synth_emb(spark, 80, 5000, seed=3)
        # simulate the crash: run a full append, then un-commit the tag
        # (meta rollback) leaving its delta files behind as orphans
        import json as _json

        assert ivf_append(spark, d, extra, batch_tag="b9") == 80
        meta_path = os.path.join(d, "ivf_meta.json")
        with open(meta_path) as f:
            meta = _json.load(f)
        meta["appends"].remove("b9")
        with open(meta_path, "w") as f:
            _json.dump(meta, f)
        orphans = _glob.glob(os.path.join(d, "lists", "centroid_id=*",
                                          "delta-b9-*"))
        assert orphans, "fixture must leave uncommitted delta files"
        # replay: orphans scrubbed, batch re-applied exactly once
        assert ivf_append(spark, d, extra, batch_tag="b9") == 80
        n_rows = spark.read.parquet(os.path.join(d, "lists")).count()
        assert n_rows == 280
        ids = [r["vec_id"] for r in
               spark.read.parquet(os.path.join(d, "lists")).collect()]
        assert len(ids) == len(set(ids)), "duplicate vec_ids after replay"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compact_merges_deltas_and_keeps_exactness(spark):
    """Compaction rewrites base + deltas into the salted layout: fewer
    files, identical exhaustive answers, append ledger kept (an old tag
    replay stays a no-op even though its delta files are gone)."""
    import glob as _glob

    from ck_spark.ops.ivf import build_ivf_index, ivf_append, ivf_compact, ivf_topk
    from ck_spark.ops.similarity import cosine_topk

    d = tempfile.mkdtemp(prefix="ck_ivf_cpt_")
    try:
        base = _synth_emb(spark, 200, 0, seed=1)
        build_ivf_index(spark, base, d, k_lists=4, sample_size=256,
                        iters=8, seed=7)
        union = base
        for i in range(3):
            extra = _synth_emb(spark, 60, 2000 + i * 100, seed=4 + i)
            assert ivf_append(spark, d, extra, batch_tag=f"t{i}") == 60
            union = union.unionByName(extra)
        stats = ivf_compact(spark, d)
        assert stats["files_after"] < stats["files_before"]
        assert not _glob.glob(os.path.join(d, "lists", "centroid_id=*", "delta-*"))
        q = _query_vec()
        exact = [(r["vec_id"], round(r["cosine"], 9))
                 for r in cosine_topk(union, q, k=12).collect()]
        got = [(r["vec_id"], round(r["cosine"], 9))
               for r in ivf_topk(spark, d, q, k=12, nprobe=4).collect()]
        assert got == exact
        # committed tags survive compaction: replay is still a no-op
        assert ivf_append(
            spark, d, _synth_emb(spark, 60, 2000, seed=4), batch_tag="t0"
        ) == 0
        assert spark.read.parquet(os.path.join(d, "lists")).count() == 380
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compact_crash_heals(spark):
    """Kill points around the rename-aside swap: READERS stay correct
    WITHOUT mutating anything (a reader healing concurrently with a live
    compactor could delete its just-finished staging between the two
    swap renames); the next WRITER rolls the state forward."""
    from ck_spark.ops.ivf import _heal_lists, build_ivf_index, ivf_topk

    d = tempfile.mkdtemp(prefix="ck_ivf_heal_")
    try:
        base = _synth_emb(spark, 150, 0, seed=1)
        build_ivf_index(spark, base, d, k_lists=4, sample_size=256,
                        iters=8, seed=7)
        q = _query_vec()
        want = [(r["vec_id"], round(r["cosine"], 9))
                for r in ivf_topk(spark, d, q, k=8, nprobe=4).collect()]
        lists_d = os.path.join(d, "lists")
        # crash between rename-aside and rename-in: staging + old, no lists
        import shutil as _sh

        _sh.copytree(lists_d, os.path.join(d, "lists.staging"))
        os.rename(lists_d, os.path.join(d, "lists.old"))
        got = [(r["vec_id"], round(r["cosine"], 9))
               for r in ivf_topk(spark, d, q, k=8, nprobe=4).collect()]
        assert got == want  # reader answers from the aside copy
        assert not os.path.exists(lists_d)  # ...and did NOT mutate
        assert os.path.exists(os.path.join(d, "lists.old"))
        _heal_lists(d)  # the next writer's first step
        assert os.path.exists(lists_d)
        assert not os.path.exists(os.path.join(d, "lists.old"))
        assert not os.path.exists(os.path.join(d, "lists.staging"))
        got = [(r["vec_id"], round(r["cosine"], 9))
               for r in ivf_topk(spark, d, q, k=8, nprobe=4).collect()]
        assert got == want
        # crash before the swap: lists + stale staging — the reader uses
        # lists untouched; the writer heal discards the stale staging
        _sh.copytree(lists_d, os.path.join(d, "lists.staging"))
        got = [(r["vec_id"], round(r["cosine"], 9))
               for r in ivf_topk(spark, d, q, k=8, nprobe=4).collect()]
        assert got == want
        assert os.path.exists(os.path.join(d, "lists.staging"))  # untouched
        _heal_lists(d)
        assert not os.path.exists(os.path.join(d, "lists.staging"))
        # crash after BOTH renames with the aside not yet dropped is the
        # 'old only' case already covered above; 'lists + old' heals too
        _sh.copytree(lists_d, os.path.join(d, "lists.old"))
        _heal_lists(d)
        assert not os.path.exists(os.path.join(d, "lists.old"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_incomplete_index_refused(spark, ivf_dir):
    from ck_spark.ops.ivf import META_NAME, ivf_topk

    d = tempfile.mkdtemp(prefix="ck_ivf_crash_")
    try:
        shutil.copytree(os.path.join(ivf_dir, "lists"), os.path.join(d, "lists"))
        # no meta json -> a crashed build must be refused loudly
        with pytest.raises(FileNotFoundError, match=META_NAME):
            ivf_topk(spark, d, _query_vec(), k=5, nprobe=2)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_append_rejects_unsafe_batch_tags(spark, ivf_dir, emb):
    """batch_tag lands verbatim in delta file names and in the crash-scrub
    glob; '-' is the name delimiter and glob metachars would corrupt the
    scrub match, so anything outside ASCII [A-Za-z0-9_]+ must be refused
    before any filesystem work happens."""
    from ck_spark.ops.ivf import ivf_append

    for bad in ("", "a-b", "a/b", "a*b", "a b", "é", "a."):
        with pytest.raises(ValueError, match="batch_tag"):
            ivf_append(spark, ivf_dir, emb.limit(1), batch_tag=bad)


def test_append_empty_batch_commits_tag(spark):
    """An empty batch must commit its tag as a 0-row append (a quiet feed
    is normal) instead of crashing on schema inference over a staging dir
    with no parquet footers — which would poison every retry."""
    import json

    from ck_spark.ops.ivf import META_NAME, build_ivf_index, ivf_append

    d = tempfile.mkdtemp(prefix="ck_ivf_empty_")
    try:
        base = _synth_emb(spark, 100, 0, seed=1)
        build_ivf_index(spark, base, d, k_lists=4, sample_size=128,
                        iters=5, seed=7)
        empty = _synth_emb(spark, 100, 5000, seed=2).limit(0)
        assert ivf_append(spark, d, empty, batch_tag="quiet1") == 0
        with open(os.path.join(d, META_NAME)) as f:
            meta = json.load(f)
        assert "quiet1" in meta.get("appends", [])
        assert not meta.get("pending")
        # replay is a committed-tag no-op
        assert ivf_append(spark, d, empty, batch_tag="quiet1") == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compact_scrubs_pending_tag_so_retry_cannot_duplicate(spark):
    """The duplicate-rows hazard: a crashed append's uncommitted delta
    files must NOT be folded into the base by compaction — the tag's
    retry would then re-append the whole batch. Compact scrubs the
    pending tag's files first; the retry appends exactly once."""
    import glob as _glob
    import json

    from ck_spark.ops.ivf import (
        META_NAME, build_ivf_index, ivf_append, ivf_compact, ivf_topk,
    )
    from ck_spark.ops.similarity import cosine_topk

    d = tempfile.mkdtemp(prefix="ck_ivf_pend_")
    try:
        base = _synth_emb(spark, 200, 0, seed=1)
        build_ivf_index(spark, base, d, k_lists=4, sample_size=256,
                        iters=8, seed=7)
        extra = _synth_emb(spark, 80, 2000, seed=3)
        # simulate the crash window: run a real append, then roll the meta
        # back to pending (files in, tag not committed) — exactly the
        # state after a crash between the renames and the commit
        ivf_append(spark, d, extra, batch_tag="t1")
        with open(os.path.join(d, META_NAME)) as f:
            meta = json.load(f)
        meta["appends"].remove("t1")
        meta["pending"] = ["t1"]
        with open(os.path.join(d, META_NAME), "w") as f:
            json.dump(meta, f)
        assert _glob.glob(os.path.join(d, "lists", "centroid_id=*",
                                       "delta-t1-*"))
        ivf_compact(spark, d)  # must scrub t1's uncommitted rows
        n = ivf_append(spark, d, extra, batch_tag="t1")  # the retry
        assert n == 80
        q = _query_vec()
        exact = [(r["vec_id"], round(r["cosine"], 9)) for r in
                 cosine_topk(base.unionByName(extra), q, k=15).collect()]
        got = [(r["vec_id"], round(r["cosine"], 9)) for r in
               ivf_topk(spark, d, q, k=15, nprobe=4).collect()]
        assert got == exact  # no duplicates, nothing lost
    finally:
        shutil.rmtree(d, ignore_errors=True)
