"""IVF (inverted-file) ANN index: k-means coarse quantizer + centroid-
partitioned lists — the FAISS IVF-Flat design re-expressed as Spark tables.
Complements ops/similarity.py's LSH path (the brief asks for "an IVF or
LSH-bucketed variant as the scale path"; this repo now ships both).

Design, audited for 100 TB:

- **train** — deterministic spherical Lloyd k-means in numpy over a
  BOUNDED driver-side sample (FAISS trains its coarse quantizer on a
  sample too). The sample is `orderBy(xxhash64(vec_id), vec_id).limit(n)`
  — a TakeOrdered: pseudo-random (hash order decorrelates from insertion
  order), partitioning-independent, and O(sample) driver memory no matter
  the corpus size.
- **assign** — ONE distributed map pass; the centroid matrix ships in the
  Arrow-UDF closure (k×dim floats — kilobytes) and each batch is a single
  numpy matmul + argmax. No shuffle besides the partitionBy write's one
  exchange on centroid_id.
- **store** — parquet partitioned by `centroid_id`, rows carry a
  precomputed norm. Probing nprobe lists = parquet PARTITION PRUNING: a
  query touches nprobe/k of the data regardless of corpus size.
- **query** — query→centroid scores are k×dim driver-side flops; the scan
  reads only the probed partitions; exact cosine within them.

Exactness contract (mirrors query/trigram.py's grep contract): with
nprobe >= k_lists the probed set is every list, so the result is
EXACTLY brute-force top-k — the driver verifies that against the plain
SQL oracle (ann_ivf_topk), proving the index path (assignment, stored
norms, partition math, probe ordering) is lossless. Approximation only
enters through nprobe < k_lists, whose recall is pinned by tests.

No reference analogue: szavadsky/ck's ANN is brute-force cosine
(ck-ann/src/lib.rs:37-48); IVF is the public FAISS/SPANN-family design
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI 2011 — the IVF part, without PQ compression).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

META_NAME = "ivf_meta.json"


def _unit_rows(X: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(X, axis=1, keepdims=True)
    return X / np.where(n == 0.0, 1.0, n)


def kmeans_train(
    X: np.ndarray, k: int, iters: int = 15, seed: int = 0
) -> np.ndarray:
    """Deterministic spherical k-means: rows are L2-normalized, assignment
    is argmax dot (== min angular distance), centroids are re-normalized
    means. Empty clusters are reseeded to the point FARTHEST from its own
    centroid (deterministic, lowest index on ties). Returns (k, dim)
    float64 unit centroids."""
    X = _unit_rows(np.asarray(X, dtype=np.float64))
    n = X.shape[0]
    k = min(k, n)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        sims = X @ cent.T                       # (n, k)
        lab = np.argmax(sims, axis=1)
        best = sims[np.arange(n), lab]
        new = np.zeros_like(cent)
        counts = np.bincount(lab, minlength=k).astype(np.float64)
        np.add.at(new, lab, X)
        for c in np.flatnonzero(counts == 0):
            j = int(np.argmin(best))            # farthest-from-home point
            new[c] = X[j]
            counts[c] = 1.0
            best[j] = np.inf                    # don't reuse it twice
        cent = _unit_rows(new / counts[:, None])
    return cent


def _sample_driver_side(
    emb: DataFrame, sample_size: int, id_col: str, emb_col: str
) -> np.ndarray:
    rows = (
        emb.select(F.col(emb_col).alias("e"),
                   F.xxhash64(F.col(id_col)).alias("h"),
                   F.col(id_col).alias("i"))
        .orderBy("h", "i")
        .limit(sample_size)
        .collect()
    )
    return np.array([r["e"] for r in rows], dtype=np.float64)


def build_ivf_index(
    spark: SparkSession,
    emb: DataFrame,
    out_dir: str,
    k_lists: int = 16,
    sample_size: int = 16384,
    iters: int = 15,
    seed: int = 0,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    """Train on a bounded sample, assign the full table in one map pass,
    write partitioned by centroid_id. The meta json (centroids included —
    k×dim floats) is written LAST and gates reuse: a crashed build leaves
    no meta, so loads refuse and callers rebuild."""
    X = _sample_driver_side(emb, sample_size, id_col, emb_col)
    if X.shape[0] == 0:
        raise ValueError("cannot build an IVF index over an empty table")
    cent = kmeans_train(X, k_lists, iters=iters, seed=seed)
    k_eff, dim = cent.shape
    bucketed = _assigned_df(spark, emb, cent, id_col, emb_col)
    # salted repartition: k-means lists are skewed, and a plain
    # repartition("centroid_id") would hand each hot list to ONE task (a
    # straggler at 100 TB). Salting by hash(vec_id)%files_per_list splits
    # every list across a bounded number of tasks/files — bounded task
    # size AND bounded file count (no file-per-input-split explosion).
    files_per_list = max(1, spark.sparkContext.defaultParallelism // max(k_eff, 1))
    salt = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(files_per_list))
    (
        bucketed.repartition(k_eff * files_per_list, F.col("centroid_id"), salt)
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(os.path.join(out_dir, "lists"))
    )
    tmp = os.path.join(out_dir, META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"k_lists": int(k_eff), "dim": int(dim), "seed": int(seed),
             "iters": int(iters), "centroids": cent.tolist()},
            f,
        )
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(out_dir, META_NAME))
    return out_dir


def _assigned_df(
    spark: SparkSession, emb: DataFrame, cent: np.ndarray,
    id_col: str, emb_col: str,
) -> DataFrame:
    """(vec_id, embedding, nrm, centroid_id) for a batch, assigned against
    a FROZEN centroid matrix (ships in the Arrow-UDF closure; one numpy
    matmul per batch). nrm rides the SAME batch: the former separate
    JVM higher-order aggregate was evaluated interpreted per element;
    here it is one vectorized pass — computed as an explicit per-column
    left fold (acc += x_j^2 in column order), which is bit-identical to
    Spark's sequential F.aggregate fold (numpy's own sum() is pairwise
    and would round differently, breaking the stored-nrm oracle parity)."""
    from pyspark.sql.pandas.functions import pandas_udf

    cent_f = cent.astype(np.float64)

    @pandas_udf("struct<centroid_id: int, nrm: double>")
    def _assign(batch: pd.Series) -> pd.DataFrame:
        M = np.array([np.asarray(v, dtype=np.float64) for v in batch])
        if M.size == 0:
            return pd.DataFrame({"centroid_id": pd.Series([], dtype="int32"),
                                 "nrm": pd.Series([], dtype="float64")})
        lab = np.argmax(_unit_rows(M) @ cent_f.T, axis=1)
        acc = np.zeros(M.shape[0], dtype=np.float64)
        for j in range(M.shape[1]):          # exact left fold per row
            acc += M[:, j] * M[:, j]
        return pd.DataFrame({"centroid_id": lab.astype(np.int32),
                             "nrm": np.sqrt(acc)})

    a = _assign(F.col(emb_col))
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).alias("embedding"),
        a["nrm"].alias("nrm"),
        a["centroid_id"].alias("centroid_id"),
    )


def ivf_append(
    spark: SparkSession,
    index_dir: str,
    new_emb: DataFrame,
    batch_tag: str,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> int:
    """Incremental add WITHOUT retraining: assign the new vectors against
    the FROZEN centroids and slot their rows into the same
    centroid-partitioned layout — the standard IVF add path (FAISS `add`
    does not move centroids either). Queries need no special handling;
    probed partitions simply gain files.

    Exactly-once per `batch_tag`: the batch stages to a scratch dir, its
    files rename (atomically, per file) into the list partitions under
    names prefixed `delta-<batch_tag>-`, and the tag commits into the meta
    json LAST. The tag is recorded as `pending` BEFORE any rename becomes
    visible: a retry of a committed tag is a no-op; a retry of a crashed
    (uncommitted) tag first removes that tag's partial files; and
    ivf_compact scrubs a pending tag's files instead of folding them into
    the base (where a later retry would re-append the full batch and
    duplicate the partial rows). Within the crash window the partial rows
    are visible to queries (at-least-once reads, exactly-once after the
    retry/scrub). Caller contract: vec_ids are new to the index
    (replacement needs a version column — run exact dedup upstream), and
    mutators are single-writer (same as compact).

    Returns the number of rows appended (0 for a committed-tag replay)."""
    import glob
    import shutil
    import tempfile

    import re

    # [A-Za-z0-9_]+ ONLY: '-' delimits the tag in delta file names (a
    # dashed tag would make another tag's scrub glob match its files) and
    # glob metachars would break the crash-scrub match below
    if not re.fullmatch(r"\w+", batch_tag, re.ASCII):
        raise ValueError(
            "batch_tag must be a non-empty [A-Za-z0-9_]+ token "
            f"(got {batch_tag!r})"
        )
    _heal_lists(index_dir)
    meta_path = os.path.join(index_dir, META_NAME)
    with open(meta_path) as f:
        meta = json.load(f)
    if batch_tag in meta.get("appends", []):
        return 0
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    lists_dir = os.path.join(index_dir, "lists")
    # scrub partial files from a crashed earlier attempt of this tag
    for stale in glob.glob(
        os.path.join(lists_dir, "centroid_id=*", f"delta-{batch_tag}-*")
    ):
        os.remove(stale)

    def _write_meta() -> None:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, meta_path)

    # pending marker FIRST: if we crash between the renames below and the
    # commit, compact knows these delta files are uncommitted and scrubs
    # them rather than folding them into base. A LIST, not a slot — two
    # successive crashed appends with different tags must both stay
    # scrubbable or the first one's partial rows get folded and its retry
    # duplicates them
    pend = meta.setdefault("pending", [])
    if isinstance(pend, str):  # pre-list marker from an older crash
        pend = meta["pending"] = [pend]
    if batch_tag not in pend:
        pend.append(batch_tag)
    _write_meta()

    # stage INSIDE index_dir (same filesystem ⇒ os.rename is atomic; an
    # across-device staging dir would make the per-file renames copies)
    staging = tempfile.mkdtemp(prefix=f".staging-{batch_tag}-", dir=index_dir)
    try:
        assigned = _assigned_df(spark, new_emb, cent, id_col, emb_col)
        n_eff = cent.shape[0]
        files_per_list = max(
            1, spark.sparkContext.defaultParallelism // max(n_eff, 1)
        )
        salt = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(files_per_list))
        (
            assigned.repartition(n_eff * files_per_list,
                                 F.col("centroid_id"), salt)
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(staging)
        )
        # count from the staged batch (bounded), never by re-scanning
        # lists. An EMPTY batch writes no partition dirs (and no parquet
        # footers — reading the bare staging dir would die on schema
        # inference): commit the tag as a 0-row append instead of
        # poisoning every retry
        part_dirs = sorted(glob.glob(os.path.join(staging, "centroid_id=*")))
        n_rows = spark.read.parquet(staging).count() if part_dirs else 0
        for part_dir in part_dirs:
            dest_dir = os.path.join(lists_dir, os.path.basename(part_dir))
            os.makedirs(dest_dir, exist_ok=True)
            for src in sorted(glob.glob(os.path.join(part_dir, "*.parquet"))):
                os.rename(
                    src,
                    os.path.join(dest_dir,
                                 f"delta-{batch_tag}-{os.path.basename(src)}"),
                )
        meta.setdefault("appends", []).append(batch_tag)
        if batch_tag in meta.get("pending", []):
            meta["pending"].remove(batch_tag)
        _write_meta()
        return n_rows
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _heal_lists(index_dir: str) -> None:
    """WRITER-ONLY: roll a crashed compact swap forward/back so the next
    mutation starts from a complete lists dir. States (lists /
    lists.staging / lists.old):
      - lists only ................. normal
      - lists + staging ............ crashed before the swap: staging is a
                                     duplicate rewrite — discard it
      - staging + old, no lists .... crashed mid-swap: finish it
      - old only, no lists ......... crashed between the two swap renames
                                     with staging already moved: restore
      - lists + old ................ crashed after swap: drop the aside
    The append ledger in the meta is a commit ledger, not a file
    inventory, so it stays valid across every one of these.

    Readers must NOT call this: a query healing concurrently with a live
    compactor would rmtree the compactor's just-finished staging between
    its two renames (single-writer discipline covers writers; reads use
    the non-mutating _lists_read_dir)."""
    import shutil

    lists_d = os.path.join(index_dir, "lists")
    staging = os.path.join(index_dir, "lists.staging")
    old = os.path.join(index_dir, "lists.old")
    if not os.path.exists(lists_d) and os.path.exists(staging):
        os.rename(staging, lists_d)
    if not os.path.exists(lists_d) and os.path.exists(old):
        os.rename(old, lists_d)
    if os.path.exists(lists_d):
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)


def _lists_read_dir(index_dir: str) -> str:
    """Non-mutating read-path resolution: the live lists dir, or the
    swap-aside copy when a crashed (or in-flight) compact hides `lists`
    for the instant between its two renames. Equivalent data either way —
    compaction only re-buckets files."""
    lists_d = os.path.join(index_dir, "lists")
    if os.path.exists(lists_d):
        return lists_d
    old = os.path.join(index_dir, "lists.old")
    if os.path.exists(old):
        return old
    staging = os.path.join(index_dir, "lists.staging")
    if os.path.exists(staging):
        return staging
    return lists_d  # let the read fail with the true path in the error


def ivf_compact(spark: SparkSession, index_dir: str) -> dict:
    """Rewrite base + accumulated delta files into a fresh salted layout
    and swap it in atomically (rename-aside, same protocol as the index's
    SegmentStore): many-small-delta-files → files_per_list files per
    centroid. The append ledger is KEPT (it records which batch tags are
    committed — replaying an old tag after compaction must stay a no-op
    even though its delta files are gone). Returns file counts."""
    import glob
    import shutil

    _heal_lists(index_dir)
    cent = load_centroids(index_dir)  # also validates completeness
    k_eff = cent.shape[0]
    lists_d = os.path.join(index_dir, "lists")
    # a crashed append's UNCOMMITTED delta files must not fold into the
    # base: the tag's retry would then re-append the whole batch and
    # duplicate the partial rows. Scrub them (the retry re-appends all)
    meta_path = os.path.join(index_dir, META_NAME)
    with open(meta_path) as f:
        _meta = json.load(f)
    pending = _meta.pop("pending", None) or []
    if isinstance(pending, str):
        pending = [pending]
    scrubbed = [t for t in pending if t not in _meta.get("appends", [])]
    if scrubbed or pending:
        for tag in scrubbed:
            for stale in glob.glob(
                os.path.join(lists_d, "centroid_id=*", f"delta-{tag}-*")
            ):
                os.remove(stale)
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(_meta, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, meta_path)
    staging = os.path.join(index_dir, "lists.staging")
    old = os.path.join(index_dir, "lists.old")
    shutil.rmtree(staging, ignore_errors=True)

    files_before = len(glob.glob(os.path.join(lists_d, "centroid_id=*", "*.parquet")))
    files_per_list = max(1, spark.sparkContext.defaultParallelism // max(k_eff, 1))
    salt = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(files_per_list))
    (
        spark.read.parquet(lists_d)
        # materializes fully BEFORE any rename (a lazy plan reading a
        # swapped-away dir would die FILE_NOT_EXIST)
        .repartition(k_eff * files_per_list, F.col("centroid_id"), salt)
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(staging)
    )
    os.rename(lists_d, old)
    os.rename(staging, lists_d)
    shutil.rmtree(old, ignore_errors=True)
    files_after = len(glob.glob(os.path.join(lists_d, "centroid_id=*", "*.parquet")))
    return {"files_before": files_before, "files_after": files_after}


def ivf_index_exists(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, META_NAME))


def load_centroids(index_dir: str) -> np.ndarray:
    if not ivf_index_exists(index_dir):
        raise FileNotFoundError(
            f"no complete IVF index at {index_dir} ({META_NAME} missing — "
            "crashed build? rebuild with build_ivf_index)"
        )
    with open(os.path.join(index_dir, META_NAME)) as f:
        meta = json.load(f)
    return np.asarray(meta["centroids"], dtype=np.float64)


def probe_lists(centroids: np.ndarray, query_vec, nprobe: int) -> list[int]:
    """The nprobe centroid ids nearest (by cosine) to the query,
    best-first; ties break to the lower id."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    sims = centroids @ (q / (qn if qn else 1.0))
    order = np.lexsort((np.arange(len(sims)), -sims))
    return [int(i) for i in order[: max(1, nprobe)]]


def ivf_topk(
    spark: SparkSession,
    index_dir: str,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k over the materialized IVF index: scan ONLY the
    probed centroid partitions (PartitionFilters in the plan), exact
    cosine within them. nprobe >= k_lists ⇒ exact brute-force answer."""
    cent = load_centroids(index_dir)
    probes = probe_lists(cent, query_vec, nprobe)
    qv = [float(x) for x in query_vec]
    qn = math.sqrt(sum(x * x for x in qv)) or 1.0
    arr = F.array(*[F.lit(x) for x in qv])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), arr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    df = spark.read.parquet(_lists_read_dir(index_dir)).where(
        F.col("centroid_id").isin(probes)
    )
    return (
        df.select("vec_id", (dot / (F.col("nrm") * F.lit(qn))).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
