"""Distributed inverted-index build.

Pipeline (each stage checkpointed in the manifest; resume skips complete
stages for the same input snapshot):

  corpus (repo, path, commit, lang, content)
    │  one tokenize pass (Arrow pandas UDF emits map<term,tf> per doc —
    │  tf aggregation is executor-local, so the big shuffle carries one
    │  row per distinct (term, doc) instead of per token occurrence)
    ├─ doc_map       doc_id, seg, sha256(content), doc_len, is_binary …
    ├─ corpus_stats  N, avgdl (over indexed = non-binary docs)
    ├─ pairs         (bucket, term, seg, doc_id, tf, dl)   ← NO shuffle:
    │                 written partitioned by term-hash bucket
    └─ postings      per bucket-group: shuffle by (term, seg) →
                     applyInPandas block-encode → parquet group=g/bucket=b
       term_stats    df per term (sum over segments)

Skew design (BASELINE.json north_rule): doc-hash segmentation IS the
salted repartition — seg = pmod(xxhash64(doc_id), S) splits every posting
list into ≤S bounded segments, so a groupBy key (term, seg) for an
ubiquitous term ('def', 'return') is capped at ~N/S docs. Rare terms
produce only as many segment rows as they have docs, so there is no
small-term overhead. Query-time intersection stays aligned because every
term uses the same modulus.

Reference parity: this stage replaces ck's tantivy index build
(/root/reference/ck-engine/src/lib.rs:847-890, one doc per file) and its
manifest-gated incremental update (ck-index/src/lib.rs:841-906).
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ck_spark.codec import encode_posting_blocks
from ck_spark.constants import (
    BLOCK_SIZE,
    BM25_B,
    BM25_K1,
    DEFAULT_DOCS_PER_SEGMENT,
    DEFAULT_TERM_BUCKETS,
)
from ck_spark.index.manifest import Manifest
from ck_spark.tokenizer import term_freqs_udf

DOC_ID_MASK = (1 << 62) - 1  # keep xxhash64-derived doc ids non-negative

POSTINGS_SCHEMA = (
    "term string, seg int, n_docs int, "
    "ids_blocks array<binary>, tfs_blocks array<binary>, dls_blocks array<binary>, "
    "block_max array<float>, block_last array<long>"
)


@dataclass
class IndexPaths:
    root: str

    @property
    def doc_map(self) -> str:
        return os.path.join(self.root, "doc_map")

    @property
    def corpus_stats(self) -> str:
        return os.path.join(self.root, "corpus_stats")

    @property
    def pairs(self) -> str:
        return os.path.join(self.root, "pairs")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def term_stats(self) -> str:
        return os.path.join(self.root, "term_stats")


def doc_id_expr():
    """Deterministic, parallelism-independent doc id.

    xxhash64(repo, path, commit) masked non-negative. Collisions are
    detected (count vs countDistinct) and abort the build; at 10^12 docs a
    production deployment would fall back to a salted rehash of colliding
    keys — the detection hook is where that plugs in.
    """
    return F.xxhash64("repo", "path", "commit").bitwiseAND(F.lit(DOC_ID_MASK))


def _with_doc_columns(corpus: DataFrame, mode: str, n_segments: int) -> DataFrame:
    tf_udf = term_freqs_udf(mode)
    return (
        corpus.withColumn("doc_id", doc_id_expr())
        .withColumn("seg", F.pmod(F.xxhash64("doc_id"), F.lit(n_segments)).cast("int"))
        .withColumn("is_binary", F.contains("content", F.lit("\x00")))
        .withColumn("content_sha256", F.sha2("content", 256))
        .withColumn("tfm", tf_udf("content"))
        .withColumn(
            "doc_len",
            F.coalesce(
                F.aggregate(F.map_values("tfm"), F.lit(0), lambda a, x: a + x), F.lit(0)
            ),
        )
    )


def _doc_map_summary(spark: SparkSession, doc_map_path: str) -> tuple[int, int, str]:
    """One aggregation job: row count, distinct doc ids (collision check)
    and an order-independent corpus fingerprint (the analogue of ck's
    manifest hash gate, O(1) state per executor)."""
    row = (
        spark.read.parquet(doc_map_path)
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("doc_id").alias("nd"),
            F.bit_xor(F.xxhash64("repo", "path", "commit", "content_sha256")).alias("h"),
        )
        .collect()[0]
    )
    return int(row["n"]), int(row["nd"]), f"n{row['n']}-h{row['h']}"


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    mode: str = "code",
    n_segments: int | None = None,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    build_groups: int = 4,
    resume: bool = True,
    keep_pairs: bool = True,
    k1: float = BM25_K1,
    b: float = BM25_B,
    block_size: int = BLOCK_SIZE,
) -> IndexPaths:
    """Build (or resume building) the inverted index under out_dir."""
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    man = Manifest(out_dir)

    # ---- stage: doc_map ----------------------------------------------------
    # n_segments must be fixed before doc_map exists; derive from a cheap
    # count if not given.
    if n_segments is None:
        n_docs_est = corpus.count()
        n_segments = max(1, int(np.ceil(n_docs_est / DEFAULT_DOCS_PER_SEGMENT)))

    # Resume gate for doc_map: no fingerprint exists yet, so gate on an
    # argument snapshot token recorded at first build. If a complete
    # doc_map stage exists we trust and reuse it, then verify the
    # fingerprint drives the later stages.
    t0 = time.time()
    fresh_doc_map = not (resume and man.is_complete("doc_map", 0, "input"))
    if fresh_doc_map:
        docs = _with_doc_columns(corpus, mode, n_segments)
        (
            docs.select(
                "doc_id", "seg", "repo", "path", "commit", "lang",
                "content_sha256", "doc_len", "is_binary",
            )
            .write.mode("overwrite")
            .parquet(paths.doc_map)
        )
    n, nd, snapshot = _doc_map_summary(spark, paths.doc_map)
    if n != nd:
        raise RuntimeError(
            f"doc_id collision: {n} rows but {nd} distinct ids — "
            "rehash with a salt or widen the id space"
        )
    if fresh_doc_map:
        man.complete("doc_map", 0, "input", n, 0, int((time.time() - t0) * 1000),
                     lineage="corpus->doc_map")

    # ---- stage: corpus_stats ----------------------------------------------
    t0 = time.time()
    if not (resume and man.is_complete("corpus_stats", 0, snapshot)):
        dm = spark.read.parquet(paths.doc_map)
        stats = dm.where(~F.col("is_binary")).agg(
            F.count("*").alias("n_docs"),
            F.avg("doc_len").alias("avgdl"),
            F.sum("doc_len").alias("total_tokens"),
        )
        stats.coalesce(1).write.mode("overwrite").parquet(paths.corpus_stats)
        man.complete("corpus_stats", 0, snapshot, 1, 0,
                     int((time.time() - t0) * 1000), lineage="doc_map->corpus_stats")

    srow = spark.read.parquet(paths.corpus_stats).collect()[0]
    avgdl = float(srow["avgdl"] or 0.0)

    # ---- stage: pairs (shuffle-free exploded index, bucket-partitioned) ----
    t0 = time.time()
    if not (resume and man.is_complete("pairs", 0, snapshot)):
        docs = _with_doc_columns(corpus, mode, n_segments).where(~F.col("is_binary"))
        pairs = (
            docs.select(
                "doc_id", "seg", F.col("doc_len").alias("dl"),
                F.explode("tfm").alias("term", "tf"),
            )
            .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int"))
        )
        # observe(): metrics piggyback on the write job (SURVEY §2.4 A6 —
        # the UpdateStats analogue) instead of a read-back count job.
        obs = Observation("pairs")
        pairs.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(paths.pairs)
        man.complete("pairs", 0, snapshot, int(obs.get["rows"]), 0,
                     int((time.time() - t0) * 1000), lineage="corpus->pairs")

    # ---- stage: postings, per bucket-group (resumable unit) ---------------
    groups = [
        [bkt for bkt in range(term_buckets) if bkt % build_groups == g]
        for g in range(build_groups)
    ]
    enc_schema = POSTINGS_SCHEMA + ", bucket int"

    def make_encoder(avgdl_: float, k1_: float, b_: float, block_: int):
        def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
            order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
            ids = pdf["doc_id"].to_numpy()[order]
            tfs = pdf["tf"].to_numpy()[order]
            dls = pdf["dl"].to_numpy()[order]
            blocks = encode_posting_blocks(ids, tfs, dls, avgdl_, k1_, b_, block_)
            return pd.DataFrame(
                {
                    "term": [pdf["term"].iloc[0]],
                    "seg": [int(pdf["seg"].iloc[0])],
                    "n_docs": [int(ids.size)],
                    "ids_blocks": [blocks["ids_blocks"]],
                    "tfs_blocks": [blocks["tfs_blocks"]],
                    "dls_blocks": [blocks["dls_blocks"]],
                    "block_max": [blocks["block_max"]],
                    "block_last": [blocks["block_last"]],
                    "bucket": [int(pdf["bucket"].iloc[0])],
                }
            )

        return encode_group

    encoder = make_encoder(avgdl, k1, b, block_size)
    for g, buckets in enumerate(groups):
        if resume and man.is_complete("postings", g, snapshot):
            continue
        t0 = time.time()
        group_dir = os.path.join(paths.postings, f"group={g}")
        # a killed run may have left partial files: rebuild the whole group
        if os.path.exists(group_dir):
            shutil.rmtree(group_dir)
        pairs = spark.read.parquet(paths.pairs).where(F.col("bucket").isin(buckets))
        enc = pairs.groupBy("bucket", "term", "seg").applyInPandas(encoder, enc_schema)
        obs = Observation(f"postings-{g}")
        enc.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.approx_count_distinct("term").alias("terms"),
        ).write.mode("overwrite").partitionBy("bucket").parquet(group_dir)
        man.complete(
            "postings", g, snapshot, int(obs.get["rows"]), int(obs.get["terms"]),
            int((time.time() - t0) * 1000),
            lineage=f"pairs[buckets={buckets}]->postings/group={g}",
        )

    # ---- stage: term_stats --------------------------------------------------
    t0 = time.time()
    if not (resume and man.is_complete("term_stats", 0, snapshot)):
        post = spark.read.option("basePath", paths.postings).parquet(
            os.path.join(paths.postings, "group=*")
        )
        ts = post.groupBy("bucket", "term").agg(
            F.sum("n_docs").alias("df"), F.count("*").alias("n_segments")
        )
        obs = Observation("term_stats")
        ts.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).parquet(paths.term_stats)
        nterms = int(obs.get["rows"])
        man.complete("term_stats", 0, snapshot, nterms, nterms,
                     int((time.time() - t0) * 1000), lineage="postings->term_stats")

    man.save_meta(
        {
            "version": 1,
            "tokenizer_mode": mode,
            "n_segments": n_segments,
            "term_buckets": term_buckets,
            "build_groups": build_groups,
            "k1": k1,
            "b": b,
            "block_size": block_size,
            "avgdl": avgdl,
            "n_docs": int(srow["n_docs"]),
            "input_snapshot": snapshot,
        }
    )
    if not keep_pairs and os.path.exists(paths.pairs):
        shutil.rmtree(paths.pairs)
    return paths
