"""Distributed BM25 top-k query over the segmented posting index.

Query lifecycle (the rebuild of ck's lexical_search,
/root/reference/ck-engine/src/lib.rs:729-845):

  query string → tokenize (same module as index build — rank identity by
  construction) → term_stats lookup (tiny pruned scan → driver) → idf per
  term → postings scan pruned to the query terms' hash buckets (parquet
  partition pruning on `bucket`, row-group predicate on `term`) →
  groupBy(seg).applyInPandas segment scorer (per-segment top-k heap;
  exhaustive-DAAT or block-max WAND) → global TakeOrderedAndProject
  (orderBy(score desc, doc_id).limit(k) — Catalyst's distributed partial
  top-k merge; the treeReduce analogue with zero custom code).

Shuffle profile per query: only the selected posting rows move (one row
per (term, segment)), never the corpus. At 10^12 docs the scan is bounded
by the query terms' posting mass, and each segment task is bounded by the
segment width chosen at build time.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ck_spark.constants import (
    LEXICAL_DEFAULT_TOPK,
    SEMANTIC_DEFAULT_THRESHOLD,
    SEMANTIC_DEFAULT_TOPK,
)
from ck_spark.index.builder import IndexPaths
from ck_spark.index.manifest import Manifest
from ck_spark.query import scorer as _scorer
from ck_spark.tokenizer import tokenize

_RESULT_SCHEMA = "doc_id long, score double"


@dataclass
class BM25Index:
    spark: SparkSession
    paths: IndexPaths
    meta: dict

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "BM25Index":
        meta = Manifest(root).load_meta()
        return cls(spark, IndexPaths(root), meta)

    # -- lookups --------------------------------------------------------------

    def term_stats(self, terms: list[str]) -> pd.DataFrame:
        df = (
            self.spark.read.parquet(self.paths.term_stats)
            .where(F.col("term").isin(terms))
            .toPandas()
        )
        return df

    def idfs(self, terms: list[str]) -> dict[str, float]:
        n = self.meta["n_docs"]
        ts = self.term_stats(terms)
        return {
            r.term: math.log(1.0 + (n - r.df + 0.5) / (r.df + 0.5))
            for r in ts.itertuples()
        }

    # -- search ---------------------------------------------------------------

    def search(
        self,
        query: str,
        k: int = LEXICAL_DEFAULT_TOPK,
        mode: str = "or",
        strategy: str = "auto",
        normalize: bool = False,
        threshold: float | None = None,
        with_paths: bool = False,
        include_prefixes: list[str] | None = None,
        exclude_globs: list[str] | None = None,
    ) -> DataFrame:
        """Top-k BM25. mode: 'or' (ck/tantivy default: bare terms are
        Should-clauses) or 'and' (conjunctive intersection, north-rule
        operator). normalize: divide by max score AFTER top-k (rank-
        preserving, mirrors ck-engine/src/lib.rs:820-843). threshold:
        drop rows below it (post-normalization if normalize=True).
        include_prefixes/exclude_globs: exact path scoping — allowed doc
        ids flow to the segment scorers via a seg-cogrouped doc_map read
        (F3/F4/F7), so scoped top-k is exact, not a post-filter."""
        terms = list(dict.fromkeys(tokenize(query, self.meta["tokenizer_mode"])))
        spark = self.spark
        empty = spark.createDataFrame([], _RESULT_SCHEMA)
        if not terms:
            return self._finish(empty, k, normalize, threshold, with_paths)

        ts = self.term_stats(terms)
        idfs = self.idfs(terms)
        if ts.empty or (mode == "and" and len(ts) < len(terms)):
            # conjunctive with any unknown term matches nothing
            return self._finish(empty, k, normalize, threshold, with_paths)
        found_terms = list(ts["term"])
        buckets = sorted(set(int(b) for b in ts["bucket"]))

        post = spark.read.parquet(self.paths.postings).where(
            F.col("bucket").isin(buckets) & F.col("term").isin(found_terms)
        )

        avgdl = float(self.meta["avgdl"])
        k1, b = float(self.meta["k1"]), float(self.meta["b"])
        q_mode, q_strategy, q_k = mode, strategy, int(k)

        def score_rows(pdf: pd.DataFrame, allowed) -> pd.DataFrame:
            rows = pdf.to_dict("records")
            if q_mode == "and":
                ids, scores = _scorer.score_and(rows, idfs, avgdl, k1, b, q_k, allowed)
            else:
                total = int(pdf["n_docs"].sum()) if len(pdf) else 0
                use_wand = q_strategy == "wand" or (
                    q_strategy == "auto" and total > 50_000 and q_k * 20 < total
                )
                fn = _scorer.score_wand_or if use_wand else _scorer.score_exhaustive_or
                ids, scores = fn(rows, idfs, avgdl, k1, b, q_k, allowed)
            return pd.DataFrame({"doc_id": ids, "score": scores})

        if include_prefixes or exclude_globs:
            import numpy as np

            from ck_spark.query.scope import path_scope_pred

            allowed_df = (
                spark.read.parquet(self.paths.doc_map)
                .where(path_scope_pred(F.col("path"), include_prefixes, exclude_globs))
                .select("seg", "doc_id")
            )

            def score_cogroup(pl: pd.DataFrame, pr: pd.DataFrame) -> pd.DataFrame:
                if len(pl) == 0:
                    return pd.DataFrame({"doc_id": [], "score": []})
                allowed = np.sort(pr["doc_id"].to_numpy().astype(np.int64))
                return score_rows(pl, allowed)

            seg_top = (
                post.groupBy("seg")
                .cogroup(allowed_df.groupBy("seg"))
                .applyInPandas(score_cogroup, _RESULT_SCHEMA)
            )
        else:
            seg_top = post.groupBy("seg").applyInPandas(
                lambda pdf: score_rows(pdf, None), _RESULT_SCHEMA
            )
        return self._finish(seg_top, k, normalize, threshold, with_paths)

    def search_with_near_miss(
        self, query: str, k: int = SEMANTIC_DEFAULT_TOPK,
        threshold: float = SEMANTIC_DEFAULT_THRESHOLD,
        normalize: bool = True, **kw,
    ) -> tuple[DataFrame, DataFrame]:
        """Thresholded search plus the single best below-threshold result
        (ck's near-miss UX, ck-engine/src/semantic_v3.rs:149,218-222 /
        SURVEY §2.2 F6). Returns (results, near_miss<=1 row)."""
        full = self.search(query, k=k, normalize=normalize, threshold=None, **kw)
        results = full.where(F.col("score") >= F.lit(threshold))
        near = (
            full.where(F.col("score") < F.lit(threshold))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(1)
        )
        return results, near

    def _finish(self, df: DataFrame, k: int, normalize: bool,
                threshold: float | None, with_paths: bool) -> DataFrame:
        # TakeOrderedAndProject: distributed partial top-k + driver merge.
        out = df.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        if normalize:
            # max-normalize AFTER top-k, as the reference does (rank-
            # preserving, ck-engine/src/lib.rs:820-843): scores -> (0, 1].
            out = out.withColumn(
                "score", F.col("score") / F.max("score").over(Window.partitionBy())
            )
        if threshold is not None:
            out = out.where(F.col("score") >= F.lit(threshold))
        if with_paths:
            dm = self.spark.read.parquet(self.paths.doc_map).select(
                "doc_id", "repo", "path", "lang"
            )
            # broadcast the ≤k results; doc_map stays a shuffle-free
            # columnar scan on the stream side.
            out = dm.join(F.broadcast(out), "doc_id").orderBy(
                F.desc("score"), F.asc("doc_id")
            )
        return out
