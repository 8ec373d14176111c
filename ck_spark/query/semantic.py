"""Semantic (embedding) search mode and ck-style hybrid fusion.

The rebuild of ck's semantic_search_v3 (/root/reference/ck-engine/src/
semantic_v3.rs:17-297): brute-force cosine over every embedded unit,
sort desc, threshold with near-miss tracking, top-k (defaults top_k=10,
threshold=0.6 — ck-cli/src/main.rs:1687-1695). The reference brute-forces
too (SimpleIndex, ck-ann/src/lib.rs:21-146); the scale path here is the
LSH-bucketed variant in ops/similarity.py.

Hybrid = regex/lexical list + semantic list fused with RRF k=60 on a
shared key (ck merges on file:line_start, ck-engine/src/lib.rs:1006-1034;
at doc granularity the key is doc_id).

Embeddings live in their own table (vec_id aligned with doc_id) — a
partially-embedded corpus (some docs lack vectors) behaves exactly like
ck before indexing completes: unembedded docs simply can't match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ck_spark.constants import SEMANTIC_DEFAULT_THRESHOLD, SEMANTIC_DEFAULT_TOPK
from ck_spark.ops.similarity import cosine_scores
from ck_spark.query.hybrid import add_rank, rrf_fuse


def semantic_search(
    emb: DataFrame,
    query_vec: list[float],
    k: int = SEMANTIC_DEFAULT_TOPK,
    threshold: float | None = SEMANTIC_DEFAULT_THRESHOLD,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k with ck's threshold semantics."""
    scored = cosine_scores(emb, query_vec, id_col, emb_col)
    out = scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
    if threshold is not None:
        out = out.where(F.col("cosine") >= F.lit(threshold))
    return out


def semantic_search_with_near_miss(
    emb: DataFrame,
    query_vec: list[float],
    k: int = SEMANTIC_DEFAULT_TOPK,
    threshold: float = SEMANTIC_DEFAULT_THRESHOLD,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(results, best single below-threshold row) — semantic near-miss UX
    (ck-engine/src/semantic_v3.rs:149,218-222)."""
    scored = cosine_scores(emb, query_vec, id_col, emb_col)
    top = scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
    res = top.where(F.col("cosine") >= F.lit(threshold))
    near = (
        top.where(F.col("cosine") < F.lit(threshold))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(1)
    )
    return res, near


def hybrid_lexical_semantic(
    lexical: DataFrame,
    semantic: DataFrame,
    k: int = SEMANTIC_DEFAULT_TOPK,
    lexical_key: str = "doc_id",
    semantic_key: str = "vec_id",
    list_limit: int = 1000,
) -> DataFrame:
    """ck's hybrid mode at doc granularity: rank both lists, RRF k=60.
    lexical must carry (doc_id, score); semantic (vec_id, cosine).
    list_limit bounds each rank list (inputs are top-k lists already;
    the cap makes rank assignment shuffle-safe at any scale)."""
    lex_r = add_rank(
        lexical.select(F.col(lexical_key).alias("doc_id"), "score"),
        [F.desc("score"), F.asc("doc_id")], list_limit,
    )
    sem_r = add_rank(
        semantic.select(F.col(semantic_key).alias("doc_id"), "cosine"),
        [F.desc("cosine"), F.asc("doc_id")], list_limit,
    )
    return rrf_fuse([lex_r, sem_r], ["doc_id"], k=k)
