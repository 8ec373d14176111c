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


def corpus_as_whole_file_chunks(corpus: DataFrame) -> DataFrame:
    """One whole-file chunk per doc: the degenerate chunk the reference's
    lexical path uses for whole-file units (span = bytes 0..len, lines
    1..line_count — ck-engine/src/lib.rs:794-811). Gives doc-granular
    embeddings (one vector per file) the same enrichment surface as real
    chunk tables from functions/chunker.chunk_corpus."""
    from ck_spark.query.results import rust_lines

    lines = rust_lines(F.col("content"))
    return corpus.select(
        "repo", "path", "lang",
        F.lit(0).cast("int").alias("chunk_id"),
        F.lit(0).cast("long").alias("byte_start"),
        F.octet_length("content").cast("long").alias("byte_end"),
        F.lit(1).cast("int").alias("line_start"),
        F.size(lines).alias("line_end"),
        F.col("content").alias("text"),
    )


# driver-side collect cap for the literal-IN chunk prefilter; above it the
# plain broadcast join runs (the scan is result-bound anyway at that size)
_RESULT_KEYS_COLLECT_MAX = 20_000


def semantic_results(
    results: DataFrame,
    chunks: DataFrame,
    on: list[str],
    score_col: str = "cosine",
    full_section: bool = False,
) -> DataFrame:
    """ck `SearchResult`-shaped semantic output (semantic_v3.rs:152-216):
    span = the embedded unit's chunk span, preview = first 3 lines of the
    chunk text (whole chunk under --full-section), score = cosine.

    results: scored rows (top-k / threshold already applied upstream —
    semantic_search output). chunks: a chunk frame carrying
    (repo, path, lang, byte/line span, text) — functions/chunker.
    chunk_corpus for real chunk tables, corpus_as_whole_file_chunks for
    doc-granular vectors. on: the join key columns shared by both frames
    (e.g. ['doc_id', 'chunk_id'], or the vec_id mapping).

    Scale shape: the ≤k result keys collect driver-side and prefilter the
    chunk frame with a parsed literal IN (row-value IN for compound keys)
    BEFORE the broadcast join, so a materialized doc_id-sorted chunk
    table reads rows proportional to the results; above
    _RESULT_KEYS_COLLECT_MAX the prefilter is skipped."""
    keyed = results.select(*on, F.col(score_col).alias("score"))
    rows = keyed.limit(_RESULT_KEYS_COLLECT_MAX + 1).collect()
    if not rows:
        from ck_spark.plans.schemas import empty_df

        key_types = {f.name: f.dataType.simpleString()
                     for f in keyed.schema.fields}
        cols = ", ".join(
            [f"{c} {key_types[c]}" for c in on]
            + ["repo string", "path string", "score double",
               "preview string", "byte_start long", "byte_end long",
               "line_start int", "line_end int", "lang string"]
        )
        return empty_df(results.sparkSession, cols)
    side = chunks
    if len(rows) <= _RESULT_KEYS_COLLECT_MAX:
        def _lit(v):
            return f"'{v}'" if isinstance(v, str) else str(int(v))

        seen = sorted({tuple(r[c] for c in on) for r in rows})
        if len(on) == 1:
            pred = f"{on[0]} IN ({','.join(_lit(t[0]) for t in seen)})"
        else:
            tuples = ",".join(
                "(" + ",".join(_lit(v) for v in t) + ")" for t in seen
            )
            pred = f"({','.join(on)}) IN ({tuples})"
        side = chunks.where(pred)
    from ck_spark.query.results import preview_expr

    return (
        side.join(F.broadcast(keyed), on)
        .select(
            *on, "repo", "path", "score",
            preview_expr(F.col("text"), full_section).alias("preview"),
            "byte_start", "byte_end", "line_start", "line_end", "lang",
        )
        .orderBy(F.desc("score"), *[F.asc(c) for c in on])
    )


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
