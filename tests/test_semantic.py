import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from ck_spark.query.semantic import (
    hybrid_lexical_semantic,
    semantic_search,
    semantic_search_with_near_miss,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(120, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    )
    return df, vecs


def _np_cosines(vecs, q):
    q = np.asarray(q, dtype=np.float64)
    v = vecs.astype(np.float64)
    return (v @ q) / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))


def test_semantic_defaults_and_threshold(spark, emb):
    df, vecs = emb
    q = vecs[11].tolist()  # its own vector -> cosine 1.0 at rank 1
    res = semantic_search(df, q).collect()  # ck defaults: k=10, thr=0.6
    assert res and res[0]["vec_id"] == 11 and abs(res[0]["cosine"] - 1.0) < 1e-9
    assert all(r["cosine"] >= 0.6 for r in res)
    sims = _np_cosines(vecs, q)
    expected = [i for i in np.argsort(-sims)[:10] if sims[i] >= 0.6]
    assert [r["vec_id"] for r in res] == expected


def test_semantic_near_miss(spark, emb):
    df, vecs = emb
    q = vecs[3].tolist()
    res, near = semantic_search_with_near_miss(df, q, k=10, threshold=0.6)
    n = near.collect()
    sims = _np_cosines(vecs, q)
    top10 = np.argsort(-sims)[:10]
    below = [i for i in top10 if sims[i] < 0.6]
    if below:
        assert len(n) == 1 and n[0]["vec_id"] == below[0]
    else:
        assert n == []


def test_hybrid_lexical_semantic_rrf(spark, emb):
    df, vecs = emb
    lex = spark.createDataFrame(
        [(5, 3.0), (11, 2.0), (40, 1.0)], ["doc_id", "score"]
    )
    q = vecs[11].tolist()
    sem = semantic_search(df, q, k=5, threshold=None)
    fused = hybrid_lexical_semantic(lex, sem, k=5).collect()
    # doc 11: rank 2 lexical + rank 1 semantic -> top fused
    assert fused[0]["doc_id"] == 11
    assert abs(fused[0]["rrf_score"] - (1 / 62 + 1 / 61)) < 1e-12


# ---------------------------------------------------------------------------
# semantic_results: ck SearchResult-shaped enrichment at chunk granularity
# (semantic_v3.rs:152-216 — span = chunk span, preview = first 3 chunk
# lines, score = cosine)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def chunked(spark):
    from ck_spark.functions.chunker import chunk_corpus

    body = "\n".join(f"line {i} of the file" for i in range(30))
    corpus = spark.createDataFrame(
        [("r", "a.py", "c", "python", body),
         ("r", "b.rs", "c", "rust", "only\nthree\nlines\nplus one more\n")],
        "repo string, path string, commit string, lang string, content string",
    )
    # small windows -> several chunks per doc
    chunks = chunk_corpus(corpus, max_tokens=100, overlap_lines=2)
    return corpus, chunks


def test_semantic_results_chunk_spans_and_preview(spark, chunked):
    from ck_spark.query.semantic import semantic_results

    corpus, chunks = chunked
    pdf = chunks.toPandas().sort_values(["path", "chunk_id"])
    assert (pdf.groupby("path").size() > 1).any(), "need multi-chunk docs"
    # fake scored results: two specific chunks of a.py, one of b.rs
    picks = [("a.py", 0, 0.9), ("a.py", 2, 0.8), ("b.rs", 0, 0.7)]
    vals = ",".join(f"('{p}', {c}, CAST({s} AS DOUBLE))" for p, c, s in picks)
    res = spark.sql(f"SELECT * FROM VALUES {vals} AS t(path, chunk_id, cosine)")
    out = semantic_results(res, chunks, on=["path", "chunk_id"]).collect()
    assert [(r["path"], r["chunk_id"], r["score"]) for r in out] == picks
    by_key = {(r["path"], r["chunk_id"]): r for r in out}
    for p, c, _ in picks:
        row = by_key[(p, c)]
        src = pdf[(pdf["path"] == p) & (pdf["chunk_id"] == c)].iloc[0]
        # span IS the chunk's span, not the file's
        assert row["byte_start"] == src["byte_start"]
        assert row["byte_end"] == src["byte_end"]
        assert row["line_start"] == src["line_start"]
        assert row["line_end"] == src["line_end"]
        # preview = first 3 lines of the CHUNK text
        want = "\n".join(str(src["text"]).split("\n")[:3])
        assert row["preview"] == want.rstrip("\n") or row["preview"] == want
    # ordered by score desc
    assert [r["score"] for r in out] == sorted(
        [r["score"] for r in out], reverse=True
    )


def test_semantic_results_full_section_and_empty(spark, chunked):
    from ck_spark.query.semantic import semantic_results

    corpus, chunks = chunked
    res = spark.sql(
        "SELECT * FROM VALUES ('b.rs', 0, CAST(0.5 AS DOUBLE)) "
        "AS t(path, chunk_id, cosine)"
    )
    out = semantic_results(res, chunks, on=["path", "chunk_id"],
                           full_section=True).collect()
    pdf = chunks.toPandas()
    src = pdf[(pdf["path"] == "b.rs") & (pdf["chunk_id"] == 0)].iloc[0]
    assert out[0]["preview"] == src["text"]
    none = semantic_results(res.where("cosine > 9"), chunks,
                            on=["path", "chunk_id"])
    assert none.count() == 0
    assert "preview" in none.columns and "byte_start" in none.columns


def test_whole_file_chunks_match_fetch_semantics(spark):
    from ck_spark.query.semantic import corpus_as_whole_file_chunks

    corpus = spark.createDataFrame(
        [("r", "t.py", "c", "python", "a\r\nb\nc"),
         ("r", "e.py", "c", "python", "")],
        "repo string, path string, commit string, lang string, content string",
    )
    rows = {r["path"]: r for r in corpus_as_whole_file_chunks(corpus).collect()}
    assert rows["t.py"]["byte_end"] == len("a\r\nb\nc".encode())
    assert rows["t.py"]["line_end"] == 3
    assert rows["e.py"]["byte_end"] == 0 and rows["e.py"]["line_end"] == 0
