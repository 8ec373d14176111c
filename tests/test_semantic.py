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
