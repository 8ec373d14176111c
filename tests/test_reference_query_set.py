"""The reference query set (FIXTURES.md §1 table), evaluated 1:1 against
the oracles. Each test names a row of that table.

| kind | semantics checked |
|---|---|
| single term            | BM25 ranking, idf |
| conjunctive multi-term | posting intersection + WAND |
| ranked OR multi-term   | DAAT union scoring (ck/tantivy default OR) |
| ubiquitous term        | skew/salting path, rank stability |
| camelCase query        | code-aware tokenizer identity |
| regex / fixed / word   | grep mode (F1/F2), deterministic order |
| hybrid                 | RRF fusion k=60 (J2/A4) |
| top-k edges            | k=1, k>n_matches, threshold (T2/F5/F6) |
"""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from ck_spark.corpus import generate_corpus
from ck_spark.index import build_index
from ck_spark.query import BM25Index
from ck_spark.query.grep import grep
from ck_spark.query.hybrid import add_rank, rrf_fuse
from tests.oracle_bm25 import bm25_rank


@pytest.fixture(scope="module")
def rig(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refq"))
    pdf = generate_corpus(400, seed=42)
    corpus = spark.createDataFrame(pdf)
    build_index(spark, corpus, root, mode="code", n_segments=4,
                term_buckets=8, build_groups=2, block_size=32)
    idx = BM25Index.load(spark, root)
    dm = spark.read.parquet(idx.paths.doc_map).toPandas()
    key2id = {(r.repo, r.path): r.doc_id for r in dm.itertuples()}
    docs = {key2id[(r.repo, r.path)]: r.content for r in pdf.itertuples()
            if "\x00" not in r.content}
    return idx, corpus, pdf, docs


def _check(idx, docs, q, k=10, mode="or"):
    got = [(r["doc_id"], r["score"]) for r in idx.search(q, k=k, mode=mode).collect()]
    exp = bm25_rank(docs, q, k=k, mode=mode, tokenizer_mode="code")
    assert [d for d, _ in got] == [d for d, _ in exp], q
    np.testing.assert_allclose([s for _, s in got], [s for _, s in exp],
                               rtol=1e-9, atol=1e-12)


def test_single_term(rig):
    idx, _, _, docs = rig
    _check(idx, docs, "tokenizer")


def test_conjunctive_multi_term(rig):
    idx, _, _, docs = rig
    _check(idx, docs, "buffer parse error", mode="and")
    # and via explicit WAND-capable path
    a = idx.search("parse buffer", k=5, mode="and").collect()
    assert a == idx.search("parse buffer", k=5, mode="and", strategy="exhaustive").collect()


def test_ranked_or_multi_term(rig):
    idx, _, _, docs = rig
    _check(idx, docs, "machine learning cache")  # mixed known/unknown terms


def test_ubiquitous_term_skew(rig):
    idx, _, _, docs = rig
    _check(idx, docs, "def")
    _check(idx, docs, "return")
    # skew check: 'def' postings span every segment
    post = idx.spark.read.parquet(idx.paths.postings)
    assert post.where(F.col("term") == "def").select("seg").distinct().count() == 4


def test_camel_case_query(rig):
    idx, _, _, docs = rig
    from ck_spark.tokenizer import tokenize

    assert tokenize("getUserName", "code") == ["get", "user", "name"]
    _check(idx, docs, "getUserName")


def test_regex_fixed_word_grep(rig):
    _, corpus, pdf, _ = rig

    def oracle(pattern):
        out = []
        rx = re.compile(pattern)
        for r in pdf.itertuples():
            for i, line in enumerate(re.split("\r\n|\r|\n", r.content), 1):
                if rx.search(line):
                    out.append((r.path, i))
        return sorted(out)

    got = sorted((r["path"], r["line_no"]) for r in grep(corpus, r"def \w+").collect())
    assert got == oracle(r"def \w+")
    fixed = sorted((r["path"], r["line_no"])
                   for r in grep(corpus, "marker", fixed_string=True).collect())
    assert fixed == oracle(re.escape("marker"))
    word = sorted((r["path"], r["line_no"])
                  for r in grep(corpus, "import", whole_word=True).collect())
    assert word == oracle(r"\bimport\b")


def test_hybrid_rrf_k60(rig):
    idx, corpus, pdf, docs = rig
    bm = add_rank(idx.search("parse buffer", k=20), [F.desc("score"), F.asc("doc_id")], 20)
    gr_docs = (
        grep(corpus, "marker", count_matches=True)
        .groupBy("path").agg(F.sum("n_matches").alias("n"))
    )
    dm = idx.spark.read.parquet(idx.paths.doc_map).select("doc_id", "path")
    gr = add_rank(gr_docs.join(dm, "path").select("doc_id", "n"),
                  [F.desc("n"), F.asc("doc_id")], 1000)
    fused = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([bm, gr], ["doc_id"]).collect()}
    # python oracle for rrf
    bm_o = bm25_rank(docs, "parse buffer", k=20, tokenizer_mode="code")
    gr_o = {}
    for r in pdf.itertuples():
        n = len(re.findall("marker", r.content))
        if n:
            did = [k for k, v in docs.items() if v == r.content]
            gr_o[max(did)] = n  # dup contents share text; use any stable id
    # verify a couple of fused entries for docs unique in both lists
    bm_ranks = {d: i + 1 for i, (d, _) in enumerate(bm_o)}
    for d, rank in list(bm_ranks.items())[:5]:
        exp = 1.0 / (60 + rank)
        if d in fused and d not in gr_o:
            assert abs(fused[d] - exp) < 1e-9


def test_topk_edges_threshold_near_miss(rig):
    idx, _, _, docs = rig
    _check(idx, docs, "parse buffer", k=1)
    rare_q = "marker"
    got = idx.search(rare_q, k=10_000).count()
    exp = len(bm25_rank(docs, rare_q, k=10_000, tokenizer_mode="code"))
    assert got == exp
    res, near = idx.search_with_near_miss("parse buffer", k=10, threshold=0.8)
    rs, ns = res.collect(), near.collect()
    assert all(r["score"] >= 0.8 for r in rs)
    assert len(ns) <= 1
