"""Boundary-tie exactness of adapters.search_documents: when more docs tie
at the k-th score than the over-fetch buffer covers, the adapter must keep
refetching until the tie group is complete — the cut must equal the SQL
oracle's ORDER BY score DESC, doc_id (VERDICT r01 'What's wrong' #5)."""

import os

import pandas as pd
import pytest

from ck_spark.adapters import search_documents


@pytest.fixture(scope="module")
def tied_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("tiedsf")
    # 40 identical docs (identical BM25 scores) + 3 distinct docs.
    # doc_ids deliberately NOT in hash order.
    rows = [{"doc_id": 1000 + i, "text": "needle alpha beta", "lang": "en",
             "source": "t", "n_chars": 17} for i in range(40)]
    rows += [
        {"doc_id": 1, "text": "needle needle needle gamma", "lang": "en",
         "source": "t", "n_chars": 26},
        {"doc_id": 2, "text": "unrelated words only", "lang": "en",
         "source": "t", "n_chars": 20},
        {"doc_id": 3, "text": "needle once delta epsilon zeta longer doc here",
         "lang": "en", "source": "t", "n_chars": 47},
    ]
    pdf = pd.DataFrame(rows)
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_boundary_tie_wider_than_buffer(spark, tied_sf_dir):
    # k=5 lands inside the 40-way tie; tie_buffer=2 can't cover it in one
    # fetch, so the adapter must detect and refetch
    got = search_documents(spark, tied_sf_dir, "needle", k=5, tie_buffer=2).collect()
    ids = [r["doc_id"] for r in got]
    # doc 1 has the highest tf -> rank 1; ranks 2..5 are the smallest
    # doc_ids of the tie group (1000, 1001, 1002, 1003)
    assert ids[0] == 1
    assert ids[1:] == [1000, 1001, 1002, 1003]
    # scores within the tie group are equal
    assert len({round(r["score"], 9) for r in got[1:]}) == 1


def test_cut_exactly_at_tie_end(spark, tied_sf_dir):
    # k big enough to span the whole tie group + the low scorer
    got = search_documents(spark, tied_sf_dir, "needle", k=42, tie_buffer=2).collect()
    ids = [r["doc_id"] for r in got]
    assert ids[0] == 1
    assert ids[1:41] == [1000 + i for i in range(40)]
    assert ids[41] == 3  # lowest score (long doc, tf=1) comes last
    assert len(ids) == 42


def test_no_tie_fast_path(spark, tied_sf_dir):
    got = search_documents(spark, tied_sf_dir, "gamma", k=5).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_batch_matches_per_query_with_ties(spark, tied_sf_dir):
    """search_documents_many must apply the same per-query tie protocol:
    batch results == the single-query adapter's, query by query — even
    when k lands inside a tie group wider than the fetch buffer."""
    from ck_spark.adapters import search_documents_many

    queries = [("needle", "or"), ("gamma", "or"), ("needle alpha", "and")]
    batch = search_documents_many(
        spark, tied_sf_dir, queries, k=5, tie_buffer=2
    ).collect()
    for qid, (q, mode) in enumerate(queries):
        single = search_documents(
            spark, tied_sf_dir, q, k=5, mode=mode, tie_buffer=2
        ).collect()
        got = [(r["doc_id"], round(r["score"], 9)) for r in batch
               if r["query_id"] == qid]
        want = [(r["doc_id"], round(r["score"], 9)) for r in single]
        assert got == want, (qid, got, want)


def test_batch_sees_delta_generation_docs(spark, tmp_path):
    """Docs ADDED by an LSM delta update carry engine ids absent from the
    base doc_map parquet. search_documents_many must map them through the
    index's LIVE doc_map view (base ∪ deltas minus tombstones) exactly
    like the single-query path — an inner join against the raw base read
    would silently drop them AND misread the short result as corpus
    exhaustion (ADVICE r4, adapters.py)."""
    from ck_spark.adapters import (
        documents_as_corpus,
        search_documents,
        search_documents_many,
    )
    from ck_spark.index import build_index
    from ck_spark.index.builder import update_index
    from ck_spark.query import BM25Index

    d = tmp_path / "sf"
    d.mkdir()
    rows = [
        {"doc_id": i, "text": f"alpha common filler doc{i}", "lang": "en",
         "source": "t", "n_chars": 25}
        for i in range(50)
    ]
    rows += [
        {"doc_id": 50 + i, "text": "brandnew delta doc alpha", "lang": "en",
         "source": "t", "n_chars": 24}
        for i in range(10)
    ]
    pdf = pd.DataFrame(rows)
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    docs = spark.read.parquet(str(d / "documents.parquet"))
    root = str(tmp_path / "idx")
    build_index(
        spark, documents_as_corpus(docs.where("doc_id < 50")), root,
        mode="simple", n_segments=2, term_buckets=4,
    )
    update_index(spark, documents_as_corpus(docs), root, full_snapshot=True)
    idx = BM25Index.load(spark, root)

    queries = [("brandnew", "or"), ("alpha", "or")]
    batch = search_documents_many(
        spark, str(d), queries, k=10, idx=idx
    ).collect()
    delta_hits = [r for r in batch if r["query_id"] == 0]
    assert delta_hits, "delta-generation docs dropped from batch results"
    assert {r["doc_id"] for r in delta_hits} == set(range(50, 60))
    for qid, (q, mode) in enumerate(queries):
        single = search_documents(
            spark, str(d), q, k=10, mode=mode, idx=idx
        ).collect()
        got = [(r["doc_id"], round(r["score"], 9)) for r in batch
               if r["query_id"] == qid]
        want = [(r["doc_id"], round(r["score"], 9)) for r in single]
        assert got == want, (qid, got, want)
