import os

import pytest

from ck_spark.corpus import generate_corpus
from ck_spark.plans import schemas
from ck_spark.sources.corpus_io import read_corpus, write_corpus


def test_corpus_roundtrip_parquet(spark, tmp_path):
    pdf = generate_corpus(40, seed=42)
    df = spark.createDataFrame(pdf, schema=schemas.CORPUS)
    ref = str(tmp_path / "corpus_pq")
    write_corpus(df, ref)
    back = read_corpus(spark, ref)
    assert back.schema == schemas.CORPUS
    assert sorted(r["path"] for r in back.collect()) == sorted(pdf["path"])


def test_iceberg_ref_detection():
    from ck_spark.sources.corpus_io import _is_iceberg

    assert _is_iceberg("catalog.db.corpus")
    assert not _is_iceberg("/tmp/corpus")
    assert not _is_iceberg("data/corpus.parquet")


def test_built_index_matches_declared_schemas(spark, tmp_path):
    from ck_spark.index import build_index

    pdf = generate_corpus(60, seed=42)
    root = str(tmp_path / "schidx")
    paths = build_index(spark, spark.createDataFrame(pdf), root, mode="simple",
                        n_segments=2, term_buckets=4, build_groups=1)
    dm = spark.read.parquet(paths.doc_map)
    assert {f.name for f in dm.schema} == {f.name for f in schemas.DOC_MAP}
    post = spark.read.parquet(paths.postings)
    assert {f.name for f in post.schema} == {f.name for f in schemas.POSTINGS}
    ts = spark.read.parquet(paths.term_stats)
    assert {f.name for f in ts.schema} == {f.name for f in schemas.TERM_STATS}
    cs = spark.read.parquet(paths.corpus_stats)
    assert {f.name for f in cs.schema} == {f.name for f in schemas.CORPUS_STATS}
