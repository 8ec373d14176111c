"""End-to-end preprocessing pipeline test: each stage is individually
oracle-verified elsewhere; here we prove the COMPOSITION behaves — docs
flow through every stage, the audit counts are monotone, the
near-duplicate and contaminated docs actually leave, PII actually
leaves, and packing assignments attach."""

import pytest
from pyspark.sql import functions as F

from ck_spark.ops.pipeline import PreprocessConfig, preprocess_corpus


@pytest.fixture(scope="module")
def raw(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant: an exact duplicate pair, a near-duplicate pair, and PII
    base = docs.select("doc_id", "text", "source", "n_chars")
    dup_src = base.where("doc_id = 7").limit(1).collect()[0]["text"]
    rows = [
        (90_001, dup_src, "src0", len(dup_src)),                 # exact dup
        (90_002, dup_src + " tail", "src0", len(dup_src) + 5),   # near dup
        (90_003, "email me at jane@corp.example.com " * 30, "src1",
         33 * 30),
    ]
    extra = spark.createDataFrame(
        rows, schema="doc_id long, text string, source string, n_chars int")
    return base.unionByName(extra)


def test_pipeline_composition(spark, raw):
    bench = raw.where("doc_id % 97 = 3")
    cfg = PreprocessConfig(pack_seq_len=512)
    clean, report = preprocess_corpus(raw, benchmark=bench, config=cfg,
                                      audit=True)
    rows = clean.collect()
    ids = {r["doc_id"] for r in rows}

    # audit counts are monotone non-increasing through the filters
    stages = [s for s in report["stages"] if s not in ("redact", "pack")]
    counts = [report[f"docs_after_{s}"] for s in stages]
    assert counts == sorted(counts, reverse=True)

    # exact duplicate: the smaller doc_id (7) survives, 90_001 leaves
    assert 90_001 not in ids
    # near duplicate of doc 7 leaves via MinHash clustering
    assert 90_002 not in ids
    # benchmark members (contaminated by construction) leave
    assert not any(i % 97 == 3 for i in ids if len(str(i)) < 5)
    # PII doc survives filters but its text is redacted
    pii = [r for r in rows if r["doc_id"] == 90_003]
    if pii:  # may have left via repetition filter (it IS repetitive)
        assert "jane@corp.example.com" not in pii[0]["text"]
    # packing assignment columns attached
    assert {"shard", "seq_id", "offset_in_seq", "oversize"} <= set(
        clean.columns)
    assert report["stages"][-1] == "pack"


def test_pipeline_mixture_mode_and_exclusivity(spark, raw):
    weights = {f"src{k}": 1.0 + (k % 3) for k in range(20)}
    cfg = PreprocessConfig(mixture_weights=weights, near_dedup=False,
                           pack_seq_len=None)
    mixed, report = preprocess_corpus(raw, config=cfg)
    assert "copy_id" in mixed.columns
    assert "mixture" in report["stages"]
    with pytest.raises(ValueError, match="mutually exclusive"):
        preprocess_corpus(raw, config=PreprocessConfig(
            mixture_weights=weights, pack_seq_len=256))


def test_pipeline_lang_and_quality_gates(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog of it is that in",
          "s", 50),
         (2, "der hund und die katze ist nicht ein zu der und das",
          "s", 50)],
        schema="doc_id long, text string, source string, n_chars int")
    cfg = PreprocessConfig(languages=["en"], stages=["lang"])
    out, report = preprocess_corpus(df, config=cfg, audit=True)
    assert [r["doc_id"] for r in out.collect()] == [1]
    assert report["docs_after_lang"] == 1
