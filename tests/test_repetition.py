"""Gopher repetition-filter tests with hand-computed fixtures (the
repetition_stats contract query separately hash-verifies vs DuckDB)."""

import pytest

from ck_spark.ops.repetition import (
    GOPHER_THRESHOLDS,
    gopher_repetition_flags,
    repetition_stats,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_duplicate_line_metrics_hand_computed(spark):
    # 4 non-empty lines: 'aa' x3 (dup), 'b' x1 -> dup_line_frac = 2/4;
    # chars: aa*3=6 dup, b=1 -> dup_line_char_frac = 6/7
    doc = "aa\naa\n\naa\nb"
    r = repetition_stats(_df(spark, [(0, doc)])).collect()[0]
    assert r["dup_line_frac"] == pytest.approx(2 / 4)
    assert r["dup_line_char_frac"] == pytest.approx(6 / 7)


def test_2gram_metrics_hand_computed(spark):
    # tokens: x y x y z -> grams: 'x y'(2), 'y x'(1), 'y z'(1)
    # glen=2 each; gram_chars = 2*4 = 8; top = 'x y': 2*2=4 -> 0.5
    # dup chars = 'x y' 2*2=4 -> 0.5
    r = repetition_stats(_df(spark, [(0, "x y x y z")])).collect()[0]
    assert r["top_2gram_char_frac"] == pytest.approx(4 / 8)
    assert r["dup_2gram_char_frac"] == pytest.approx(4 / 8)


def test_edge_docs_report_zero(spark):
    rows = [(0, ""), (1, "single"), (2, "\n\n\n"), (3, "one two")]
    out = {r["doc_id"]: r for r in repetition_stats(_df(spark, rows)).collect()}
    assert len(out) == 4  # every doc exactly once
    for i in (0, 1, 2):
        assert out[i]["dup_line_frac"] == 0.0
        assert out[i]["top_2gram_char_frac"] == 0.0
    # one 2-gram occurring once: top fraction 1.0, dup fraction 0
    assert out[3]["top_2gram_char_frac"] == 1.0
    assert out[3]["dup_2gram_char_frac"] == 0.0


def test_gopher_flags_and_custom_thresholds(spark):
    spammy = "\n".join(["buy cheap pills now"] * 50)
    # genuinely non-repetitive: every token distinct, so every 2-gram is
    # unique ("line {i} has unique" style text repeats its scaffold
    # 2-grams 50x and rightly fails the filter)
    clean = "\n".join(f"alpha{i} beta{i} gamma{i} delta{i}"
                      for i in range(50))
    out = {r["doc_id"]: r for r in gopher_repetition_flags(
        _df(spark, [(0, spammy), (1, clean)])).collect()}
    assert not out[0]["keep"]
    assert out[1]["keep"]
    # loosening every threshold to 1.0 keeps everything
    loose = gopher_repetition_flags(
        _df(spark, [(0, spammy)]),
        thresholds={k: 1.0 for k in GOPHER_THRESHOLDS})
    assert loose.collect()[0]["keep"]
    with pytest.raises(ValueError, match="unknown repetition metrics"):
        gopher_repetition_flags(_df(spark, [(0, "x")]),
                                thresholds={"nope": 0.5})
