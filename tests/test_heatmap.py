"""Heatmap (X9) tests mirroring ck-core/src/heatmap.rs's own tests
(tokenisation_preserves_spacing_and_punctuation,
similarity_scores_expected_patterns, heatmap_bucket_mapping_matches_
thresholds, bucket_rgb_matches_expected_values) plus the Spark surface."""

from ck_spark.functions.heatmap import (
    bucket_of,
    heatmap,
    split_into_tokens,
    token_similarity,
)


def test_tokenisation_preserves_spacing_and_punctuation():
    tokens = split_into_tokens('fn main() {\n    println!("hello");\n}')
    assert tokens == [
        "fn", " ", "main", "(", ")", " ", "{", "\n",
        " ", " ", " ", " ", "println", "!", "(", '"hello"', ")", ";",
        "\n", "}",
    ]
    # lossless: concatenation reproduces the input
    assert "".join(tokens) == 'fn main() {\n    println!("hello");\n}'


def test_similarity_scores_expected_patterns():
    assert token_similarity("hello", "hello") == 1.0
    assert token_similarity("hello", "hell") > 0.0
    assert token_similarity("{", "hello") == 0.0
    assert token_similarity("   ", "hello") == 0.0
    # word-exact inside a multi-word pattern scores 0.9
    assert token_similarity("parse", "parse buffer") == 0.9
    # substring containment scales by length ratio
    assert abs(token_similarity("parser", "parse buffer")
               - 0.6 * (5 / 6)) < 1e-9


def test_heatmap_bucket_mapping_matches_thresholds():
    assert bucket_of(0.0)[0] == 0 and bucket_of(0.0)[1] is None
    assert bucket_of(0.01)[0] == 1
    assert bucket_of(0.2)[0] == 2
    assert bucket_of(0.3)[0] == 3
    assert bucket_of(0.4)[0] == 4
    assert bucket_of(0.5)[0] == 5
    assert bucket_of(0.7)[0] == 6
    assert bucket_of(0.8)[0] == 7
    assert bucket_of(0.9)[0] == 8


def test_bucket_rgb_matches_expected_values():
    assert bucket_of(0.01)[1] == (180, 180, 180)   # Step1
    assert bucket_of(0.9)[1] == (0, 255, 100)      # Step8
    assert bucket_of(0.9)[2] is True               # Step8 is bold
    assert bucket_of(0.8)[2] is False


def test_heatmap_spark_surface(spark):
    df = spark.createDataFrame(
        [("d1", "parse the buffer now")], "path string, content string"
    )
    rows = heatmap(df, "parse buffer").collect()
    toks = {r["token"]: r for r in rows if r["token"].strip()}
    assert toks["parse"]["score"] == 0.9 and toks["parse"]["bucket"] == 8
    assert toks["buffer"]["score"] == 0.9
    assert toks["the"]["bucket"] <= 1
    # spacing tokens present with score 0 (renderer alignment contract)
    assert sum(1 for r in rows if r["token"] == " ") == 3
    assert [r["pos"] for r in rows] == sorted(r["pos"] for r in rows)
