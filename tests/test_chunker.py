import numpy as np
import pytest

from ck_spark.functions.chunker import (
    chars_per_token,
    chunk_corpus,
    chunk_text,
    estimate_tokens,
    split_lines_with_offsets,
)


def test_line_offsets_lf():
    text = "abc\ndef\n\nxyz"
    lines = split_lines_with_offsets(text)
    assert [(a, b) for a, b, _ in lines] == [(0, 4), (4, 8), (8, 9), (9, 12)]
    assert [t for _, _, t in lines] == ["abc", "def", "", "xyz"]


def test_line_offsets_crlf_and_bare_cr():
    # mirrors the reference's byte-offset regressions
    # (ck-engine/src/lib.rs:1599-1658)
    text = "ab\r\ncd\re\n"
    lines = split_lines_with_offsets(text)
    assert [(a, b) for a, b, _ in lines] == [(0, 4), (4, 7), (7, 9)]
    assert [t for _, _, t in lines] == ["ab", "cd", "e"]


def test_line_offsets_utf8_bytes():
    text = "héllo\nwörld"
    lines = split_lines_with_offsets(text)
    # é and ö are 2 bytes each
    assert lines[0][:2] == (0, 7)
    assert lines[1][:2] == (7, 13)


def test_chunk_spans_are_byte_exact():
    text = "\n".join(f"line {i} content" for i in range(100)) + "\n"
    raw = text.encode("utf-8")
    chunks = chunk_text(text, max_tokens=200, overlap_lines=4)
    assert len(chunks) > 1
    for c in chunks:
        assert raw[c.byte_start : c.byte_end].decode("utf-8") == c.text
        assert 1 <= c.line_start <= c.line_end
    # full coverage: first chunk starts at 0, last ends at len(raw)
    assert chunks[0].byte_start == 0
    assert chunks[-1].byte_end == len(raw)
    # consecutive chunks overlap by the configured lines
    assert chunks[1].line_start == chunks[0].line_end - 4 + 1


def test_chunk_window_from_token_budget():
    text = "\n".join(f"l{i}" for i in range(50))
    chunks = chunk_text(text, max_tokens=100, overlap_lines=0)  # window 10
    assert [(c.line_start, c.line_end) for c in chunks] == [
        (1, 10), (11, 20), (21, 30), (31, 40), (41, 50)
    ]


def test_empty_and_single_line():
    assert chunk_text("") == []
    cs = chunk_text("just one line")
    assert len(cs) == 1 and cs[0].line_start == cs[0].line_end == 1


def test_token_estimator_density():
    code = "def f(x):\n    return x\nimport os\n"
    prose = "The weather was lovely today and the birds sang.\nMore prose here without code.\n"
    assert chars_per_token(code) == 4.2
    assert chars_per_token(prose) == 4.8
    assert estimate_tokens(code) == max(1, int(len(code) / 4.2))
    assert estimate_tokens("") == 0


def test_chunk_corpus_dataframe(spark):
    from ck_spark.corpus import generate_corpus

    pdf = generate_corpus(60, seed=42)
    df = spark.createDataFrame(pdf)
    chunks = chunk_corpus(df, max_tokens=60, overlap_lines=2).toPandas()
    assert {"doc_id", "repo", "path", "chunk_id", "byte_start", "byte_end",
            "line_start", "line_end", "text", "estimated_tokens"} <= set(chunks.columns)
    # spans decode exactly against the original content
    by_path = pdf.set_index("path")["content"].to_dict()
    sample = chunks.head(200)
    for r in sample.itertuples():
        raw = by_path[r.path].encode("utf-8")
        assert raw[r.byte_start : r.byte_end].decode("utf-8") == r.text
    # driver-side chunking matches the UDF output
    some = pdf.iloc[3]["content"]
    local = chunk_text(some, max_tokens=60, overlap_lines=2)
    got = chunks[chunks["path"] == pdf.iloc[3]["path"]].sort_values("chunk_id")
    assert len(local) == len(got)
    assert [c.text for c in local] == list(got["text"])
