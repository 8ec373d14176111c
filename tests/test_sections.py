"""Full-section extraction (X6) — join semantics mirror ck's
find_containing_section (first section in span order wins,
ck-engine/src/lib.rs:1273-1283)."""

import textwrap

import pytest
from pyspark.sql import functions as F

from ck_spark.functions.symbols import chunk_corpus_symbols
from ck_spark.query.sections import full_sections, grep_full_section, section_chunks

PY_FILE = textwrap.dedent('''\
    import os

    def standalone():
        return "needle_fn"

    class Widget:
        def render(self):
            return "needle_method"

    # trailing comment with needle_nowhere
''')

RS_FILE = textwrap.dedent('''\
    use std::fmt;

    pub fn lookup() -> u32 {
        42 // needle_rust
    }
''')


@pytest.fixture(scope="module")
def code_corpus(spark):
    rows = [
        ("r", "a/widget.py", "c0", "python", PY_FILE),
        ("r", "b/lib.rs", "c0", "rust", RS_FILE),
    ]
    return spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")


def test_hit_in_function_returns_function(spark, code_corpus):
    out = grep_full_section(code_corpus, "needle_fn").collect()
    assert len(out) == 1
    r = out[0]
    assert r["path"] == "a/widget.py"
    assert r["section"].startswith("def standalone")
    assert r["section_line_start"] == 3 and r["section_line_end"] == 4


def test_hit_in_method_returns_enclosing_class_first(spark, code_corpus):
    # reference scans span-ordered chunks: the class chunk (earlier start)
    # contains the method line and wins
    out = grep_full_section(code_corpus, "needle_method").collect()
    assert len(out) == 1
    assert out[0]["section"].startswith("class Widget")


def test_hit_outside_sections_dropped(spark, code_corpus):
    out = grep_full_section(code_corpus, "needle_nowhere").collect()
    assert out == []  # comment line has no enclosing function/class


def test_rust_sections(spark, code_corpus):
    out = grep_full_section(code_corpus, "needle_rust").collect()
    assert len(out) == 1
    assert out[0]["section"].startswith("pub fn lookup")


def test_chunk_corpus_symbols_table(spark, code_corpus):
    ch = chunk_corpus_symbols(code_corpus)
    rows = ch.collect()
    assert {r["chunk_type"] for r in rows} >= {"function", "class", "method", "text"}
    w = [r for r in rows if r["path"] == "a/widget.py" and r["name"] == "render"]
    assert w and w[0]["breadcrumb"] == "Widget::render"
    # chunk ids are span-ordered and unique per doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["path"], []).append((r["chunk_id"], r["byte_start"]))
    for path, lst in by_doc.items():
        lst.sort()
        assert [c for c, _ in lst] == list(range(len(lst)))
        assert [b for _, b in lst] == sorted(b for _, b in lst)


def test_full_sections_generic_chunks(spark):
    """The join operator also works with the generic line-window chunk
    table (the documents/prose path used by the contract query)."""
    from ck_spark.functions.chunker import chunk_corpus

    rows = [("r", "d1", "c0", "en",
             "alpha one\nbeta two\ngamma three\ndelta four\nepsilon five\n")]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")
    chunks = chunk_corpus(corpus, max_tokens=20, overlap_lines=0)  # 2-line windows
    hits = spark.createDataFrame(
        [("r", "d1", 3)], "repo string, path string, line_no int")
    out = full_sections(hits, chunks).collect()
    assert len(out) == 1
    assert out[0]["section_line_start"] <= 3 <= out[0]["section_line_end"]
    assert "gamma three" in out[0]["section"]
