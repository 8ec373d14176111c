import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ck_spark.tokenizer import (
    CODE_STOPWORDS,
    term_freqs,
    tokenize,
    tokenize_series,
)


def test_simple_mode_is_tantivy_default():
    # split on non-alphanumeric, lowercase, no stoplist, len<40
    assert tokenize("Hello, WORLD_foo-bar 42!", mode="simple") == [
        "hello", "world", "foo", "bar", "42",
    ]
    # the (tantivy-default) simple mode does NOT split camelCase
    assert tokenize("getUserName", mode="simple") == ["getusername"]
    # tokens of 40+ bytes dropped (tantivy RemoveLongFilter: keeps len < 40)
    long = "a" * 41
    assert tokenize(f"x {long} y", mode="simple") == ["x", "y"]
    assert tokenize("a" * 39, mode="simple") == ["a" * 39]
    assert tokenize("a" * 40, mode="simple") == []


def test_unicode_alphanumeric_like_tantivy():
    # tantivy SimpleTokenizer is Unicode char::is_alphanumeric
    assert tokenize("héllo wörld", mode="simple") == ["héllo", "wörld"]
    assert tokenize("日本語テスト ok", mode="simple") == ["日本語テスト", "ok"]
    # 40-char cutoff is measured in BYTES (tantivy RemoveLongFilter)
    assert tokenize("é" * 21, mode="simple") == []  # 42 bytes
    assert tokenize("é" * 19, mode="simple") == ["é" * 19]  # 38 bytes: kept
    assert tokenize("é" * 20, mode="simple") == []  # 40 bytes: dropped
    # underscore is NOT alphanumeric -> split point in both modes
    assert tokenize("a_b", mode="simple") == ["a", "b"]


def test_code_mode_identifier_splitting():
    assert tokenize("getUserName", mode="code") == ["get", "user", "name"]
    assert tokenize("snake_case_name", mode="code") == ["snake", "case", "name"]
    assert tokenize("HTTPServer", mode="code") == ["http", "server"]
    assert tokenize("parseJSONBody2", mode="code") == ["parse", "json", "body2"]
    # keywords are NOT stopwords (they are the skew terms)
    assert tokenize("def foo(): return 1", mode="code") == ["def", "foo", "return", "1"]
    # english stopwords removed
    assert tokenize("the quick fox", mode="code") == ["quick", "fox"]
    assert "def" not in CODE_STOPWORDS and "return" not in CODE_STOPWORDS


def test_empty_and_null():
    assert tokenize("", mode="code") == []
    assert tokenize("", mode="simple") == []
    out = tokenize_series(pd.Series([None, ""]), mode="code")
    assert list(out) == [[], []]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=60), max_size=20), st.sampled_from(["code", "simple"]))
def test_series_matches_scalar(texts, mode):
    s = pd.Series(texts, dtype="object")
    vec = list(tokenize_series(s, mode))
    ref = [tokenize(t, mode) for t in texts]
    assert vec == ref


def test_term_freqs():
    assert term_freqs(["a", "b", "a"]) == {"a": 2, "b": 1}
    assert term_freqs([]) == {}


# alphabet chosen to exercise every branch of the numpy ASCII batch path:
# camel boundaries (case changes), digits, separators, a stopword, plus a
# non-ASCII char that forces the scalar fallback for that document.
_POS_ALPHA = st.text(
    alphabet="abAB01_ .\né" + "x" * 5, max_size=120
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_POS_ALPHA, max_size=12), st.sampled_from(["code", "simple"]))
def test_positions_series_matches_scalar(texts, mode):
    from ck_spark.tokenizer import positions_series, term_positions_text

    s = pd.Series(texts, dtype="object")
    vec = list(positions_series(s, mode))
    ref = [term_positions_text(t, mode) for t in texts]
    assert vec == ref


def test_positions_batch_edges():
    from ck_spark.tokenizer import positions_series, term_positions_text

    long_tok = "z" * 45  # >= MAX_TOKEN_LEN: dropped but still numbered
    docs = [
        "",
        "getUserName the HTTPServer x86",
        f"alpha {long_tok} beta",          # gap numbering across long token
        "the a of and",                     # all stopwords (code mode)
        "héllo wörld getUser",             # non-ASCII -> scalar fallback
        "A" * 39 + " " + "B" * 40,         # exactly-at-cutoff boundary
        "a1B2c3 DEF2ghi",                  # digit/camel interplay
    ]
    for mode in ("code", "simple"):
        out = list(positions_series(pd.Series(docs), mode))
        exp = [term_positions_text(d, mode) for d in docs]
        assert out == exp, mode
    # and the gap is real: beta sits at raw position 2, not 1
    m = term_positions_text(f"alpha {long_tok} beta", "simple")
    assert m == {"alpha": [0], "beta": [2]}


@pytest.mark.parametrize("mode", ["code", "simple"])
def test_udfs_match_driver_side(spark, mode):
    from pyspark.sql import functions as F

    from ck_spark.tokenizer import doc_len_udf, term_freqs_udf, tokens_udf

    texts = ["def getUserName(x): return x", "", "the a of", "Hello, WORLD!"]
    df = spark.createDataFrame([(t,) for t in texts], ["content"])
    rows = (
        df.select(
            "content",
            tokens_udf(mode)("content").alias("toks"),
            term_freqs_udf(mode)("content").alias("tf"),
            doc_len_udf(mode)("content").alias("dl"),
        )
        .collect()
    )
    for r in rows:
        exp = tokenize(r["content"], mode)
        assert r["toks"] == exp
        assert r["tf"] == term_freqs(exp)
        assert r["dl"] == len(exp)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(_POS_ALPHA | st.none(), max_size=12),
    st.sampled_from(["code", "simple"]),
)
def test_positions_map_arrow_matches_scalar(texts, mode):
    import pyarrow as pa

    from ck_spark.tokenizer import positions_map_arrow, term_positions_text

    arr = pa.array(texts, type=pa.string())
    out = positions_map_arrow(arr, mode).to_pylist()
    assert len(out) == len(texts)
    for got, t in zip(out, texts):
        assert dict(got) == term_positions_text(t or "", mode)


def test_positions_map_arrow_chunking(monkeypatch):
    """Force the intra-batch budget split and a ChunkedArray input."""
    import pyarrow as pa

    import ck_spark.tokenizer as tok

    monkeypatch.setattr(tok, "_BATCH_BUDGET_BYTES", 32)
    docs = [
        "getUserName the HTTPServer x86",
        "alpha beta gamma delta " * 4,
        "",
        "a1B2c3 DEF2ghi foo_bar",
        "zz " * 30,
    ]
    arr = pa.chunked_array([pa.array(docs[:2]), pa.array(docs[2:])])
    out = tok.positions_map_arrow(arr, "code").to_pylist()
    exp = [tok.term_positions_text(d, "code") for d in docs]
    assert [dict(m) for m in out] == exp
