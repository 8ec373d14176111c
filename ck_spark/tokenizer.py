"""Code-aware tokenizer — the single source of truth for BM25 semantics.

Two modes:

- ``simple``: the reference's effective lexical analyzer. ck registers no
  custom tokenizer, so its BM25 pipeline is tantivy 0.24's default TEXT
  analyzer (/root/reference/ck-engine/src/lib.rs:750-753, 860-863):
  split on non-alphanumeric, drop tokens of 40+ bytes (RemoveLongFilter
  keeps len < limit — tantivy 0.24 predicate), lowercase,
  no stoplist, no stemming. ``simple`` reproduces exactly that, and — being
  pure regex + lower + length — is also expressible in ANSI SQL, which is
  what the DuckDB oracle queries in ``__spark_entry__.py`` use.

- ``code``: the north-star extension — identifier-aware splitting
  (camelCase / PascalCase / acronym boundaries; snake_case already splits
  because '_' is non-alphanumeric), lowercase, 40-char cutoff, plus a small
  English stoplist. NOTE: language keywords like 'def'/'return' are
  deliberately NOT stopwords — they are the ubiquitous skewed terms the
  index's salted segmentation must handle (BASELINE.json north_rule).

The same functions run driver-side (query tokenization, the pure-Python
BM25 oracle in tests) and executor-side (Arrow pandas UDF), so tf/df and
hence ranks are identical by construction.
"""

from __future__ import annotations

import re
from typing import Iterable, List

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, MapType, StringType

from ck_spark.constants import MAX_TOKEN_LEN

# tantivy default: a token is a maximal run of alphanumerics. tantivy's
# SimpleTokenizer uses Rust char::is_alphanumeric (Unicode-aware); Python's
# [^\W_] is the same class minus underscore (which is not alphanumeric).
_TOKEN_RE = re.compile(r"[^\W_]+")

# camelCase / PascalCase / ACRONYMWord boundaries (zero-width). Digits stay
# attached to the preceding alpha run (x86, utf8 remain whole tokens).
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")

# Small English stoplist for `code` mode. Keyword-free on purpose: see
# module docstring. Matches ck's spirit (indexing code, not prose).
CODE_STOPWORDS = frozenset(
    "a an and are as at be by for from has in is it of on or that the to was with".split()
)

_SIMPLE_SQL_SPLIT = "[^a-z0-9]+"  # applied after lower() in SQL oracles


def raw_tokens(text: str, mode: str = "code") -> List[str]:
    """Post-split, PRE-filter token stream (lowercased): every maximal
    alphanumeric run, including tokens the filters will drop. This stream
    defines position numbering — see ``term_positions_text``."""
    if not text:
        return []
    if mode == "code":
        text = _CAMEL_RE.sub(" ", text)
    return _TOKEN_RE.findall(text.lower())


def keep_token(t: str, mode: str = "code") -> bool:
    """The index filter: tantivy's RemoveLongFilter measures BYTES
    (token.text.len() in Rust) and keeps len < limit; `code` mode adds the
    stoplist."""
    if len(t.encode("utf-8")) >= MAX_TOKEN_LEN:
        return False
    return mode != "code" or t not in CODE_STOPWORDS


def tokenize(text: str, mode: str = "code") -> List[str]:
    """Tokenize one string (filtered stream — the tf/df token list).
    Deterministic, pure."""
    return [t for t in raw_tokens(text, mode) if keep_token(t, mode)]


def tokenize_series(s: pd.Series, mode: str = "code") -> pd.Series:
    """Vectorized (pandas string-kernel) equivalent of ``tokenize``.

    Property-tested equal to ``[tokenize(x) for x in s]`` in
    tests/test_tokenizer.py.
    """
    s = s.fillna("")
    if mode == "code":
        s = s.str.replace(_CAMEL_RE, " ", regex=True)
    toks = s.str.lower().str.findall(_TOKEN_RE)
    if mode == "code":
        return toks.map(
            lambda ts: [
                t for t in ts
                if len(t.encode("utf-8")) < MAX_TOKEN_LEN and t not in CODE_STOPWORDS
            ]
        )
    return toks.map(lambda ts: [t for t in ts if len(t.encode("utf-8")) < MAX_TOKEN_LEN])


def term_freqs(tokens: Iterable[str]) -> dict:
    """term -> tf for one document."""
    d: dict = {}
    for t in tokens:
        d[t] = d.get(t, 0) + 1
    return d


def term_positions(tokens: Iterable[str]) -> dict:
    """term -> strictly-increasing token positions for ONE token list as
    given (no filtering applied here). Used by in-memory posting-kernel
    tests; the index build uses ``term_positions_text``."""
    d: dict = {}
    for i, t in enumerate(tokens):
        d.setdefault(t, []).append(i)
    return d


def _positions_from_raw(raw: List[str], mode: str) -> dict:
    d: dict = {}
    if mode == "code":
        for i, t in enumerate(raw):
            if len(t.encode("utf-8")) < MAX_TOKEN_LEN and t not in CODE_STOPWORDS:
                d.setdefault(t, []).append(i)
    else:
        for i, t in enumerate(raw):
            if len(t.encode("utf-8")) < MAX_TOKEN_LEN:
                d.setdefault(t, []).append(i)
    return d


def term_positions_text(text: str, mode: str = "code") -> dict:
    """term -> token positions for one document — THE index's position
    semantics (v6): positions index into the RAW (pre-filter) token
    stream, so a token removed by the length cut or stoplist leaves a GAP.

    This is tantivy's behavior: SimpleTokenizer assigns Token.position
    while tokenizing and RemoveLongFilter merely skips tokens, so the
    surviving tokens keep their original numbering — a ≥40-byte token
    between two phrase words breaks phrase adjacency. It also matches the
    raw-text separator-regex oracle (boolean.phrase_adjacency_regex): a
    dropped long token is still an alphanumeric run in the text, so the
    regex does not see the words as adjacent either. Only kept terms are
    stored: tf == len(positions) still holds.
    """
    return _positions_from_raw(raw_tokens(text, mode), mode)


def tokens_udf(mode: str = "code"):
    """Arrow pandas UDF: content -> array<string> tokens."""

    @F.pandas_udf(ArrayType(StringType()))
    def _udf(s: pd.Series) -> pd.Series:
        return tokenize_series(s, mode)

    return _udf


def term_freqs_udf(mode: str = "code"):
    """Arrow pandas UDF: content -> map<term, tf>.

    Aggregating tf inside the UDF (per document, executor-local) means the
    index build shuffles one (term, tf) pair per distinct term per doc
    instead of one row per token occurrence — a large shuffle-width win at
    100 TB (docs average far more tokens than distinct terms).
    """

    @F.pandas_udf(MapType(StringType(), IntegerType()))
    def _udf(s: pd.Series) -> pd.Series:
        return tokenize_series(s, mode).map(term_freqs)

    return _udf


def positions_series(s: pd.Series, mode: str = "code") -> pd.Series:
    """Vectorized equivalent of ``term_positions_text`` over a Series."""
    s = s.fillna("")
    if mode == "code":
        s = s.str.replace(_CAMEL_RE, " ", regex=True)
    raw = s.str.lower().str.findall(_TOKEN_RE)
    return raw.map(lambda ts: _positions_from_raw(ts, mode))


def term_positions_udf(mode: str = "code"):
    """Arrow pandas UDF: content -> map<term, array<int> positions>
    (gap numbering — see ``term_positions_text``).

    The index build's single tokenize pass (builder._with_doc_columns):
    tf and doc_len are DERIVED from this map JVM-side (transform_values/
    aggregate), so storing positions costs no extra tokenize or shuffle
    pass — the positions simply ride the same doc_map column family.
    """

    @F.pandas_udf(MapType(StringType(), ArrayType(IntegerType())))
    def _udf(s: pd.Series) -> pd.Series:
        return positions_series(s, mode)

    return _udf


def doc_len_udf(mode: str = "code"):
    """Arrow pandas UDF: content -> token count (BM25 |d|)."""

    @F.pandas_udf(IntegerType())
    def _udf(s: pd.Series) -> pd.Series:
        return tokenize_series(s, mode).map(len)

    return _udf


def sql_tokens_col(col):
    """JVM-side (whole-stage-codegen) token array equivalent to `simple`
    mode on ASCII text: lower → split on non-[a-z0-9] runs → drop empties
    and >=40-char tokens. Used by the dedup/text-stats operators so their
    hot path has no Python at all; exactly mirrors the DuckDB oracle SQL.
    (For full Unicode parity with tantivy use tokens_udf instead.)"""
    toks = F.split(F.lower(col), "[^a-z0-9]+")
    return F.filter(toks, lambda t: (t != F.lit("")) & (F.length(t) < MAX_TOKEN_LEN))


def shingles_col(col, n: int = 3):
    """Token n-gram (shingle) array, JVM-side. Empty when < n tokens."""
    toks = sql_tokens_col(col)
    def gram(i):
        parts = [F.element_at(toks, i + F.lit(j)) for j in range(n)]
        return F.concat_ws(" ", *parts)
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), gram),
    ).otherwise(F.array().cast("array<string>"))


def simple_tokenize_sql(col: str) -> str:
    """ANSI-SQL fragment producing the `simple`-mode token array for DuckDB
    oracles: split lower(col) on non-alphanumeric runs. Empty fragments and
    >40-char tokens must be filtered by the caller (list_filter / WHERE)."""
    return f"regexp_split_to_array(lower({col}), '{_SIMPLE_SQL_SPLIT}')"
