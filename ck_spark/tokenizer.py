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

import numpy as np
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


_STOP_BYTES = frozenset(w.encode("ascii") for w in CODE_STOPWORDS)

# low-L-bytes masks for the packed-uint64 short-token dedupe (L = 1..8)
_LEN_MASKS = np.array(
    [(1 << (8 * L)) - 1 if L < 8 else (1 << 64) - 1 for L in range(9)],
    dtype=np.uint64,
)


def _ascii_positions_groups(docs: List[bytes], mode: str):
    """Numpy byte-level tokenization of a batch of pure-ASCII documents —
    the index build's hot path (VERDICT r3 #3). Returns the grouped form
    ``(did_s, tid_s, pos_s, group_starts, terms)`` — rows sorted by
    (doc, term-id), ``group_starts`` indexing each (doc, term) group's
    first row — or None when no token survives. Consumed by the dict
    builder (``_ascii_positions_batch``, the pandas path) and the
    arrow-native builder (``_ascii_positions_map_array``).

    The whole batch is tokenized as ONE flat byte buffer: boolean masks
    find token-run boundaries (including the camelCase zero-width splits),
    raw positions come from a cumulative count BEFORE the length/stoplist
    filter (gap numbering, see ``term_positions_text``), tokens are
    deduplicated per length bucket with ``np.unique`` over void views (one
    Python string per DISTINCT token, not per occurrence), and the final
    (doc, term) grouping is a single stable ``np.lexsort``. Property-tested
    byte-for-byte equal to the scalar path in tests/test_tokenizer.py.

    On ASCII, bytes == chars, so the byte-length cutoff and the ASCII-only
    camel classes ([a-z0-9]/[A-Z]) of ``_CAMEL_RE`` match exactly.
    """
    n_docs = len(docs)
    buf = b"\n".join(docs)
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return None
    lens = np.fromiter((len(d) for d in docs), dtype=np.int64, count=n_docs)
    doc_starts = np.zeros(n_docs, dtype=np.int64)
    if n_docs > 1:
        np.cumsum(lens[:-1] + 1, out=doc_starts[1:])

    lower_m = (arr >= 97) & (arr <= 122)
    upper_m = (arr >= 65) & (arr <= 90)
    digit_m = (arr >= 48) & (arr <= 57)
    alnum = lower_m | upper_m | digit_m
    prev_alnum = np.empty_like(alnum)
    prev_alnum[0] = False
    prev_alnum[1:] = alnum[:-1]
    next_alnum = np.empty_like(alnum)
    next_alnum[-1] = False
    next_alnum[:-1] = alnum[1:]
    if mode == "code":
        # _CAMEL_RE: (?<=[a-z0-9])(?=[A-Z]) | (?<=[A-Z])(?=[A-Z][a-z])
        lowdig = lower_m | digit_m
        prev_lowdig = np.empty_like(lowdig)
        prev_lowdig[0] = False
        prev_lowdig[1:] = lowdig[:-1]
        prev_upper = np.empty_like(upper_m)
        prev_upper[0] = False
        prev_upper[1:] = upper_m[:-1]
        next_lower = np.empty_like(lower_m)
        next_lower[-1] = False
        next_lower[:-1] = lower_m[1:]
        camel = (prev_lowdig & upper_m) | (prev_upper & upper_m & next_lower)
        camel_next = np.empty_like(camel)
        camel_next[-1] = False
        camel_next[:-1] = camel[1:]
        starts = np.flatnonzero(alnum & (~prev_alnum | camel))
        ends = np.flatnonzero(alnum & (~next_alnum | camel_next)) + 1
    else:
        starts = np.flatnonzero(alnum & ~prev_alnum)
        ends = np.flatnonzero(alnum & ~next_alnum) + 1
    if starts.size == 0:
        return None

    did = np.searchsorted(doc_starts, starts, side="right") - 1
    # raw (pre-filter) position numbering: token index within its doc
    first_tok = np.searchsorted(starts, doc_starts)
    rawpos = np.arange(starts.size, dtype=np.int64) - first_tok[did]

    tok_len = ends - starts
    keep = tok_len < MAX_TOKEN_LEN
    starts, did, rawpos, tok_len = starts[keep], did[keep], rawpos[keep], tok_len[keep]
    if starts.size == 0:
        return None

    low = np.where(upper_m, arr + 32, arr).astype(np.uint8)

    # term-id assignment. Tokens of <= 8 bytes — the bulk of code
    # identifiers post-camel-split — are read as ONE unaligned uint64
    # sliding-window gather and masked to length (tokens are alnum-only,
    # so zero-padding is injective across lengths), then deduped with a
    # single integer np.unique: ~1.7x over the per-length void-row sorts,
    # and no (k, L) index-matrix construction. Longer tokens keep the
    # per-length void-view path. One Python bytes object per DISTINCT
    # token in the batch either way.
    term_ids = np.empty(starts.size, dtype=np.int64)
    uniq: List[bytes] = []
    short = np.flatnonzero(tok_len <= 8)
    if short.size:
        n = low.size
        m = (n + 15) // 8 * 8
        padded = np.zeros(m, dtype=np.uint8)
        padded[:n] = low
        # explicit little-endian view: the masks below keep the LOW 8*L
        # bits and the unpack slices token bytes from the low end, so the
        # byte order must be LE regardless of host endianness (free on x86)
        u64 = np.lib.stride_tricks.as_strided(
            padded.view(np.dtype("<u8")), shape=(m - 7,), strides=(1,)
        )
        packed = u64[starts[short]] & _LEN_MASKS[tok_len[short]]
        u, inv = np.unique(packed, return_inverse=True)
        term_ids[short] = inv
        ub = u.astype("<u8").tobytes()  # little-endian: token bytes, then pad
        uniq.extend(ub[i:i + 8].rstrip(b"\0") for i in range(0, len(ub), 8))
    for L in np.unique(tok_len[tok_len > 8]).tolist():
        sel = np.flatnonzero(tok_len == L)
        mat = low[starts[sel, None] + np.arange(L)]
        view = np.ascontiguousarray(mat).view(np.dtype((np.void, L))).ravel()
        u, inv = np.unique(view, return_inverse=True)
        term_ids[sel] = len(uniq) + inv
        ub = u.tobytes()
        uniq.extend(ub[i:i + L] for i in range(0, len(ub), L))

    if mode == "code":
        stop_ids = [i for i, t in enumerate(uniq) if t in _STOP_BYTES]
        if stop_ids:
            keep2 = ~np.isin(term_ids, np.asarray(stop_ids, dtype=np.int64))
            term_ids, did, rawpos = term_ids[keep2], did[keep2], rawpos[keep2]
            if term_ids.size == 0:
                return None

    terms = [t.decode("ascii") for t in uniq]
    # stable sort by (doc, term): equal keys keep buffer order, so each
    # group's positions stay strictly increasing. Packed single stable
    # argsort (did < 2^32 per batch, term_ids < token count) measures
    # ~2.5x over lexsort's two stable passes.
    order = np.argsort(
        (did.astype(np.uint64) << np.uint64(32)) | term_ids.astype(np.uint64),
        kind="stable",
    )
    did_s, tid_s, pos_s = did[order], term_ids[order], rawpos[order]
    bnd = np.flatnonzero((did_s[1:] != did_s[:-1]) | (tid_s[1:] != tid_s[:-1])) + 1
    return did_s, tid_s, pos_s, np.concatenate(([0], bnd)), terms


def _ascii_positions_batch(docs: List[bytes], mode: str) -> List[dict]:
    """Per-doc {term: positions} dicts for a pure-ASCII batch — the
    pandas-path consumer of ``_ascii_positions_groups``."""
    n_docs = len(docs)
    if n_docs == 0:
        return []
    g = _ascii_positions_groups(docs, mode)
    res: List[dict] = [dict() for _ in docs]
    if g is None:
        return res
    did_s, tid_s, pos_s, gstart, terms = g
    grp_starts = gstart.tolist()
    grp_ends = np.concatenate((gstart[1:], [did_s.size])).tolist()
    pos_list = pos_s.tolist()
    for gs, ge in zip(grp_starts, grp_ends):
        res[did_s[gs]][terms[tid_s[gs]]] = pos_list[gs:ge]
    return res


# Per-call flat-buffer budget for the numpy batch tokenizer. Keeping each
# batch's working set around 1 MiB makes every numpy temporary land in
# already-faulted, cache-warm arena pages: on this host a single 6 MB
# first-touch batch costs ~8 s in page faults while 8x 0.8 MB sub-batches
# of the same corpus run in 0.47 s total (and warm throughput is equal).
_BATCH_BUDGET_BYTES = 1 << 20


def positions_series(s: pd.Series, mode: str = "code") -> pd.Series:
    """Vectorized equivalent of ``term_positions_text`` over a Series.

    ASCII documents (virtually all source code) take the numpy batch path
    (``_ascii_positions_batch``), sliced into ~1 MiB sub-batches (see
    ``_BATCH_BUDGET_BYTES``); any non-ASCII document falls back to the
    scalar regex path — both produce identical maps by property test.

    NOTE: the per-(doc, term) Python dict/list construction here plus the
    pandas_udf serializer's per-row map conversion dominates a doc_map
    build (~2.5 s of a 4.75 s 48k-doc stage at 8 cores; the numpy
    tokenize itself is ~0.5 s) — the index build therefore uses the
    arrow-native ``positions_map_arrow`` via mapInArrow instead; this
    pandas path remains for per-row/driver-side callers and as the
    property-test twin.
    """
    s = s.fillna("")
    vals = s.tolist()
    enc: List[bytes] = []
    fallback: List[int] = []
    for i, v in enumerate(vals):
        try:
            enc.append(v.encode("ascii"))
        except UnicodeEncodeError:
            enc.append(b"")
            fallback.append(i)
    res: List[dict] = []
    lo = 0
    budget = 0
    for i, e in enumerate(enc):
        if budget + len(e) > _BATCH_BUDGET_BYTES and i > lo:
            res.extend(_ascii_positions_batch(enc[lo:i], mode))
            lo, budget = i, 0
        budget += len(e)
    res.extend(_ascii_positions_batch(enc[lo:], mode))
    for i in fallback:
        res[i] = term_positions_text(vals[i], mode)
    return pd.Series(res, index=s.index)


def _posm_pa_type():
    import pyarrow as pa

    return pa.map_(pa.string(), pa.list_(pa.int32()))


def _empty_maps(n: int):
    import pyarrow as pa

    return pa.MapArray.from_arrays(
        pa.array(np.zeros(n + 1, dtype=np.int32)),
        pa.array([], type=pa.string()),
        pa.ListArray.from_arrays(
            pa.array([0], type=pa.int32()), pa.array([], type=pa.int32())
        ),
    )


def _ascii_positions_map_array(docs: List[bytes], mode: str):
    """pa.MapArray twin of ``_ascii_positions_batch``: the same numpy
    group arrays become the map/list child buffers DIRECTLY — zero
    per-(doc, term) Python objects (only one Python str per distinct
    term, shared via a C++ ``take``)."""
    import pyarrow as pa

    n_docs = len(docs)
    g = _ascii_positions_groups(docs, mode) if n_docs else None
    if g is None:
        return _empty_maps(n_docs)
    did_s, tid_s, pos_s, gstart, terms = g
    gdid = did_s[gstart]
    gtid = tid_s[gstart]
    counts = np.bincount(gdid, minlength=n_docs)
    moff = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=moff[1:])
    keys = pa.compute.take(
        pa.array(terms, type=pa.string()), pa.array(gtid)
    )
    items = pa.ListArray.from_arrays(
        pa.array(
            np.concatenate((gstart, [pos_s.size])).astype(np.int32)
        ),
        pa.array(pos_s.astype(np.int32)),
    )
    return pa.MapArray.from_arrays(
        pa.array(moff.astype(np.int32)), keys, items
    )


def positions_map_arrow(contents, mode: str = "code"):
    """Arrow-native ``positions_series``: term -> positions maps for an
    arrow StringArray of documents, returned as a
    ``map<string, list<int32>>`` pa.Array — the mapInArrow index-build
    path. No per-row Python dicts and no serializer map conversion
    (pandas_udf's per-row ``convert_map`` lambda was the measured
    dominator of the doc_map stage). A batch containing any non-ASCII or
    null document falls back wholesale to the scalar-dict path (rare for
    source code); both paths produce equal maps (property-tested)."""
    import pyarrow as pa

    if isinstance(contents, pa.ChunkedArray):
        contents = contents.combine_chunks()
    vals = contents.to_pylist()
    enc: List[bytes] = []
    fallback = False
    for v in vals:
        if v is None:
            fallback = True
            break
        try:
            enc.append(v.encode("ascii"))
        except UnicodeEncodeError:
            fallback = True
            break
    if fallback:
        rows = [
            list(term_positions_text(v or "", mode).items())
            for v in vals
        ]
        return pa.array(rows, type=_posm_pa_type())
    chunks = []
    lo = 0
    budget = 0
    for i, e in enumerate(enc):
        if budget + len(e) > _BATCH_BUDGET_BYTES and i > lo:
            chunks.append(_ascii_positions_map_array(enc[lo:i], mode))
            lo, budget = i, 0
        budget += len(e)
    chunks.append(_ascii_positions_map_array(enc[lo:], mode))
    return pa.concat_arrays(chunks) if len(chunks) > 1 else chunks[0]


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


def let_col(value, body):
    """Bind `value` once per row and build an expression over it —
    ``transform(array(value), v -> body(v))[1]``.

    Why this exists: higher-order functions are interpreted (not
    whole-stage-codegen), and a non-attribute subexpression referenced
    inside a lambda is RE-EVALUATED on every element the lambda visits.
    An n-element transform whose lambda touches a token-array expression
    therefore re-tokenizes the document n times — O(tokens^2) per row.
    Binding the expression as a one-element array's lambda variable makes
    every inner reference a cheap bound-variable read (evaluated once per
    row), which measured 6.8x on the minhash signature stage at sf1.0."""
    return F.element_at(F.transform(F.array(value), body), 1)


def shingles_col(col, n: int = 3):
    """Token n-gram (shingle) array, JVM-side. Empty when < n tokens.
    The token array is let-bound (see let_col) so each shingle's
    element_at reads the materialized array instead of re-tokenizing."""
    def build(toks):
        def gram(i):
            parts = [F.element_at(toks, i + F.lit(j)) for j in range(n)]
            return F.concat_ws(" ", *parts)
        return F.when(
            F.size(toks) >= n,
            F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), gram),
        ).otherwise(F.array().cast("array<string>"))
    return let_col(sql_tokens_col(col), build)


def simple_tokenize_sql(col: str) -> str:
    """ANSI-SQL fragment producing the `simple`-mode token array for DuckDB
    oracles: split lower(col) on non-alphanumeric runs. Empty fragments and
    >40-char tokens must be filtered by the caller (list_filter / WHERE)."""
    return f"regexp_split_to_array(lower({col}), '{_SIMPLE_SQL_SPLIT}')"
