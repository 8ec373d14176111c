"""Generic line-window chunker + token estimator.

Rebuild of the reference's generic chunking path:
- C10 token estimator (/root/reference/ck-embed/src/tokenizer.rs:13-98):
  chars-per-token heuristic 4.2 (code-dense) / 4.4 (mixed) / 4.8 (prose),
  code density = indicator lines / total lines.
- C2 generic line-window chunker (/root/reference/ck-chunk/src/lib.rs:
  299-372): fixed line windows with overlap, window size derived from the
  model token budget via a 10-tokens-per-line heuristic, byte-exact spans
  handling \\n, \\r\\n and bare \\r.

Chunks are the unit of embedding (semantic mode); BM25 stays
file-granular like the reference (ck-engine/src/lib.rs:860-885).
Executor-side entry point is an Arrow pandas UDF producing
array<struct<...>> that callers explode into a chunks table.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# code-indicator heuristics in the spirit of tokenizer.rs:61-98
_CODE_INDICATOR = re.compile(
    r"^\s*(def |fn |func |class |import |from |return|if |for |while |#|//|/\*)"
    r"|[{};]\s*$|=>|::|->"
)
_LINE_SPLIT = re.compile(r"(\r\n|\r|\n)")

TOKENS_PER_LINE = 10  # ck's window-sizing heuristic
DEFAULT_MAX_TOKENS = 400
DEFAULT_OVERLAP_LINES = 8


def code_density(lines: list[str]) -> float:
    if not lines:
        return 0.0
    ind = sum(1 for ln in lines if _CODE_INDICATOR.search(ln))
    return ind / len(lines)


def chars_per_token(text: str) -> float:
    """4.2 code-dense / 4.4 mixed / 4.8 prose (ck-embed/src/tokenizer.rs:13-39)."""
    lines = [ln for ln in re.split(r"\r\n|\r|\n", text) if ln.strip()]
    d = code_density(lines)
    if d > 0.5:
        return 4.2
    if d > 0.2:
        return 4.4
    return 4.8


def estimate_tokens(text: str) -> int:
    if not text:
        return 0
    return max(1, int(len(text) / chars_per_token(text)))


@dataclass
class Chunk:
    chunk_id: int
    byte_start: int
    byte_end: int
    line_start: int  # 1-indexed, inclusive (span validation mirrors ck-core Span)
    line_end: int
    text: str
    estimated_tokens: int


def split_lines_with_offsets(text: str) -> list[tuple[int, int, str]]:
    """[(byte_start, byte_end_excl_of_line_including_ending, line_text)] —
    offsets are byte-exact for \\n, \\r\\n and bare \\r (the regression the
    reference tests at ck-engine/src/lib.rs:1599-1658)."""
    out = []
    pos = 0
    parts = _LINE_SPLIT.split(text)
    # parts alternates [line, ending, line, ending, ..., last_line]
    for i in range(0, len(parts), 2):
        line = parts[i]
        ending = parts[i + 1] if i + 1 < len(parts) else ""
        b_line = len(line.encode("utf-8"))
        b_end = len(ending.encode("utf-8"))
        if i + 1 < len(parts) or line != "":
            out.append((pos, pos + b_line + b_end, line))
        pos += b_line + b_end
    return out


def chunk_text(
    text: str,
    max_tokens: int = DEFAULT_MAX_TOKENS,
    overlap_lines: int = DEFAULT_OVERLAP_LINES,
) -> list[Chunk]:
    """Fixed line windows with overlap; window = max_tokens/10 lines."""
    if not text:
        return []
    lines = split_lines_with_offsets(text)
    data = text.encode("utf-8")  # encode once, slice per chunk
    window = max(1, max_tokens // TOKENS_PER_LINE)
    step = max(1, window - overlap_lines)
    chunks: list[Chunk] = []
    i = 0
    cid = 0
    n = len(lines)
    while i < n:
        j = min(i + window, n)
        b0 = lines[i][0]
        b1 = lines[j - 1][1]
        ctext = data[b0:b1].decode("utf-8")
        chunks.append(
            Chunk(
                chunk_id=cid,
                byte_start=b0,
                byte_end=b1,
                line_start=i + 1,
                line_end=j,
                text=ctext,
                estimated_tokens=estimate_tokens(ctext),
            )
        )
        cid += 1
        if j >= n:
            break
        i += step
    return chunks


CHUNK_STRUCT = StructType(
    [
        StructField("chunk_id", IntegerType()),
        StructField("byte_start", LongType()),
        StructField("byte_end", LongType()),
        StructField("line_start", IntegerType()),
        StructField("line_end", IntegerType()),
        StructField("text", StringType()),
        StructField("estimated_tokens", IntegerType()),
    ]
)


def chunks_udf(max_tokens: int = DEFAULT_MAX_TOKENS,
               overlap_lines: int = DEFAULT_OVERLAP_LINES):
    @F.pandas_udf(ArrayType(CHUNK_STRUCT))
    def _udf(s: pd.Series) -> pd.Series:
        return s.fillna("").map(
            lambda t: [c.__dict__ for c in chunk_text(t, max_tokens, overlap_lines)]
        )

    return _udf


def chunk_corpus(
    corpus: DataFrame,
    max_tokens: int = DEFAULT_MAX_TOKENS,
    overlap_lines: int = DEFAULT_OVERLAP_LINES,
) -> DataFrame:
    """corpus -> chunks table (SURVEY §1.1 Chunk): one row per chunk with
    byte/line span, text, token estimate; doc identity carried through."""
    from ck_spark.index.builder import doc_id_expr

    return (
        corpus.withColumn("doc_id", doc_id_expr())
        .select(
            "doc_id", "repo", "path", "lang",
            F.explode(chunks_udf(max_tokens, overlap_lines)("content")).alias("c"),
        )
        .select("doc_id", "repo", "path", "lang", "c.*")
    )
