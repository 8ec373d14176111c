"""Semantic heatmap scoring (X9): per-token similarity against the query,
bucketed into the reference's 8-step colour gradient.

Faithful rebuild of ck-core/src/heatmap.rs (the one display-layer
component the engine exposes as data): same bucket thresholds and RGB
table (heatmap.rs:17-62), same spacing/punctuation-preserving
tokenization (64-95 — colour output must line up with the original
text), same token-vs-pattern scoring ladder (97-131: exact 1.0, word
match 0.9, containment 0.6/0.5 scaled by length ratio, char-set fuzzy
×0.4) and char-set fuzzy similarity (133-147).

The Spark surface emits one row per token with (token, score, bucket,
r, g, b, bold) — a renderer applies the colours; the engine's job ends
at the data.
"""

from __future__ import annotations

import pandas as pd

_PUNCT = set("()[]{},;:.!?")
_WS = {" ", "\t", "\n"}

# bucket -> (threshold, rgb, bold); thresholds checked high→low
BUCKETS: list[tuple[float, tuple[int, int, int] | None, bool]] = [
    (0.875, (0, 255, 100), True),    # Step8
    (0.75, (0, 180, 80), False),     # Step7
    (0.625, (0, 160, 70), False),    # Step6
    (0.5, (0, 140, 60), False),      # Step5
    (0.375, (50, 120, 80), False),   # Step4
    (0.25, (100, 130, 100), False),  # Step3
    (0.125, (140, 140, 140), False), # Step2
]


def bucket_of(score: float) -> tuple[int, tuple[int, int, int] | None, bool]:
    """(step 0..8, rgb or None, bold) for a similarity score
    (HeatmapBucket::from_score/rgb/is_bold, heatmap.rs:17-62)."""
    for i, (thr, rgb, bold) in enumerate(BUCKETS):
        if score >= thr:
            return 8 - i, rgb, bold
    if score > 0.0:
        return 1, (180, 180, 180), False  # Step1
    return 0, None, False  # None bucket


def split_into_tokens(text: str) -> list[str]:
    """Spacing- and punctuation-preserving tokenization (heatmap.rs:64-95):
    every whitespace char and bracket/punct is its own token so coloured
    output aligns byte-for-byte with the input."""
    tokens: list[str] = []
    cur: list[str] = []
    for ch in text:
        if ch in _WS or ch in _PUNCT:
            if cur:
                tokens.append("".join(cur))
                cur = []
            tokens.append(ch)
        else:
            cur.append(ch)
    if cur:
        tokens.append("".join(cur))
    return tokens


def _fuzzy(s1: str, s2: str) -> float:
    if not s1 or not s2 or len(s1) < 3 or len(s2) < 3:
        return 0.0
    common = len(set(s1) & set(s2))
    return common / max(len(s1), len(s2))


def token_similarity(token: str, pattern: str) -> float:
    """heatmap.rs:97-131 — whitespace/punct score 0; exact pattern match
    1.0; per-word: exact 0.9, substring 0.6·ratio / 0.5·ratio, else
    char-set fuzzy ×0.4."""
    if not token.strip() or not any(c.isalnum() for c in token):
        return 0.0
    tl, pl = token.lower(), pattern.lower()
    if tl == pl:
        return 1.0
    best = 0.0
    for word in pl.split():
        if len(word) < 3:
            continue
        if tl == word:
            best = max(best, 0.9)
        elif word in tl:
            best = max(best, 0.6 * (len(word) / len(tl)))
        elif tl in word and len(tl) >= 3:
            best = max(best, 0.5 * (len(tl) / len(word)))
        else:
            best = max(best, _fuzzy(tl, word) * 0.4)
    return best


def heatmap_rows(text: str, pattern: str) -> list[dict]:
    """One dict per token: position, token, score, bucket, rgb, bold."""
    out = []
    for pos, tok in enumerate(split_into_tokens(text)):
        score = token_similarity(tok, pattern)
        step, rgb, bold = bucket_of(score)
        out.append({
            "pos": pos, "token": tok, "score": float(score), "bucket": step,
            "r": rgb[0] if rgb else None,
            "g": rgb[1] if rgb else None,
            "b": rgb[2] if rgb else None,
            "bold": bold,
        })
    return out


def heatmap(df, pattern: str, text_col: str = "content"):
    """Spark surface: explode each doc into per-token heatmap rows (Arrow
    pandas UDF — the scoring ladder is per-token Python by design, exactly
    like the reference's display pass; it runs over RESULT rows, which are
    top-k-bounded, never the corpus)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StructType

    row_t = StructType.fromDDL(
        "pos int, token string, score double, bucket int, "
        "r int, g int, b int, bold boolean"
    )

    @F.pandas_udf(ArrayType(row_t))
    def _udf(s: pd.Series) -> pd.Series:
        return s.fillna("").map(lambda t: heatmap_rows(t, pattern))

    keep = [c for c in df.columns if c != text_col]
    return (
        df.select(*keep, F.explode(_udf(F.col(text_col))).alias("t"))
        .select(*keep, "t.*")
    )
