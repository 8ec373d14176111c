"""Query-aware lexical proximity reranker — the T5 rerank slot, filled.

The reference reranks its top-k with a cross-encoder model
(ck-engine/src/semantic_v3.rs:230-291): rescore each (query, document)
pair, re-sort, re-cut to top_k.  Model inference is out of scope in this
container (SURVEY §7), so the built-in reranker is the classic lexical
proximity family instead (Rasolofo & Savoy, ECIR 2003 "Term Proximity
Scoring"; Buettcher/Clarke/Lushman, SIGIR 2006) over the SAME tokenizer
the index uses:

  coverage  = |distinct query terms present in doc| / |distinct query terms|
  proximity = 1 / (1 + min_span)  where min_span is the smallest token
              window containing every PRESENT query term at least once
              (0 when fewer than two distinct terms are present)
  phrase    = 1 if all query terms occur adjacent, in order

  score' = score * (1 + W_COV*coverage + W_PROX*proximity + W_PHRASE*phrase)

Multiplicative blending keeps BM25 as the base signal — a document is
only ever boosted by positional evidence, never zeroed by its absence —
and the whole thing is deterministic, so the retrieval-quality harness
can measure its effect per query class.  The kernel runs as an
Arrow-batched pandas UDF over the ≤k candidate texts (rerank operates on
an already-cut result set, exactly like the reference's reranker, which
scores only the fetched top-k documents).
"""

from __future__ import annotations

from typing import Dict, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ck_spark.tokenizer import term_positions_text, tokenize

W_COV = 0.5
W_PROX = 0.3
W_PHRASE = 0.2


def min_span(positions: List[List[int]]) -> int | None:
    """Smallest window (in token positions, inclusive span length minus
    one) containing at least one occurrence of every term.

    positions: one ascending position list per term (all non-empty).
    Returns None for <2 terms (span undefined), else the minimal
    ``max(chosen) - min(chosen)`` over one choice per term — the classic
    merged-sweep algorithm: walk the merged (pos, term) stream with a
    window that always advances its left edge while still covering all
    terms.
    """
    k = len(positions)
    if k < 2:
        return None
    merged = sorted(
        (p, t) for t, plist in enumerate(positions) for p in plist
    )
    need: Dict[int, int] = {}
    best = None
    left = 0
    covered = 0
    for right in range(len(merged)):
        t = merged[right][1]
        need[t] = need.get(t, 0) + 1
        if need[t] == 1:
            covered += 1
        while covered == k:
            span = merged[right][0] - merged[left][0]
            if best is None or span < best:
                best = span
            lt = merged[left][1]
            need[lt] -= 1
            if need[lt] == 0:
                covered -= 1
            left += 1
    return best


def _has_phrase(positions: List[List[int]]) -> bool:
    """True when the terms occur at consecutive positions in query order
    (positions are the index's gap numbering, so 'adjacent' here matches
    the phrase-query semantics of the positions postings)."""
    if len(positions) < 2:
        return False
    frontier = set(positions[0])  # positions of the last matched term
    for plist in positions[1:]:
        frontier = {p for p in plist if (p - 1) in frontier}
        if not frontier:
            return False
    return True


def proximity_boost_text(text: str, qterms: List[str], mode: str) -> float:
    """The per-document boost factor (>= 1.0)."""
    if not qterms:
        return 1.0
    posm = term_positions_text(text or "", mode=mode)
    present = [posm[t] for t in qterms if t in posm]
    coverage = len(present) / len(qterms)
    span = min_span(present) if len(present) >= 2 else None
    proximity = 1.0 / (1.0 + span) if span is not None else 0.0
    phrase = 1.0 if (
        len(present) == len(qterms) and len(qterms) >= 2
        and _has_phrase([posm[t] for t in qterms])
    ) else 0.0
    return 1.0 + W_COV * coverage + W_PROX * proximity + W_PHRASE * phrase


def proximity_rerank(
    results: DataFrame, query: str, k: int, mode: str = "code",
    text_col: str = "section", score_col: str = "score",
) -> DataFrame:
    """Rescore a fetched result frame with the proximity boost and re-cut
    to top-k — the drop-in strategy for the :func:`ck_spark.service.rerank`
    seam (replace-scores → re-sort → re-cut, semantic_v3.rs:270-280).

    ``results`` must carry a text column (``section`` / ``preview`` from
    ``fetch_search_results``) and the score column to blend with.
    """
    qterms = list(dict.fromkeys(tokenize(query, mode=mode)))

    @F.pandas_udf("double")
    def _boost(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: proximity_boost_text(t, qterms, mode)
        ).astype(float)

    return (
        results
        .withColumn(score_col, F.col(score_col) * _boost(F.col(text_col)))
        .orderBy(F.desc(score_col), F.asc("doc_id"))
        .limit(k)
    )
