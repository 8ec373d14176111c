"""Single-node pure-Python BM25 oracle.

Implements the exact scoring the engine must match (Lucene/tantivy form,
k1=1.2, b=0.75) over the same tokenizer module — the rank-identity oracle
demanded by SURVEY.md §5 / BASELINE.json (the Rust reference cannot run in
this sandbox; its scoring is tantivy's documented default, reproduced
here independently).
"""

from __future__ import annotations

import math

from ck_spark.constants import BM25_B, BM25_K1
from ck_spark.tokenizer import tokenize


def bm25_rank(
    docs: dict[int, str],
    query: str,
    k: int,
    mode: str = "or",
    tokenizer_mode: str = "code",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> list[tuple[int, float]]:
    """docs: doc_id -> content (binary docs must be pre-filtered by caller).
    Returns [(doc_id, score)] sorted by (-score, doc_id), length <= k."""
    toks = {d: tokenize(c, tokenizer_mode) for d, c in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / max(n, 1)
    q_terms = list(dict.fromkeys(tokenize(query, tokenizer_mode)))
    if not q_terms or n == 0:
        return []
    df = {t: sum(1 for ts in toks.values() if t in ts) for t in q_terms}
    idf = {
        t: math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
        for t in q_terms
        if df[t] > 0
    }
    scores: dict[int, float] = {}
    for d, ts in toks.items():
        dl = len(ts)
        matched = 0
        s = 0.0
        for t in q_terms:
            if t not in idf:
                continue
            tf = ts.count(t)
            if tf == 0:
                continue
            matched += 1
            s += idf[t] * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        if mode == "and":
            if matched == len(q_terms) and matched > 0:
                scores[d] = s
        elif matched > 0:
            scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
