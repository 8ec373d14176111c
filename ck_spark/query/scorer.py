"""Segment-local BM25 scoring kernels (numpy; run inside applyInPandas).

Two rank-identical strategies, selected per segment:

- ``exhaustive``: vectorized document-at-a-time union scoring. Decodes all
  blocks, accumulates per-doc scores with np.add.at over the union index,
  top-k via argpartition. Optimal when the segment's posting mass is small
  or the query is broad (most blocks would be touched anyway).

- ``wand``: block-max WAND. Maintains the running top-k floor θ; decodes a
  block only when the sum of the participating terms' block-max upper
  bounds (idf · stored idf-independent factor) can beat θ. Wins when lists
  are long and k is small — the 10^12-doc regime.

Both implement the Lucene/tantivy BM25:
  idf(t)  = ln(1 + (N − df + 0.5)/(df + 0.5))
  s(t, d) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
matching the reference's scoring (tantivy 0.24 defaults; SURVEY.md §2.4 A1).

Conjunctive (AND) mode intersects doc-id lists with galloping
searchsorted before scoring — ck delegates Boolean semantics to tantivy's
QueryParser; the north rule makes intersection an explicit operator
(SURVEY.md §2.3 J4).
"""

from __future__ import annotations

import heapq

import numpy as np

from ck_spark.codec import (
    decode_all_blocks,
    decode_all_u32_blocks,
    decode_posting_ids,
    decode_u32s,
)


def idf(n_docs: int, df: np.ndarray | float) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _partial(tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    tfs = tfs.astype(np.float64)
    denom = tfs + k1 * (1.0 - b + b * dls.astype(np.float64) / max(avgdl, 1e-12))
    return tfs * (k1 + 1.0) / denom


def _topk(ids: np.ndarray, scores: np.ndarray, k: int):
    """Exact top-k by (score desc, doc_id asc)."""
    if ids.size == 0:
        return ids.astype(np.int64), scores
    if ids.size > k:
        # partition to find the k-th score, then order exactly among all
        # candidates at-or-above it (covers boundary ties deterministically)
        kth = np.partition(-scores, k - 1)[k - 1]
        cand = np.flatnonzero(-scores <= kth + 1e-12)
        order = np.lexsort((ids[cand], -scores[cand]))[:k]
        sel = cand[order]
    else:
        sel = np.lexsort((ids, -scores))
    return ids[sel].astype(np.int64), scores[sel]


def _scope_filter(ids: np.ndarray, extras: list[np.ndarray], allowed: np.ndarray | None):
    """Keep only ids present in the sorted `allowed` array (path-scope
    restriction, SURVEY §2.2 F3/F7). None = unscoped."""
    if allowed is None or ids.size == 0:
        return ids, extras
    if allowed.size == 0:
        empty = ids[:0]
        return empty, [e[:0] for e in extras]
    pos = np.searchsorted(allowed, ids)
    pos_c = np.minimum(pos, allowed.size - 1)
    keep = allowed[pos_c] == ids
    return ids[keep], [e[keep] for e in extras]


def score_exhaustive_or(term_rows: list[dict], idfs: dict, avgdl: float,
                        k1: float, b: float, k: int,
                        allowed: np.ndarray | None = None):
    """term_rows: [{term, ids_blocks, tfs_blocks, dls_blocks}, ...]"""
    all_ids, all_contrib = [], []
    for row in term_rows:
        ids = decode_all_blocks(row["ids_blocks"]).astype(np.int64)
        tfs = decode_all_u32_blocks(row["tfs_blocks"])
        dls = decode_all_u32_blocks(row["dls_blocks"])
        ids, (tfs, dls) = _scope_filter(ids, [tfs, dls], allowed)
        w = idfs[row["term"]]
        all_ids.append(ids)
        all_contrib.append(w * _partial(tfs, dls, avgdl, k1, b))
    if not all_ids:
        return np.empty(0, dtype=np.int64), np.empty(0)
    ids = np.concatenate(all_ids)
    contrib = np.concatenate(all_contrib)
    uids, inv = np.unique(ids, return_inverse=True)
    scores = np.zeros(uids.size)
    np.add.at(scores, inv, contrib)
    return _topk(uids, scores, k)


def score_and(term_rows: list[dict], idfs: dict, avgdl: float,
              k1: float, b: float, k: int,
              allowed: np.ndarray | None = None):
    """Conjunctive: galloping intersection (smallest list drives; larger
    lists probed via np.searchsorted), block-skip implicit because only
    blocks containing candidates need decoding — with list-level decode
    here since candidate sets shrink monotonically."""
    if not term_rows:
        return np.empty(0, dtype=np.int64), np.empty(0)
    decoded = []
    for row in term_rows:
        ids = decode_all_blocks(row["ids_blocks"]).astype(np.int64)
        tfs = decode_all_u32_blocks(row["tfs_blocks"])
        dls = decode_all_u32_blocks(row["dls_blocks"])
        decoded.append((row["term"], ids, tfs, dls))
    decoded.sort(key=lambda t: t[1].size)
    cand = decoded[0][1]
    if allowed is not None:
        cand, _ = _scope_filter(cand, [], allowed)
    for _, ids, _, _ in decoded[1:]:
        if cand.size == 0:
            break
        pos = np.searchsorted(ids, cand)
        pos_clip = np.minimum(pos, ids.size - 1)
        cand = cand[ids[pos_clip] == cand]
    if cand.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0)
    scores = np.zeros(cand.size)
    for term, ids, tfs, dls in decoded:
        pos = np.searchsorted(ids, cand)
        scores += idfs[term] * _partial(tfs[pos], dls[pos], avgdl, k1, b)
    return _topk(cand, scores, k)


def score_wand_or(term_rows: list[dict], idfs: dict, avgdl: float,
                  k1: float, b: float, k: int,
                  allowed: np.ndarray | None = None):
    """Block-max WAND over independently-decodable blocks.

    Visit blocks in descending optimistic bound, where a block's bound is
    its own idf·block_max plus every other query term's global max
    contribution. Maintain θ = k-th largest accumulated (partial) score.
    Stop when no remaining block's bound can beat θ.

    Soundness of the early exit: partial scores are lower bounds, so θ
    only underestimates the true k-th score; a skipped block's bound < θ
    implies every doc in it has true score < θ. A doc whose partial score
    reaches θ provably has all of its blocks decoded (otherwise the skipped
    block's bound would exceed θ), so every returned score is exact and
    rank-identical to the exhaustive strategy — asserted in tests."""
    if not term_rows:
        return np.empty(0, dtype=np.int64), np.empty(0)
    per_term = []
    for row in term_rows:
        w = idfs[row["term"]]
        ubs = w * np.asarray(row["block_max"], dtype=np.float64)
        # Incremental updates re-encode segments under the then-current
        # avgdl; stored bounds stay sound under a grown avgdl when scaled
        # by the ratio (partial(avgdl·r) <= r·partial(avgdl) for r >= 1).
        enc = float(row.get("avgdl_enc") or avgdl) if isinstance(row, dict) else avgdl
        if enc > 0 and avgdl > enc:
            ubs = ubs * (avgdl / enc)
        per_term.append((row, w, ubs))
    max_ub = [float(ubs.max()) if ubs.size else 0.0 for _, _, ubs in per_term]

    # heap of candidate blocks across terms ordered by optimistic bound
    heap = []
    for ti, (row, w, ubs) in enumerate(per_term):
        others = sum(max_ub) - max_ub[ti]
        for j, ub in enumerate(ubs):
            heapq.heappush(heap, (-(ub + others), ti, j))

    acc: dict[int, float] = {}
    topk: list[float] = []  # min-heap of current top-k scores

    def theta() -> float:
        return topk[0] if len(topk) >= k else -np.inf

    decoded_blocks = set()
    while heap:
        neg_bound, ti, j = heapq.heappop(heap)
        if -neg_bound < theta():
            break  # no remaining block can beat the floor
        if (ti, j) in decoded_blocks:
            continue
        decoded_blocks.add((ti, j))
        row, w, _ = per_term[ti]
        ids = decode_posting_ids(row["ids_blocks"][j]).astype(np.int64)
        tfs = decode_u32s(row["tfs_blocks"][j])
        dls = decode_u32s(row["dls_blocks"][j])
        ids, (tfs, dls) = _scope_filter(ids, [tfs, dls], allowed)
        contrib = w * _partial(tfs, dls, avgdl, k1, b)
        for d, c in zip(ids.tolist(), contrib.tolist()):
            acc[d] = acc.get(d, 0.0) + c
        # refresh floor from accumulated exact-so-far scores (lower bounds)
        if len(acc) >= k:
            topk = heapq.nlargest(k, acc.values())
            heapq.heapify(topk)
    if not acc:
        return np.empty(0, dtype=np.int64), np.empty(0)
    ids = np.fromiter(acc.keys(), dtype=np.int64, count=len(acc))
    scores = np.fromiter(acc.values(), dtype=np.float64, count=len(acc))
    return _topk(ids, scores, k)
