"""Segment-local BM25 scoring kernels (numpy; run inside applyInPandas).

Three rank-identical strategies, selected per segment:

- ``exhaustive``: vectorized document-at-a-time union scoring. Decodes all
  blocks, accumulates per-doc scores with np.add.at over the union index,
  top-k via argpartition. Optimal when the segment's posting mass is small
  or the query is broad (most blocks would be touched anyway).

- ``wand``: block-max WAND. Blocks are visited in descending optimistic
  bound; a block is decoded only while its bound can beat the running
  top-k floor θ. Fully vectorized: blocks are decoded in batches and
  merged into a sorted numpy accumulator (no per-posting Python loop).
  Wins when lists are long and k is small — the 10^12-doc regime.

- ``maxscore``: term-at-a-time MaxScore. Terms are processed in
  descending max-contribution order; once the remaining terms' summed
  upper bound falls below θ they become NON-ESSENTIAL — they can no
  longer lift an unseen doc into the top-k, so their lists are consulted
  only to complete the scores of surviving candidates, decoding only the
  blocks that contain a candidate (block_last navigation). Covers the
  broad-OR / larger-k regime where WAND's per-block floor rises too
  slowly to skip anything.

All three implement the Lucene/tantivy BM25:
  idf(t)  = ln(1 + (N − df + 0.5)/(df + 0.5))
  s(t, d) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
matching the reference's scoring (tantivy 0.24 defaults; SURVEY.md §2.4 A1).

Conjunctive (AND) mode intersects doc-id lists with galloping
searchsorted before scoring — ck delegates Boolean semantics to tantivy's
QueryParser; the north rule makes intersection an explicit operator
(SURVEY.md §2.3 J4).
"""

from __future__ import annotations

import numpy as np

from ck_spark.codec import (
    decode_all_blocks,
    decode_all_u32_blocks,
    decode_positions_block,
    decode_posting_ids,
    decode_u32s,
)

# Stored block_max values are float32 (round-to-nearest can land BELOW the
# true float64 maximum); scale every upper bound up by a margin comfortably
# above float32's 2^-24 relative error so pruning stays sound even for
# indexes built before the codec's round-up fix. Costs at most a handful of
# extra block decodes per query.
_UB_SAFETY = 1.0 + 1e-6

_WAND_BATCH = 64  # blocks decoded per accumulator merge


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


def _scaled_ubs(row: dict, w: float, avgdl: float) -> np.ndarray:
    """idf-scaled per-block score upper bounds, corrected for avgdl drift.

    Incremental updates re-encode segments under the then-current avgdl;
    stored bounds stay sound under a grown avgdl when scaled by the ratio
    (partial(avgdl·r) <= r·partial(avgdl) for r >= 1)."""
    ubs = w * np.asarray(row["block_max"], dtype=np.float64)
    enc = float(row.get("avgdl_enc") or avgdl)
    if enc > 0 and avgdl > enc:
        ubs = ubs * (avgdl / enc)
    return ubs * _UB_SAFETY


class TermDecodeCache:
    """Per-TASK memo of fully-decoded posting lists, keyed by term.

    The batch scorer (BM25Index.search_many) scores every plan against
    the same segment's term rows; without a cache a term shared by Q
    plans pays Q varint decodes of the same blocks — the repeated DRAM
    traffic VERDICT r4 'What's wrong' #3 flagged in the query-scaling
    sweep. The caller seeds terms used by >=2 plans once
    (`_raw_decode`); the block-selective kernels (WAND / MaxScore
    completion) then SLICE the cached flat arrays per block instead of
    re-decoding, and single-use terms keep their lazy block-skipping
    path untouched. Cached arrays are treated as immutable by every
    kernel (filters copy via boolean indexing). Lifetime is one
    score_segment call, so memory is bounded by one segment-group's
    decoded unions — the same bound the exhaustive scorer already had."""

    __slots__ = ("block_size", "store")

    def __init__(self, block_size: int):
        self.block_size = int(block_size)
        self.store: dict = {}

    def get(self, term: str):
        return self.store.get(term)

    def block(self, term: str, j: int):
        """Slice block j of a cached term, or None if not cached."""
        hit = self.store.get(term)
        if hit is None:
            return None
        ids, tfs, dls = hit
        s, e = j * self.block_size, (j + 1) * self.block_size
        return ids[s:e], tfs[s:e], dls[s:e]


def _raw_decode(row: dict, cache: TermDecodeCache | None = None):
    """Full unfiltered decode of one term row, memoized when a cache is
    supplied. Returned arrays are shared on cache hits — callers must
    not mutate them (all kernels are read-only on decoded inputs)."""
    if cache is not None:
        hit = cache.get(row["term"])
        if hit is not None:
            return hit
    ids = decode_all_blocks(row["ids_blocks"]).astype(np.int64)
    tfs = decode_all_u32_blocks(row["tfs_blocks"])
    dls = decode_all_u32_blocks(row["dls_blocks"])
    if cache is not None:
        cache.store[row["term"]] = (ids, tfs, dls)
    return ids, tfs, dls


def _decode_term(row: dict, allowed: np.ndarray | None,
                 banned: np.ndarray | None = None,
                 cache: TermDecodeCache | None = None):
    ids, tfs, dls = _raw_decode(row, cache)
    ids, (tfs, dls) = _scope_filter(ids, [tfs, dls], allowed)
    if banned is not None and banned.size:
        ids, (tfs, dls) = _exclude(ids, [tfs, dls], banned)
    return ids, tfs, dls


def _merge_acc(acc_ids, acc_scores, new_ids, new_contrib):
    """Merge (ids, contrib) postings into a unique-id accumulator —
    vectorized replacement for the per-posting dict loop."""
    ids = np.concatenate([acc_ids, new_ids])
    sc = np.concatenate([acc_scores, new_contrib])
    uids, inv = np.unique(ids, return_inverse=True)
    out = np.zeros(uids.size)
    np.add.at(out, inv, sc)
    return uids, out


def _theta(scores: np.ndarray, k: int) -> float:
    if scores.size < k:
        return -np.inf
    return float(np.partition(scores, scores.size - k)[scores.size - k])


def score_exhaustive_or(term_rows: list[dict], idfs: dict, avgdl: float,
                        k1: float, b: float, k: int,
                        allowed: np.ndarray | None = None,
                        banned: np.ndarray | None = None,
                        cache: TermDecodeCache | None = None):
    """term_rows: [{term, ids_blocks, tfs_blocks, dls_blocks}, ...]

    `banned` (all kernels): sorted doc ids excluded at decode time — the
    LSM tombstone set for this (gen, seg) group (index/lsm.py). Filtering
    BEFORE top-k selection keeps ranks identical to an index that never
    contained the dead versions; asserted in tests/test_lsm_update.py."""
    all_ids, all_contrib = [], []
    for row in term_rows:
        ids, tfs, dls = _decode_term(row, allowed, banned, cache)
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
              allowed: np.ndarray | None = None,
              banned: np.ndarray | None = None,
              cache: TermDecodeCache | None = None):
    """Conjunctive: galloping intersection (smallest list drives; larger
    lists probed via np.searchsorted), block-skip implicit because only
    blocks containing candidates need decoding — with list-level decode
    here since candidate sets shrink monotonically."""
    if not term_rows:
        return np.empty(0, dtype=np.int64), np.empty(0)
    decoded = []
    for row in term_rows:
        ids, tfs, dls = _raw_decode(row, cache)
        decoded.append((row["term"], ids, tfs, dls))
    decoded.sort(key=lambda t: t[1].size)
    cand = decoded[0][1]
    if allowed is not None:
        cand, _ = _scope_filter(cand, [], allowed)
    if banned is not None and banned.size:
        # excluding from the driving candidate list suffices: later probes
        # only ever shrink it
        cand, _ = _exclude(cand, [], banned)
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
                  allowed: np.ndarray | None = None,
                  banned: np.ndarray | None = None,
                  cache: TermDecodeCache | None = None):
    """Block-max WAND over independently-decodable blocks, vectorized.

    A block's optimistic bound is its own idf·block_max plus every other
    query term's global max contribution — static, so the visit order is
    one descending argsort (no priority queue). Blocks are decoded in
    batches of _WAND_BATCH and merged into a sorted numpy accumulator;
    θ = k-th largest accumulated (partial) score refreshes per batch.
    Stop when the next unvisited block's bound < θ.

    Soundness of the early exit: partial scores are lower bounds, so θ
    only underestimates the true k-th score; a skipped block's bound < θ
    implies every doc in it has true score < θ. A doc whose partial score
    reaches θ provably has all of its blocks decoded (otherwise the skipped
    block's bound would exceed θ), so every returned score is exact and
    rank-identical to the exhaustive strategy — asserted in tests.
    Batching only ever decodes a superset of the one-at-a-time schedule,
    so it cannot break the invariant."""
    if not term_rows:
        return np.empty(0, dtype=np.int64), np.empty(0)
    per_term = []
    for row in term_rows:
        w = idfs[row["term"]]
        per_term.append((row, w, _scaled_ubs(row, w, avgdl)))
    max_ub = np.array(
        [float(ubs.max()) if ubs.size else 0.0 for _, _, ubs in per_term]
    )
    total_ub = float(max_ub.sum())

    # flat static block table: (bound desc) visit order
    b_ti = np.concatenate(
        [np.full(ubs.size, ti, dtype=np.int32) for ti, (_, _, ubs) in enumerate(per_term)]
    ) if per_term else np.empty(0, dtype=np.int32)
    b_j = np.concatenate(
        [np.arange(ubs.size, dtype=np.int32) for _, _, ubs in per_term]
    ) if per_term else np.empty(0, dtype=np.int32)
    b_bound = np.concatenate(
        [ubs + (total_ub - max_ub[ti]) for ti, (_, _, ubs) in enumerate(per_term)]
    ) if per_term else np.empty(0)
    order = np.argsort(-b_bound, kind="stable")
    b_ti, b_j, b_bound = b_ti[order], b_j[order], b_bound[order]

    acc_ids = np.empty(0, dtype=np.int64)
    acc_scores = np.empty(0)
    pos, nblocks = 0, b_bound.size
    while pos < nblocks:
        th = _theta(acc_scores, k)
        if b_bound[pos] < th:
            break  # bounds are descending: nothing left can beat the floor
        end = min(pos + _WAND_BATCH, nblocks)
        # only blocks in this batch that still beat θ (batch tail may not)
        batch = np.flatnonzero(b_bound[pos:end] >= th) + pos
        new_ids, new_contrib = [], []
        for bi in batch:
            row, w, _ = per_term[b_ti[bi]]
            j = int(b_j[bi])
            hit = cache.block(row["term"], j) if cache is not None else None
            if hit is not None:
                ids, tfs, dls = hit
            else:
                ids = decode_posting_ids(row["ids_blocks"][j]).astype(np.int64)
                tfs = decode_u32s(row["tfs_blocks"][j])
                dls = decode_u32s(row["dls_blocks"][j])
            ids, (tfs, dls) = _scope_filter(ids, [tfs, dls], allowed)
            if banned is not None and banned.size:
                # a banned doc's block bound overestimates — sound (bounds
                # may only overestimate); the doc itself never accumulates
                ids, (tfs, dls) = _exclude(ids, [tfs, dls], banned)
            if ids.size:
                new_ids.append(ids)
                new_contrib.append(w * _partial(tfs, dls, avgdl, k1, b))
        if new_ids:
            acc_ids, acc_scores = _merge_acc(
                acc_ids, acc_scores,
                np.concatenate(new_ids), np.concatenate(new_contrib),
            )
        pos = end
    return _topk(acc_ids, acc_scores, k)


def score_maxscore_or(term_rows: list[dict], idfs: dict, avgdl: float,
                      k1: float, b: float, k: int,
                      allowed: np.ndarray | None = None,
                      banned: np.ndarray | None = None,
                      cache: TermDecodeCache | None = None):
    """Term-at-a-time MaxScore (Turtle & Flood's essential-list pruning,
    re-expressed over the block codec).

    Phase 1 — seed: process terms in descending max-contribution order,
    fully decoding each list into the accumulator, until the REMAINING
    terms' summed upper bound (`tail`) drops below θ (k-th largest
    accumulated partial score). At that point no doc outside the
    accumulator can reach the top-k (its score ≤ tail < θ ≤ final k-th).

    Phase 2 — complete: candidates are accumulated docs with
    score + tail ≥ θ. Each non-essential term contributes only to
    candidates, so only the blocks containing a candidate are decoded
    (block_last navigation). tail shrinks and θ rises after each term,
    re-pruning candidates.

    Exactness: every pruned doc's total is strictly below the final k-th
    score (see inequalities above), and every surviving candidate's score
    is completed exactly — so results are rank- and score-identical to
    exhaustive, asserted in tests."""
    if not term_rows:
        return np.empty(0, dtype=np.int64), np.empty(0)
    per_term = []
    for row in term_rows:
        w = idfs[row["term"]]
        ubs = _scaled_ubs(row, w, avgdl)
        per_term.append((row, w, float(ubs.max()) if ubs.size else 0.0))
    per_term.sort(key=lambda t: -t[2])
    maxes = np.array([m for _, _, m in per_term])
    # suffix[i] = sum of max contributions of terms i.. (upper bound on
    # what the not-yet-processed terms can add to any single doc)
    suffix = np.concatenate([np.cumsum(maxes[::-1])[::-1], [0.0]])

    acc_ids = np.empty(0, dtype=np.int64)
    acc_scores = np.empty(0)
    split = len(per_term)
    for i, (row, w, _) in enumerate(per_term):
        th = _theta(acc_scores, k)
        if suffix[i] < th:
            split = i
            break
        ids, tfs, dls = _decode_term(row, allowed, banned, cache)
        if ids.size:
            acc_ids, acc_scores = _merge_acc(
                acc_ids, acc_scores, ids, w * _partial(tfs, dls, avgdl, k1, b)
            )

    if split == len(per_term):  # every term was essential
        return _topk(acc_ids, acc_scores, k)

    # completion phase needs no banned filter: it only ADDS contributions
    # to candidates already present in the (banned-filtered) seed

    cand_ids, cand_scores = acc_ids, acc_scores
    for i in range(split, len(per_term)):
        th = _theta(cand_scores, k)
        tail = suffix[i]
        keep = cand_scores + tail >= th
        cand_ids, cand_scores = cand_ids[keep], cand_scores[keep]
        if cand_ids.size == 0:
            break
        row, w, _ = per_term[i]
        block_last = np.asarray(row["block_last"], dtype=np.int64)
        # the only block that can contain doc d is the first with last >= d
        bsel = np.searchsorted(block_last, cand_ids)
        bsel = np.unique(bsel[bsel < block_last.size])
        for j in bsel:
            j = int(j)
            hit_c = cache.block(row["term"], j) if cache is not None else None
            if hit_c is not None:
                ids, tfs, dls = hit_c
            else:
                ids = decode_posting_ids(row["ids_blocks"][j]).astype(np.int64)
                tfs = decode_u32s(row["tfs_blocks"][j])
                dls = decode_u32s(row["dls_blocks"][j])
            pos = np.searchsorted(ids, cand_ids)
            pos_c = np.minimum(pos, ids.size - 1)
            hit = ids[pos_c] == cand_ids
            if hit.any():
                # cand_scores is a fresh copy (boolean `keep` indexing), so
                # in-place accumulation across this term's blocks is safe
                contrib = w * _partial(tfs[pos_c[hit]], dls[pos_c[hit]], avgdl, k1, b)
                cand_scores[hit] += contrib
    return _topk(cand_ids, cand_scores, k)


_POS_SHIFT = np.int64(32)  # doc-key | position packing (positions < 2^32)


def _position_keys(row: dict, ids: np.ndarray, tfs: np.ndarray,
                   cand: np.ndarray, block_size: int) -> np.ndarray:
    """Packed (candidate_index << 32 | token_position) keys for the
    candidate docs' occurrences of this term — sorted ascending by
    construction (cand is sorted, positions increase within a doc).

    Decodes ONLY the position blocks that contain a candidate (block_last
    navigation, like MaxScore's completion phase): at 10^12 docs a phrase's
    rare term shrinks the candidate set first, so the common term's huge
    positions stream is mostly skipped."""
    block_last = np.asarray(row["block_last"], dtype=np.int64)
    n = ids.size
    doc_block = np.searchsorted(block_last, cand)
    cand_idx = np.arange(cand.size, dtype=np.int64)
    parts = []
    for j in np.unique(doc_block):
        j = int(j)
        lo, hi = j * block_size, min((j + 1) * block_size, n)
        tfs_b = tfs[lo:hi]
        flat_b = decode_positions_block(row["pos_blocks"][j], tfs_b)
        starts_b = np.concatenate([[0], np.cumsum(tfs_b)[:-1]])
        mask = doc_block == j
        c, ci = cand[mask], cand_idx[mask]
        sel = np.searchsorted(ids[lo:hi], c)
        lens = tfs_b[sel]
        total = int(lens.sum())
        cum0 = np.concatenate([[0], np.cumsum(lens)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(cum0, lens)
        pos_sel = flat_b[np.repeat(starts_b[sel], lens) + within]
        parts.append((np.repeat(ci, lens) << _POS_SHIFT) + pos_sel)
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(parts)


def phrase_match_ids(rows_by_term: dict, phrase: list[str], block_size: int,
                     restrict: np.ndarray | None = None) -> np.ndarray:
    """Sorted doc ids in this segment whose token stream contains the
    phrase's terms ADJACENTLY, resolved purely from the positions index
    (no corpus access — the rebuild of tantivy PhraseQuery evaluation,
    ck-engine/src/lib.rs:765-775).

    Algorithm: intersect the phrase terms' doc lists (galloping), then run
    the classic positional intersection S := (S + 1) ∩ positions(t_i) over
    packed (doc, position) keys — fully vectorized across all candidate
    docs at once. `restrict` (sorted ids) pre-narrows the candidates."""
    rows = [rows_by_term.get(t) for t in phrase]
    if any(r is None for r in rows):
        return np.empty(0, dtype=np.int64)
    decoded = []
    cache: dict[int, tuple] = {}  # repeated term in a phrase decodes once
    for r in rows:
        key = id(r)
        if key not in cache:
            ids = decode_all_blocks(r["ids_blocks"]).astype(np.int64)
            tfs = decode_all_u32_blocks(r["tfs_blocks"])
            cache[key] = (ids, tfs)
        decoded.append((r, *cache[key]))
    cand = decoded[0][1]
    if restrict is not None:
        cand, _ = _scope_filter(cand, [], restrict)
    for _, ids, _ in decoded[1:]:
        if cand.size == 0:
            break
        pos = np.searchsorted(ids, cand)
        pos_c = np.minimum(pos, ids.size - 1)
        cand = cand[ids[pos_c] == cand]
    if cand.size == 0:
        return np.empty(0, dtype=np.int64)
    s = None
    for r, ids, tfs in decoded:
        keys = _position_keys(r, ids, tfs, cand, block_size)
        if s is None:
            s = keys
        else:
            s = np.intersect1d(s + 1, keys, assume_unique=True)
            if s.size == 0:
                return np.empty(0, dtype=np.int64)
    matched = np.unique(s >> _POS_SHIFT)
    return cand[matched]


def phrase_allowed_ids(rows_by_term: dict, phrases: list[list[str]],
                       block_size: int,
                       allowed: np.ndarray | None = None) -> np.ndarray:
    """Docs matching EVERY phrase (AND across phrases), optionally further
    restricted to `allowed` — the index-only replacement for the corpus
    adjacency scan."""
    res = allowed
    for p in phrases:
        res = phrase_match_ids(rows_by_term, p, block_size, restrict=res)
        if res.size == 0:
            return res
    return res if res is not None else np.empty(0, dtype=np.int64)


def phrase_banned_ids(rows_by_term: dict, phrases: list[list[str]],
                      block_size: int) -> np.ndarray:
    """Union of docs matching ANY of the (negative) phrases — tantivy's
    MustNot(PhraseQuery) semantics: only docs containing the ADJACENT
    phrase are excluded, not docs containing the terms separately."""
    out = [phrase_match_ids(rows_by_term, p, block_size) for p in phrases]
    out = [o for o in out if o.size]
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(out))


def _decode_union_ids(rows: list[dict]) -> np.ndarray:
    """Sorted unique doc ids across all rows (the must_not exclusion set)."""
    if not rows:
        return np.empty(0, dtype=np.int64)
    ids = [decode_all_blocks(r["ids_blocks"]).astype(np.int64) for r in rows]
    return np.unique(np.concatenate(ids)) if ids else np.empty(0, dtype=np.int64)


def _exclude(ids: np.ndarray, extras: list[np.ndarray], banned: np.ndarray):
    if banned.size == 0 or ids.size == 0:
        return ids, extras
    pos = np.searchsorted(banned, ids)
    pos_c = np.minimum(pos, banned.size - 1)
    keep = banned[pos_c] != ids
    return ids[keep], [e[keep] for e in extras]


def score_boolean(must_rows: list[dict], should_rows: list[dict],
                  not_rows: list[dict], idfs: dict, avgdl: float,
                  k1: float, b: float, k: int,
                  allowed: np.ndarray | None = None,
                  banned: np.ndarray | None = None,
                  cache: TermDecodeCache | None = None):
    """tantivy BooleanQuery semantics (the reference's +term / -term /
    bare-term grammar, QueryParser at ck-engine/src/lib.rs:765-768):
    a doc matches iff it contains EVERY must term, NO must_not term, and —
    when no must clauses exist — at least one should term; its score is
    the BM25 sum over the matching must+should clauses (must_not never
    contributes). `banned` is an extra pre-computed exclusion set (sorted
    ids) — the negative-phrase match set. Built from the same
    intersection/union kernels as the and/or strategies, so scores are
    identical to those paths for pure queries."""
    term_banned = _decode_union_ids(not_rows)
    if banned is not None and banned.size:
        term_banned = np.union1d(term_banned, banned)
    banned = term_banned
    if must_rows:
        decoded = []
        for row in must_rows:
            ids, tfs, dls = _decode_term(row, allowed, cache=cache)
            decoded.append((row["term"], ids, tfs, dls))
        decoded.sort(key=lambda t: t[1].size)
        cand = decoded[0][1]
        for _, ids, _, _ in decoded[1:]:
            if cand.size == 0:
                break
            pos = np.searchsorted(ids, cand)
            pos_c = np.minimum(pos, ids.size - 1)
            cand = cand[ids[pos_c] == cand]
        cand, _ = _exclude(cand, [], banned)
        if cand.size == 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        scores = np.zeros(cand.size)
        for term, ids, tfs, dls in decoded:
            pos = np.searchsorted(ids, cand)
            scores += idfs[term] * _partial(tfs[pos], dls[pos], avgdl, k1, b)
        for row in should_rows:
            ids, tfs, dls = _decode_term(row, allowed, cache=cache)
            if ids.size == 0:
                continue
            pos = np.searchsorted(ids, cand)
            pos_c = np.minimum(pos, ids.size - 1)
            hit = ids[pos_c] == cand
            if hit.any():
                scores[hit] += idfs[row["term"]] * _partial(
                    tfs[pos_c[hit]], dls[pos_c[hit]], avgdl, k1, b
                )
        return _topk(cand, scores, k)
    if not should_rows:
        return np.empty(0, dtype=np.int64), np.empty(0)
    all_ids, all_contrib = [], []
    for row in should_rows:
        ids, tfs, dls = _decode_term(row, allowed, cache=cache)
        ids, (tfs, dls) = _exclude(ids, [tfs, dls], banned)
        all_ids.append(ids)
        all_contrib.append(idfs[row["term"]] * _partial(tfs, dls, avgdl, k1, b))
    ids = np.concatenate(all_ids) if all_ids else np.empty(0, dtype=np.int64)
    contrib = np.concatenate(all_contrib) if all_contrib else np.empty(0)
    if ids.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0)
    uids, inv = np.unique(ids, return_inverse=True)
    scores = np.zeros(uids.size)
    np.add.at(scores, inv, contrib)
    return _topk(uids, scores, k)
