"""Property tests of the numpy scoring kernels (no Spark needed):
exhaustive / WAND / MaxScore must be bit-identical on random posting sets,
including scope filtering and post-update avgdl drift."""

import numpy as np
import pytest

from ck_spark.codec import encode_posting_blocks
from ck_spark.query import scorer

K1, B = 1.2, 0.75


def _make_rows(rng, n_terms, n_docs, avgdl, block=8, avgdl_enc=None):
    rows, idfs = [], {}
    universe = np.sort(rng.choice(n_docs * 10, size=n_docs, replace=False))
    for t in range(n_terms):
        df = int(rng.integers(1, n_docs + 1))
        ids = np.sort(rng.choice(universe, size=df, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 12, size=df).astype(np.int64)
        dls = rng.integers(5, 300, size=df).astype(np.int64)
        enc = avgdl_enc if avgdl_enc is not None else avgdl
        blocks = encode_posting_blocks(ids, tfs, dls, enc, K1, B, block)
        rows.append({"term": f"t{t}", "n_docs": df, "avgdl_enc": enc, **blocks})
        idfs[f"t{t}"] = float(np.log(1.0 + (1000 - df + 0.5) / (df + 0.5)))
    return rows, idfs


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("k", [1, 3, 10, 100])
def test_strategies_identical_random(seed, k):
    rng = np.random.default_rng(seed)
    avgdl = 120.0
    rows, idfs = _make_rows(rng, n_terms=rng.integers(1, 6), n_docs=200, avgdl=avgdl)
    ex = scorer.score_exhaustive_or(rows, idfs, avgdl, K1, B, k)
    for fn in (scorer.score_wand_or, scorer.score_maxscore_or):
        got = fn(rows, idfs, avgdl, K1, B, k)
        np.testing.assert_array_equal(got[0], ex[0])
        np.testing.assert_allclose(got[1], ex[1], rtol=1e-12)


@pytest.mark.parametrize("seed", range(4))
def test_strategies_identical_with_scope(seed):
    rng = np.random.default_rng(100 + seed)
    avgdl = 80.0
    rows, idfs = _make_rows(rng, n_terms=4, n_docs=150, avgdl=avgdl)
    all_ids = np.unique(np.concatenate(
        [scorer.decode_all_blocks(r["ids_blocks"]) for r in rows]
    )).astype(np.int64)
    allowed = np.sort(rng.choice(all_ids, size=max(1, all_ids.size // 3), replace=False))
    ex = scorer.score_exhaustive_or(rows, idfs, avgdl, K1, B, 10, allowed)
    for fn in (scorer.score_wand_or, scorer.score_maxscore_or):
        got = fn(rows, idfs, avgdl, K1, B, 10, allowed)
        np.testing.assert_array_equal(got[0], ex[0])
        np.testing.assert_allclose(got[1], ex[1], rtol=1e-12)
    # returned docs are inside the scope
    assert np.isin(ex[0], allowed).all()


def test_strategies_identical_avgdl_drift():
    """Segments encoded under an older (smaller) avgdl: stored bounds are
    scaled up by the ratio — pruning must stay exact."""
    rng = np.random.default_rng(7)
    enc_avgdl, now_avgdl = 60.0, 95.0
    rows, idfs = _make_rows(rng, n_terms=3, n_docs=180, avgdl=now_avgdl,
                            avgdl_enc=enc_avgdl)
    ex = scorer.score_exhaustive_or(rows, idfs, now_avgdl, K1, B, 7)
    for fn in (scorer.score_wand_or, scorer.score_maxscore_or):
        got = fn(rows, idfs, now_avgdl, K1, B, 7)
        np.testing.assert_array_equal(got[0], ex[0])
        np.testing.assert_allclose(got[1], ex[1], rtol=1e-12)


def test_empty_and_degenerate():
    for fn in (scorer.score_exhaustive_or, scorer.score_wand_or,
               scorer.score_maxscore_or, scorer.score_and):
        ids, sc = fn([], {}, 50.0, K1, B, 10)
        assert ids.size == 0 and sc.size == 0


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("k", [1, 5, 50])
def test_decode_cache_identical(seed, k):
    """Every kernel must be bit-identical with a pre-seeded
    TermDecodeCache (the batch path seeds terms shared by >=2 queries;
    WAND/MaxScore then SLICE the cached flat arrays per block instead of
    decoding — slices must line up with block boundaries exactly)."""
    rng = np.random.default_rng(400 + seed)
    avgdl = 100.0
    block = 8
    rows, idfs = _make_rows(rng, n_terms=5, n_docs=250, avgdl=avgdl,
                            block=block)
    cache = scorer.TermDecodeCache(block)
    for r in rows:
        scorer._raw_decode(r, cache)
    all_ids = np.unique(np.concatenate(
        [scorer.decode_all_blocks(r["ids_blocks"]) for r in rows]
    )).astype(np.int64)
    allowed = np.sort(rng.choice(all_ids, size=max(1, all_ids.size // 2),
                                 replace=False))
    banned = np.sort(rng.choice(all_ids, size=max(1, all_ids.size // 5),
                                replace=False))
    for fn in (scorer.score_exhaustive_or, scorer.score_wand_or,
               scorer.score_maxscore_or, scorer.score_and):
        for al, bn in ((None, None), (allowed, None), (None, banned),
                       (allowed, banned)):
            base = fn(rows, idfs, avgdl, K1, B, k, al, bn)
            got = fn(rows, idfs, avgdl, K1, B, k, al, bn, cache=cache)
            np.testing.assert_array_equal(got[0], base[0])
            np.testing.assert_allclose(got[1], base[1], rtol=1e-12)


def test_decode_cache_boolean_identical():
    rng = np.random.default_rng(900)
    avgdl = 90.0
    rows, idfs = _make_rows(rng, n_terms=6, n_docs=200, avgdl=avgdl, block=8)
    cache = scorer.TermDecodeCache(8)
    for r in rows:
        scorer._raw_decode(r, cache)
    base = scorer.score_boolean(rows[:2], rows[2:4], rows[4:5], idfs,
                                avgdl, K1, B, 10)
    got = scorer.score_boolean(rows[:2], rows[2:4], rows[4:5], idfs,
                               avgdl, K1, B, 10, cache=cache)
    np.testing.assert_array_equal(got[0], base[0])
    np.testing.assert_allclose(got[1], base[1], rtol=1e-12)
