"""Proximity reranker (T5, query/rerank.py): kernel unit tests + the
end-to-end replace-scores/re-sort/re-cut contract over a real index."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ck_spark.query.rerank import (
    _has_phrase,
    min_span,
    proximity_boost_text,
    proximity_rerank,
    W_COV,
    W_PHRASE,
    W_PROX,
)


# -- min_span ----------------------------------------------------------------

def test_min_span_basic():
    # terms at [0, 10] and [3]: best window covers 0..3 -> span 3
    assert min_span([[0, 10], [3]]) == 3
    # adjacent
    assert min_span([[5], [6]]) == 1
    # same position (a term pair sharing a slot) -> span 0
    assert min_span([[4], [4]]) == 0


def test_min_span_three_terms():
    # classic sweep: [1, 100], [50], [51] -> 50..51..100 is 50 wide,
    # but nothing better on the left: best = max-min of {100,50,51} = 50
    assert min_span([[1, 100], [50], [51]]) == 50
    # add 49 to the first list -> 49..51 window, span 2
    assert min_span([[1, 49, 100], [50], [51]]) == 2


def test_min_span_undefined_for_single_term():
    assert min_span([[1, 2, 3]]) is None
    assert min_span([]) is None


def test_min_span_exhaustive_vs_bruteforce():
    import itertools
    import random

    rng = random.Random(7)
    for _ in range(50):
        k = rng.randint(2, 4)
        lists = [
            sorted(rng.sample(range(30), rng.randint(1, 4))) for _ in range(k)
        ]
        brute = min(
            max(c) - min(c) for c in itertools.product(*lists)
        )
        assert min_span(lists) == brute, lists


# -- phrase adjacency --------------------------------------------------------

def test_has_phrase_in_order_adjacent():
    assert _has_phrase([[3], [4], [5]])
    assert _has_phrase([[0, 9], [10]])


def test_has_phrase_rejects_gaps_and_reversals():
    assert not _has_phrase([[3], [5]])          # gap
    assert not _has_phrase([[4], [3]])          # reversed
    assert not _has_phrase([[0], [1], [3]])     # chain breaks at the end
    assert not _has_phrase([[1]])               # single term: no phrase


# -- boost factor ------------------------------------------------------------

def test_boost_ordering_adjacent_beats_scattered_beats_partial():
    q = ["alpha", "beta"]
    adjacent = proximity_boost_text("alpha beta gamma", q, "code")
    scattered = proximity_boost_text(
        "alpha one two three four five beta", q, "code")
    partial = proximity_boost_text("alpha only here", q, "code")
    none = proximity_boost_text("nothing relevant", q, "code")
    assert adjacent > scattered > partial > none == 1.0
    # adjacent pair: full coverage + span-1 proximity + phrase bonus
    assert adjacent == pytest.approx(
        1.0 + W_COV + W_PROX / 2.0 + W_PHRASE)


def test_boost_empty_query_or_text():
    assert proximity_boost_text("anything", [], "code") == 1.0
    assert proximity_boost_text("", ["alpha"], "code") == 1.0
    assert proximity_boost_text(None, ["alpha"], "code") == 1.0


def test_boost_uses_index_tokenizer_semantics():
    # camelCase splits: query terms hit inside identifiers, and matching
    # is case-folded — same tokenizer as the index (tokenizer.py)
    b = proximity_boost_text("def parseBuffer(x): pass",
                             ["parse", "buffer"], "code")
    assert b == pytest.approx(1.0 + W_COV + W_PROX / 2.0 + W_PHRASE)


# -- end-to-end over a real index ---------------------------------------------

@pytest.fixture(scope="module")
def rerank_service(spark, tmp_path_factory):
    """Corpus engineered so BM25 and proximity disagree: the 'spam' doc
    repeats both query terms far apart (tf wins BM25), the 'phrase' doc
    has them adjacent exactly once."""
    from ck_spark.service import CkService

    filler = " ".join(f"w{i:03d}" for i in range(100))
    # both query terms always >= 100 tokens apart in the spam doc (the
    # trailing filler also separates reps, so no accidental adjacency
    # across repetition boundaries)
    spam_body = ("zzalpha\n" + filler + "\nzzbeta\n" + filler + "\n") * 8
    docs = [
        ("org/a", "src/spam.py", "zzalpha heavy doc\n" + spam_body),
        ("org/a", "src/phrase.py",
         "def f():\n    return zzalpha zzbeta\n" + filler),
        ("org/a", "src/noise.py", filler + "\nnothing here\n"),
    ]
    rows = [
        (repo, path,
         hashlib.sha1(f"{repo}:{path}".encode()).hexdigest(), "python", c)
        for repo, path, c in docs
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    root = str(tmp_path_factory.mktemp("rr") / "idx")
    return CkService(spark, root, corpus=corpus,
                     build_opts=dict(n_segments=2, term_buckets=2,
                                     build_groups=1))


def test_rerank_promotes_adjacent_pair(rerank_service):
    svc = rerank_service
    plain = [r["path"] for r in
             svc.lexical_results("zzalpha zzbeta", top_k=3).collect()]
    assert plain[0].endswith("spam.py")  # tf-heavy doc wins raw BM25
    rr = [r["path"] for r in
          svc.lexical_results("zzalpha zzbeta", top_k=3,
                              rerank=True).collect()]
    assert rr[0].endswith("phrase.py")  # proximity flips it
    # rerank is a permutation + rescore of the SAME top-k set
    assert sorted(rr) == sorted(plain)


def test_rerank_preserves_result_shape_and_k(rerank_service):
    svc = rerank_service
    out = svc.lexical_results("zzalpha zzbeta", top_k=2, rerank=True)
    rows = out.collect()
    assert len(rows) == 2
    assert out.columns == svc.lexical_results(
        "zzalpha zzbeta", top_k=2).columns
    # preview stays the 3-line snippet (boost used full text internally)
    for r in rows:
        assert len(r["preview"].split("\n")) <= 3
    # scores strictly ordered desc
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rerank_via_mcp_tool_arg(rerank_service):
    svc = rerank_service
    page = svc.lexical_search("zzalpha zzbeta", top_k=3, rerank=True)
    assert page["results"][0]["path"].endswith("phrase.py")
    assert "preview" in page["results"][0]


def test_rerank_seam_accepts_proximity_strategy(rerank_service, spark):
    """The generic rerank() seam (service.py) composes with the
    proximity kernel as its score_fn — the strategy really is pluggable."""
    import pandas as pd

    from ck_spark.service import rerank as rerank_seam

    qterms = ["zzalpha", "zzbeta"]
    df = spark.createDataFrame(
        [(1, 1.0, "zzalpha zzbeta"), (2, 1.0, "zzalpha far far zzbeta")],
        "doc_id long, score double, section string")
    out = rerank_seam(
        df, lambda s: s.map(
            lambda t: proximity_boost_text(t, qterms, "code")),
        k=2).collect()
    assert out[0]["doc_id"] == 1
