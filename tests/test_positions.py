"""Positions index: codec roundtrip, the vectorized phrase kernel vs a
brute-force oracle, negative-phrase (MustNot PhraseQuery) semantics, and
positions surviving incremental updates.

Reference behavior being rebuilt: tantivy stores token positions and ck's
QueryParser phrase queries resolve against them index-only
(ck-engine/src/lib.rs:765-775)."""

from __future__ import annotations

import numpy as np
import pytest

from ck_spark.codec import (
    encode_posting_blocks,
    encode_positions_block,
    decode_positions_block,
)
from ck_spark.corpus import generate_corpus
from ck_spark.index import build_index
from ck_spark.index.builder import update_index
from ck_spark.query import BM25Index
from ck_spark.query.scorer import phrase_allowed_ids, phrase_banned_ids, phrase_match_ids
from ck_spark.tokenizer import term_positions, tokenize


# --------------------------------------------------------------------------
# pure-python pieces (no spark)
# --------------------------------------------------------------------------


def test_positions_codec_roundtrip_random():
    rng = np.random.default_rng(11)
    for _ in range(100):
        lists = []
        for _ in range(int(rng.integers(1, 40))):
            tf = int(rng.integers(1, 15))
            lists.append(np.sort(rng.choice(50_000, size=tf, replace=False)))
        tfs = np.array([len(p) for p in lists])
        flat = decode_positions_block(encode_positions_block(lists), tfs)
        assert np.array_equal(flat, np.concatenate(lists))


def test_term_positions_matches_tokenize():
    text = "def parseBuffer(buf): return parse(buf) or parse_buffer(buf)"
    toks = tokenize(text, "code")
    pos = term_positions(toks)
    for t, ps in pos.items():
        assert [toks[i] for i in ps] == [t] * len(ps)
    assert sum(len(ps) for ps in pos.values()) == len(toks)


def test_gap_numbering_long_token_breaks_phrase():
    """v6 position semantics: a ≥40-byte token between two words leaves a
    position GAP (tantivy RemoveLongFilter keeps the inner tokenizer's
    numbering), so the words are NOT phrase-adjacent — which also matches
    the raw-text separator-regex oracle (the long token is an alnum run)."""
    from ck_spark.query.boolean import phrases_match_text
    from ck_spark.tokenizer import term_positions_text

    long_tok = "x" * 45
    text = f"alpha {long_tok} beta"
    pos = term_positions_text(text, "simple")
    assert pos["alpha"] == [0] and pos["beta"] == [2]
    assert long_tok not in pos  # filtered out, but its position slot remains
    assert not phrases_match_text(text, [["alpha", "beta"]], "simple")
    assert phrases_match_text("alpha beta", [["alpha", "beta"]], "simple")
    # tf/doc_len still count only KEPT tokens
    assert sum(len(ps) for ps in pos.values()) == len(tokenize(text, "simple")) == 2


def test_gap_numbering_stopword_breaks_phrase_code_mode():
    """code mode: a stoplisted word between two terms breaks adjacency
    (Lucene StopFilter-with-position-increments behavior); in simple mode
    the same word is a real token and the 3-term phrase matches."""
    from ck_spark.query.boolean import phrases_match_text
    from ck_spark.tokenizer import term_positions_text

    text = "foo the bar"
    pos = term_positions_text(text, "code")
    assert pos == {"foo": [0], "bar": [2]}
    assert not phrases_match_text(text, [["foo", "bar"]], "code")
    assert phrases_match_text("foo bar", [["foo", "bar"]], "code")
    assert phrases_match_text(text, [["foo", "the", "bar"]], "simple")
    # camelCase split parts remain adjacent
    assert phrases_match_text("call fooBar here", [["foo", "bar"]], "code")


def _make_rows(seg_docs: dict[int, list[str]], block: int = 4):
    """Build in-memory posting rows (one per term) from doc_id -> tokens,
    exactly as the index encoder would."""
    by_term: dict[str, list[tuple[int, list[int]]]] = {}
    dls = {}
    for doc_id, toks in seg_docs.items():
        dls[doc_id] = len(toks)
        for t, ps in term_positions(toks).items():
            by_term.setdefault(t, []).append((doc_id, ps))
    rows = {}
    for t, entries in by_term.items():
        entries.sort()
        ids = np.array([d for d, _ in entries], dtype=np.int64)
        tfs = np.array([len(ps) for _, ps in entries])
        dl = np.array([dls[d] for d, _ in entries])
        blocks = encode_posting_blocks(ids, tfs, dl, 10.0, 1.2, 0.75, block)
        n = ids.size
        pos_blocks = [
            encode_positions_block([ps for _, ps in entries[lo:min(lo + block, n)]])
            for lo in range(0, n, block)
        ]
        rows[t] = {
            "term": t, "n_docs": int(n),
            "ids_blocks": blocks["ids_blocks"],
            "tfs_blocks": blocks["tfs_blocks"],
            "dls_blocks": blocks["dls_blocks"],
            "pos_blocks": pos_blocks,
            "block_max": blocks["block_max"],
            "block_last": blocks["block_last"],
            "avgdl_enc": 10.0,
        }
    return rows


def _brute_phrase(seg_docs, phrase):
    out = []
    m = len(phrase)
    for doc_id, toks in seg_docs.items():
        if any(toks[i:i + m] == phrase for i in range(len(toks) - m + 1)):
            out.append(doc_id)
    return sorted(out)


def test_phrase_kernel_vs_bruteforce_random():
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(50):
        seg_docs = {
            int(1000 + d): [vocab[int(i)] for i in rng.integers(0, len(vocab), size=int(rng.integers(3, 60)))]
            for d in range(int(rng.integers(5, 40)))
        }
        rows = _make_rows(seg_docs, block=4)
        for plen in (2, 3):
            p = [vocab[int(i)] for i in rng.integers(0, len(vocab), size=plen)]
            if any(t not in rows for t in p):
                continue
            got = phrase_match_ids(rows, p, block_size=4)
            assert got.tolist() == _brute_phrase(seg_docs, p), (trial, p)


def test_phrase_kernel_repeated_term_and_restrict():
    seg_docs = {
        1: "a b a b a".split(),
        2: "a a b".split(),
        3: "b a b".split(),
        4: "a b".split(),
    }
    rows = _make_rows(seg_docs, block=2)
    # "a b a" appears in docs 1 and 3? doc3 = b a b -> no; doc1 = a b a b a -> yes
    assert phrase_match_ids(rows, ["a", "b", "a"], 2).tolist() == [1]
    assert phrase_match_ids(rows, ["a", "a"], 2).tolist() == [2]
    # restrict narrows candidates before any position decode
    got = phrase_match_ids(rows, ["a", "b"], 2, restrict=np.array([2, 3, 4]))
    assert got.tolist() == [2, 3, 4]  # all contain adjacent "a b"; 1 excluded
    # multi-phrase AND + banned union
    allowed = phrase_allowed_ids(rows, [["a", "b"], ["b", "a"]], 2)
    assert allowed.tolist() == [1, 3]
    banned = phrase_banned_ids(rows, [["a", "a"], ["a", "b", "a"]], 2)
    assert banned.tolist() == [1, 2]


# --------------------------------------------------------------------------
# engine-level (spark)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def phrase_engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("positions_idx"))
    docs = {
        # phrase "hash table" adjacent
        "d1": "the hash table implementation uses open addressing",
        "d2": "a hash table resize doubles the bucket count",
        # both terms, NOT adjacent — must NOT be excluded by -"hash table"
        "d3": "the table stores a hash per row for lookups",
        "d4": "compute the hash then probe the table slots",
        # only one term
        "d5": "the table scan reads every row",
        "d6": "a rolling hash fingerprints each window",
        # both terms separated by a ≥40-byte token: the long token is
        # dropped by RemoveLongFilter but HOLDS its position, so the words
        # are not adjacent — the phrase must not match (gap numbering)
        "d7": f"rebuild the hash {'q' * 45} table tonight",
    }
    rows = [("r", k, "c0", "text", v) for k, v in docs.items()]
    corpus = spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    build_index(spark, corpus, root, mode="simple", n_segments=2,
                term_buckets=4, build_groups=1, block_size=2)
    idx = BM25Index.load(spark, root)
    dm = spark.read.parquet(idx.paths.doc_map).select("path", "doc_id").toPandas()
    path2id = dict(zip(dm["path"], dm["doc_id"]))
    return idx, path2id


def _paths(idx, path2id, q, **kw):
    id2path = {v: k for k, v in path2id.items()}
    rows = idx.search_query(q, k=100, **kw).collect()
    return sorted(id2path[r["doc_id"]] for r in rows)


def test_phrase_index_only_positive(phrase_engine):
    idx, p2i = phrase_engine
    # d7 contains "hash <40+ byte token> table" and must NOT match
    assert _paths(idx, p2i, '"hash table"') == ["d1", "d2"]
    # reversed phrase matches nothing
    assert _paths(idx, p2i, '"table hash"') == []


def test_negative_phrase_excludes_only_adjacent(phrase_engine):
    """-"hash table" must ban ONLY docs with the adjacent phrase (tantivy
    MustNot(PhraseQuery)) — d3/d4 contain both terms separately and stay."""
    idx, p2i = phrase_engine
    got = _paths(idx, p2i, 'table -"hash table"')
    assert got == ["d3", "d4", "d5", "d7"]
    # old (over-excluding) behavior would have dropped d3/d4 too
    got2 = _paths(idx, p2i, 'hash -"hash table"')
    assert got2 == ["d3", "d4", "d6", "d7"]


def test_negative_phrase_with_unknown_term_bans_nothing(phrase_engine):
    idx, p2i = phrase_engine
    assert _paths(idx, p2i, 'table -"xyzzy table"') == _paths(idx, p2i, "table")


def test_phrase_after_incremental_update(spark, tmp_path):
    """Positions must stay correct through update_index: modified docs get
    fresh positions, carried-over docs keep theirs, and the phrase query
    is identical to a from-scratch rebuild."""
    root = str(tmp_path / "idx")
    pdf = generate_corpus(120, seed=9)
    corpus = spark.createDataFrame(pdf)
    build_index(spark, corpus, root, mode="code", n_segments=3,
                term_buckets=4, build_groups=1, block_size=8)

    pdf2 = pdf.copy()
    # modify ~10 docs to contain a marker phrase, add 5 new docs with it
    pdf2.loc[pdf2.index[:10], "content"] = (
        pdf2.loc[pdf2.index[:10], "content"] + " zebra quantum leap"
    )
    extra = pdf2.iloc[:5].copy()
    extra["path"] = extra["path"] + "_new"
    extra["content"] = "the zebra quantum engine " + extra["content"]
    import pandas as pd

    pdf2 = pd.concat([pdf2, extra], ignore_index=True)
    corpus2 = spark.createDataFrame(pdf2)
    update_index(spark, corpus2, root)
    idx = BM25Index.load(spark, root)

    got = idx.search_query('"zebra quantum"', k=100).toPandas()
    assert len(got) == 15

    # from-scratch rebuild gives the identical result set + scores
    root2 = str(tmp_path / "idx2")
    build_index(spark, corpus2, root2, mode="code", n_segments=3,
                term_buckets=4, build_groups=1, block_size=8)
    idx2 = BM25Index.load(spark, root2)
    got2 = idx2.search_query('"zebra quantum"', k=100).toPandas()
    assert got.sort_values("doc_id").reset_index(drop=True).equals(
        got2.sort_values("doc_id").reset_index(drop=True)
    )
