"""Sequence-packing and PII-redaction operator tests.

pack_concat_split is hash-verified against a DuckDB oracle by the
driver contract (pack_spans); here we pin its span arithmetic on a
hand-computed fixture. pack_greedy's capacity-reset recurrence is not
SQL-expressible, so it is verified by invariants: capacity, exactly-
once, order preservation, greedy tightness, oversize flagging."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ck_spark.ops.packing import pack_concat_split, pack_greedy, packing_stats
from ck_spark.ops.redact import PII_PATTERNS, redact_pii


def _docs_with_counts(spark, counts, shards=None):
    rows = [(i, int(c), int(shards[i]) if shards else 0)
            for i, c in enumerate(counts)]
    return spark.createDataFrame(
        rows, schema="doc_id long, n_toks long, myshard int")


def test_concat_split_hand_fixture(spark):
    # one shard, seq_len 10: counts 4,4,4 -> doc 2 spans seqs 0..1
    df = _docs_with_counts(spark, [4, 4, 4, 10, 0, 3])
    out = {r["doc_id"]: r for r in pack_concat_split(
        df, seq_len=10, token_count_col="n_toks", shard_col="myshard",
    ).collect()}
    assert [out[i]["start_tok"] for i in range(6)] == [0, 4, 8, 12, 22, 22]
    assert [out[i]["seq_first"] for i in range(6)] == [0, 0, 0, 1, 2, 2]
    assert [out[i]["seq_last"] for i in range(6)] == [0, 0, 1, 2, 2, 2]
    assert out[2]["n_seqs_spanned"] == 2  # straddles the boundary
    assert out[4]["n_seqs_spanned"] == 1  # empty doc occupies no tokens


def test_concat_split_shards_are_independent(spark):
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 300, 400).tolist()
    df = _docs_with_counts(spark, counts)
    out = pack_concat_split(df, seq_len=128, token_count_col="n_toks",
                            n_shards=8)
    pdf = out.toPandas().sort_values("doc_id")
    for shard, grp in pdf.groupby("shard"):
        grp = grp.sort_values("doc_id")
        # prefix-sum property within each shard
        expect = np.concatenate([[0], np.cumsum(grp["n_tokens"])[:-1]])
        assert np.array_equal(grp["start_tok"].to_numpy(), expect)


def test_greedy_invariants(spark):
    rng = np.random.default_rng(1)
    counts = rng.integers(1, 700, 500).tolist()  # some exceed seq_len=512
    df = _docs_with_counts(spark, counts)
    out = pack_greedy(df, seq_len=512, token_count_col="n_toks",
                      n_shards=8)
    pdf = out.toPandas()
    # exactly-once
    assert sorted(pdf["doc_id"]) == list(range(500))
    assert int(pdf["n_tokens"].sum()) == sum(counts)
    for (_s, _q), grp in pdf.groupby(["shard", "seq_id"]):
        total = int(grp["n_tokens"].sum())
        if not grp["oversize"].any():
            assert total <= 512  # capacity
        else:
            assert len(grp) == 1  # oversize docs sit alone
    for _s, grp in pdf.groupby("shard"):
        grp = grp.sort_values("doc_id")
        seqs = grp["seq_id"].to_numpy()
        # order preservation: seq_id non-decreasing in doc order
        assert np.all(np.diff(seqs) >= 0)
        # no gaps in seq numbering
        assert set(seqs) == set(range(int(seqs.max()) + 1))
        # greedy tightness: first doc of seq k+1 would overflow seq k
        toks = grp["n_tokens"].to_numpy()
        fills = {}
        for s, t in zip(seqs, toks):
            fills[s] = fills.get(s, 0) + t
        firsts = grp.drop_duplicates("seq_id", keep="first")
        for _, row in firsts.iterrows():
            k = row["seq_id"]
            if k == 0:
                continue
            assert fills[k - 1] + row["n_tokens"] > 512
    # offsets: each doc starts where the previous one in its seq ended
    for (_s, _q), grp in pdf.groupby(["shard", "seq_id"]):
        grp = grp.sort_values("doc_id")
        expect = np.concatenate([[0], np.cumsum(grp["n_tokens"])[:-1]])
        assert np.array_equal(grp["offset_in_seq"].to_numpy(), expect)


def test_greedy_stats_rollup(spark):
    df = _docs_with_counts(spark, [100] * 50)
    out = pack_greedy(df, seq_len=512, token_count_col="n_toks", n_shards=1)
    stats = packing_stats(out, 512).collect()[0]
    # 5 docs of 100 fit per 512-seq -> 10 sequences of 500
    assert stats["n_seqs"] == 10
    assert stats["total_tokens"] == 5000
    assert stats["fill_factor"] == pytest.approx(500 / 512)


def test_pack_rejects_bad_seq_len(spark):
    df = _docs_with_counts(spark, [1])
    with pytest.raises(ValueError, match="seq_len"):
        pack_concat_split(df, 0, token_count_col="n_toks")
    with pytest.raises(ValueError, match="seq_len"):
        pack_greedy(df, -5, token_count_col="n_toks")


def test_whitespace_token_derivation(spark):
    # newline/tab edges matter: trim() strips only spaces, so a naive
    # trim+split counted 'hello\n' as 2 tokens (review regression)
    df = spark.createDataFrame(
        [(0, "a b  c"), (1, ""), (2, "   "), (3, "one"),
         (4, "hello\n"), (5, "\tabc"), (6, " \t \n"), (7, "x\r\ny")],
        schema="doc_id long, text string")
    out = {r["doc_id"]: r["n_tokens"] for r in pack_concat_split(
        df, seq_len=8, n_shards=1).collect()}
    assert out == {0: 3, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 0, 7: 2}


# ------------------------------------------------------------- redaction
def test_redact_all_kinds(spark):
    text = ("write to Jane.Doe+x@corp.example.com or 415-555-1234; "
            "server 192.168.0.1, ssn 123-45-6789, "
            "card 4242 4242 4242 4242 end")
    df = spark.createDataFrame([(0, text)], schema="doc_id long, text string")
    r = redact_pii(df).collect()[0]
    assert r["n_email"] == 1 and r["n_phone"] == 1 and r["n_ipv4"] == 1
    assert r["n_ssn"] == 1 and r["n_credit_card"] == 1
    assert r["pii_total"] == 5
    out = r["text"]
    for needle in ("example.com", "555-1234", "192.168", "123-45-6789",
                   "4242"):
        assert needle not in out
    assert out.count("[PII-") == 5
    assert out.startswith("write to [PII-email] or")


def test_redact_kind_subset_and_mask(spark):
    df = spark.createDataFrame(
        [(0, "a@b.co and 10.0.0.1")], schema="doc_id long, text string")
    r = redact_pii(df, kinds=["email"], mask="<gone>").collect()[0]
    assert r["text"] == "<gone> and 10.0.0.1"
    assert r["pii_total"] == 1
    with pytest.raises(ValueError, match="unknown PII kinds"):
        redact_pii(df, kinds=["email", "passport"])


def test_redact_clean_text_untouched(spark):
    df = spark.createDataFrame(
        [(0, "perfectly clean prose 12 34")],
        schema="doc_id long, text string")
    r = redact_pii(df).collect()[0]
    assert r["text"] == "perfectly clean prose 12 34"
    assert r["pii_total"] == 0


def test_redact_order_email_before_phone(spark):
    # digits inside an email must not double-count as phone/ipv4
    df = spark.createDataFrame(
        [(0, "x 415-555-1234@ex.co y")], schema="doc_id long, text string")
    r = redact_pii(df).collect()[0]
    assert r["n_email"] == 1
    assert r["n_phone"] == 0 and r["n_ipv4"] == 0


def test_pattern_table_shape():
    kinds = [k for k, _ in PII_PATTERNS]
    assert kinds == ["email", "ssn", "credit_card", "phone", "ipv4"]
    # patterns must stay in the Java<->RE2 common subset
    for _, p in PII_PATTERNS:
        assert "(?<" not in p and "(?=" not in p and "\\1" not in p
