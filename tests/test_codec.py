import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ck_spark.codec import (
    block_max_partial,
    decode_posting_ids,
    decode_u32s,
    decode_varint,
    encode_posting_ids,
    encode_u32s,
    encode_varint,
)


def test_varint_known_values():
    v = np.array([0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    buf = encode_varint(v)
    assert decode_varint(buf).tolist() == v.tolist()
    # single-byte values
    assert encode_varint(np.array([5], dtype=np.uint64)) == b"\x05"
    assert encode_varint(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert encode_varint(np.array([], dtype=np.uint64)) == b""
    assert decode_varint(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varint_roundtrip(values):
    v = np.array(values, dtype=np.uint64)
    assert decode_varint(encode_varint(v)).tolist() == v.tolist()


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_posting_ids_roundtrip(ids):
    v = np.array(sorted(ids), dtype=np.uint64)
    out = decode_posting_ids(encode_posting_ids(v))
    assert out.tolist() == v.tolist()


def test_delta_compression_is_compact():
    # dense increasing ids -> ~1 byte per id after delta
    ids = np.arange(10_000, dtype=np.uint64) * 3 + 7
    buf = encode_posting_ids(ids)
    assert len(buf) < 10_500


def test_u32_roundtrip():
    tfs = np.array([1, 2, 3, 1000, 0], dtype=np.int64)
    assert decode_u32s(encode_u32s(tfs)).tolist() == tfs.tolist()


def test_block_max_partial_bounds_scores():
    rng = np.random.default_rng(0)
    tfs = rng.integers(1, 20, size=1000)
    dls = rng.integers(5, 500, size=1000)
    avgdl, k1, b = 100.0, 1.2, 0.75
    bm = block_max_partial(tfs, dls, avgdl, k1, b, block=128)
    partial = tfs * (k1 + 1) / (tfs + k1 * (1 - b + b * dls / avgdl))
    assert bm.shape == (8,)
    for blk in range(8):
        seg = partial[blk * 128 : (blk + 1) * 128]
        assert bm[blk] >= seg.max() - 1e-6
        assert abs(bm[blk] - seg.max()) < 1e-5


# ---------------------------------------------------------------------------
# batch encoder == per-term encoder, byte for byte
# ---------------------------------------------------------------------------

@st.composite
def _term_postings(draw):
    n = draw(st.integers(1, 300))
    gaps = draw(st.lists(st.integers(1, 10**7), min_size=n, max_size=n))
    ids = np.cumsum(np.array(gaps, dtype=np.uint64))
    tfs = np.array(draw(st.lists(st.integers(1, 12), min_size=n, max_size=n)))
    dls = np.array(draw(st.lists(st.integers(1, 4000), min_size=n, max_size=n)))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    poss = [np.sort(rng.choice(50_000, size=int(t), replace=False)) for t in tfs]
    return ids, tfs, dls, poss


@given(st.lists(_term_postings(), min_size=1, max_size=8),
       st.sampled_from([4, 128]))
@settings(max_examples=25, deadline=None)
def test_batch_encoder_identical_to_per_term(terms, block):
    from ck_spark.codec import (
        encode_posting_blocks, encode_positions_block,
        encode_posting_blocks_batch,
    )
    avgdl, k1, b = 231.7, 1.2, 0.75
    bat = encode_posting_blocks_batch(
        [t[0] for t in terms], [t[1] for t in terms], [t[2] for t in terms],
        [np.concatenate(t[3]) for t in terms],  # JVM-flattened per term
        avgdl, k1, b, block,
    )
    for i, (ids, tfs, dls, poss) in enumerate(terms):
        ref = encode_posting_blocks(ids, tfs, dls, avgdl, k1, b, block)
        n = ids.size
        ref_pos = [encode_positions_block(poss[lo:min(lo + block, n)])
                   for lo in range(0, n, block)]
        assert bat["ids_blocks"][i] == ref["ids_blocks"]
        assert bat["tfs_blocks"][i] == ref["tfs_blocks"]
        assert bat["dls_blocks"][i] == ref["dls_blocks"]
        assert bat["pos_blocks"][i] == ref_pos
        assert bat["block_max"][i] == ref["block_max"]
        assert bat["block_last"][i] == ref["block_last"]


def test_batch_encoder_empty_and_no_positions():
    from ck_spark.codec import encode_posting_blocks_batch
    e = encode_posting_blocks_batch([], [], [], None, 100.0, 1.2, 0.75, 128)
    assert e["ids_blocks"] == []
    one = encode_posting_blocks_batch(
        [np.array([5], dtype=np.uint64)], [np.array([1])], [np.array([10])],
        None, 100.0, 1.2, 0.75, 128,
    )
    assert one["pos_blocks"][0] is None
    assert one["block_last"][0] == [5]


def test_xxhash64_spark_parity(spark):
    """Driver-side xxhash64 must agree with Spark's xxhash64() so bucket
    routing never needs a job."""
    import pyspark.sql.functions as F

    from ck_spark.codec import xxhash64_signed

    vals = ["", "a", "abc", "def", "window w+", "parse_buffer",
            "ünïcode ☃", "x" * 7, "y" * 100, "0123456789abcdef" * 2 + "XYZ"]
    rows = spark.createDataFrame([(v,) for v in vals], "s string").select(
        "s", F.xxhash64("s").alias("h")
    ).collect()
    for r in rows:
        assert xxhash64_signed(r["s"]) == r["h"], r["s"]
