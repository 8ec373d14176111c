import hashlib

from ck_spark.corpus import generate_corpus


def test_deterministic():
    a = generate_corpus(100, seed=42)
    b = generate_corpus(100, seed=42)
    assert a.equals(b)
    ha = hashlib.sha256("".join(a["content"]).encode()).hexdigest()
    hb = hashlib.sha256("".join(b["content"]).encode()).hexdigest()
    assert ha == hb
    c = generate_corpus(100, seed=7)
    assert not a["content"].equals(c["content"])


def test_edge_cases_present():
    df = generate_corpus(50)
    paths = set(df["path"])
    for p in ["edge/empty.py", "edge/stopwords.txt", "edge/longident.py",
              "edge/crlf.py", "edge/dup_one.py", "edge/dup_two.py",
              "edge/binaryish.bin"]:
        assert p in paths
    by_path = df.set_index("path")
    assert by_path.loc["edge/empty.py", "content"] == ""
    assert "\r\n" in by_path.loc["edge/crlf.py", "content"]
    assert by_path.loc["edge/dup_one.py", "content"] == by_path.loc["edge/dup_two.py", "content"]
    assert "\x00" in by_path.loc["edge/binaryish.bin", "content"]
    long_tok = by_path.loc["edge/longident.py", "content"]
    assert any(len(t) > 40 for t in long_tok.replace("(", " ").split())


def test_skew_and_rare_terms():
    from ck_spark.tokenizer import tokenize

    df = generate_corpus(500)
    toks = df["content"].map(lambda c: set(tokenize(c, "code")))
    n = len(df)
    def_docs = sum("def" in t for t in toks)
    return_docs = sum("return" in t for t in toks)
    assert def_docs > 0.9 * (n - 7)  # ubiquitous (minus edge docs)
    assert return_docs > 0.9 * (n - 7)
    from ck_spark.corpus import RARE_TERMS

    rare_hits = sum(any(r in t for r in RARE_TERMS) for t in toks)
    assert 0 < rare_hits < 0.2 * n


def test_distributed_generation_parallelism_independent(spark):
    from ck_spark.corpus import generate_corpus_spark

    a = generate_corpus_spark(spark, 200, seed=42, partitions=2).orderBy("repo", "path").collect()
    b = generate_corpus_spark(spark, 200, seed=42, partitions=7).orderBy("repo", "path").collect()
    assert a == b
