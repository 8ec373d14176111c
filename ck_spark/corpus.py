"""Deterministic synthetic source-code corpus.

Materializes the exact input shape mandated by BASELINE.json input_hint:
``(repo STRING, path STRING, commit STRING, lang STRING, content STRING)``.
Pure function of (n_docs, seed) — same arguments give byte-identical
content, hence stable sha256(content) (the ingest invariant) and stable
BM25 ranks. Mirrors the reference's own fixture style: small code files
with known phrases (ck-cli/tests/integration_tests.rs:269-303) plus edge
cases (FIXTURES.md §1): empty file, stopword-only file, >40-char
identifier, CRLF endings, duplicate content under two paths, and one
binary-ish row containing a NUL byte (exercises the text filter analogue
of ck-index/src/lib.rs:1598-1625).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# Fixed vocabularies. Ubiquitous keywords appear in nearly every doc
# (exercises the salted-segment skew path); rare terms appear in a handful
# of docs (rank assertions / idf checks).
KEYWORDS = ["def", "return", "import", "class", "self", "for", "if", "else"]
IDENT_STEMS = [
    "parse", "buffer", "token", "index", "query", "score", "merge", "split",
    "read", "write", "cache", "hash", "chunk", "span", "file", "line",
    "search", "match", "rank", "term", "doc", "count", "batch", "stream",
]
IDENT_SUFFIX = ["er", "ctx", "util", "impl", "node", "state", "conf", "map"]
RARE_TERMS = [
    "zephyrblade", "quixotic", "nebulizer", "kraken", "obsidian",
    "palindrome", "gyroscope", "marmalade", "catalyst", "tungsten",
]
EXTS = [(".py", "python"), (".rs", "rust"), (".js", "javascript"),
        (".go", "go"), (".md", "markdown"), (".txt", "text")]


def _make_ident(rng: np.random.Generator) -> str:
    a = IDENT_STEMS[rng.integers(len(IDENT_STEMS))]
    b = IDENT_STEMS[rng.integers(len(IDENT_STEMS))]
    c = IDENT_SUFFIX[rng.integers(len(IDENT_SUFFIX))]
    style = rng.integers(3)
    if style == 0:  # snake_case
        return f"{a}_{b}_{c}"
    if style == 1:  # camelCase
        return a + b.capitalize() + c.capitalize()
    return a + b + c  # fused


def _make_doc(rng: np.random.Generator, doc_idx: int, body_scale: int = 1) -> str:
    lines = []
    n_funcs = int(rng.integers(1, 5)) * body_scale
    for _ in range(n_funcs):
        name = _make_ident(rng)
        arg1, arg2 = _make_ident(rng), _make_ident(rng)
        lines.append(f"def {name}({arg1}, {arg2}):")
        body_len = int(rng.integers(2, 7))
        for _ in range(body_len):
            v = _make_ident(rng)
            w = IDENT_STEMS[rng.integers(len(IDENT_STEMS))]
            op = ["=", "+=", "=="][rng.integers(3)]
            lines.append(f"    {v} {op} {w}({arg1}.{IDENT_SUFFIX[rng.integers(len(IDENT_SUFFIX))]})")
        lines.append(f"    return {arg1}")
    if rng.random() < 0.5:
        lines.insert(0, f"import {IDENT_STEMS[rng.integers(len(IDENT_STEMS))]}")
    # ~8% of docs carry one rare discriminative term (idf / ranking tests)
    if rng.random() < 0.08:
        rare = RARE_TERMS[rng.integers(len(RARE_TERMS))]
        lines.append(f"# marker {rare} appears here")
    return "\n".join(lines) + "\n"


def generate_corpus(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Build the corpus as pandas (driver-side; test scale). For bench scale
    use ``generate_corpus_spark`` which distributes generation."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        repo = f"org{i % 13:04d}/repo{i % 37:03d}"
        ext, lang = EXTS[int(rng.integers(len(EXTS)))]
        path = f"src/m{i // 100:03d}/{_make_ident(rng)}{ext}"
        content = _make_doc(rng, i)
        commit = hashlib.sha1(f"{repo}:{path}:{seed}".encode()).hexdigest()
        rows.append((repo, path, commit, lang, content))

    # Deterministic edge-case docs (FIXTURES.md §1), appended at fixed slots.
    def edge(path: str, content: str, lang: str = "python"):
        repo = "org-edge/repo-edge"
        commit = hashlib.sha1(f"{repo}:{path}:{seed}".encode()).hexdigest()
        rows.append((repo, path, commit, lang, content))

    edge("edge/empty.py", "")
    edge("edge/stopwords.txt", "the a an and of to in is it\n", "text")
    edge("edge/longident.py",
         "def x():\n    averyveryverylongidentifierthatexceedsfortycharacterslimit = 1\n")
    edge("edge/crlf.py", "def crlf_func(a, b):\r\n    return a\r\n")
    dup = "def duplicated_content(x):\n    return x\n"
    edge("edge/dup_one.py", dup)
    edge("edge/dup_two.py", dup)
    edge("edge/binaryish.bin", "PK\x00\x03binary blob content\x00here", "text")

    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def generate_corpus_spark(
    spark, n_docs: int, seed: int = 42, partitions: int | None = None,
    body_scale: int = 1,
):
    """Distributed generation: spark.range -> mapInPandas, each partition
    seeded as (seed, doc range) so output is independent of parallelism.
    body_scale multiplies per-file size (benchmarking heavier files)."""
    import pyspark.sql.functions as F  # noqa: N812

    schema = "repo string, path string, commit string, lang string, content string"

    def gen(iterator):
        for pdf in iterator:
            out = []
            for i in pdf["id"].tolist():
                rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
                repo = f"org{i % 13:04d}/repo{i % 37:03d}"
                ext, lang = EXTS[int(rng.integers(len(EXTS)))]
                path = f"src/m{i // 100:03d}/{_make_ident(rng)}{ext}"
                content = _make_doc(rng, i, body_scale)
                commit = hashlib.sha1(f"{repo}:{path}:{seed}".encode()).hexdigest()
                out.append((repo, path, commit, lang, content))
            yield pd.DataFrame(out, columns=["repo", "path", "commit", "lang", "content"])

    df = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return df.mapInPandas(gen, schema=schema)
