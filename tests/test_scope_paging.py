import numpy as np
import pytest
from pyspark.sql import functions as F

from ck_spark.corpus import generate_corpus
from ck_spark.index import build_index
from ck_spark.query import BM25Index
from ck_spark.query.paging import paginate
from ck_spark.query.scope import glob_to_regex, path_scope_pred
from tests.oracle_bm25 import bm25_rank


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scopeidx"))
    pdf = generate_corpus(220, seed=42)
    build_index(spark, spark.createDataFrame(pdf), root, mode="code",
                n_segments=4, term_buckets=8, build_groups=2)
    idx = BM25Index.load(spark, root)
    dm = spark.read.parquet(idx.paths.doc_map).toPandas()
    return idx, pdf, dm


def _glob_hits(glob: str, path: str) -> bool:
    import re

    # re.search == Spark rlike (partial match); the pattern self-anchors
    # with (?:^|/) ... (?:/|$)
    return re.search(glob_to_regex(glob), path) is not None


def test_glob_component_semantics():
    """globset parity matrix (ck-engine/src/lib.rs:1062-1086 and the
    hierarchical ckignore tests at lib.rs:1693-1856): * and ? never cross
    '/', ** does, and a glob matches any component-aligned subpath."""
    # suffix glob matches the basename component at any depth
    assert _glob_hits("*.min.js", "a/b/x.min.js")
    assert _glob_hits("*.min.js", "x.min.js")
    assert not _glob_hits("*.min.js", "a/b/x.js")
    # * does NOT cross separators: "*.js" can't swallow "lib/x" of
    # "lib/x.extra/file.js"? — component-aligned: matches file.js itself
    assert _glob_hits("*.js", "lib/sub/file.js")
    assert not _glob_hits("a*b", "a/x/b")  # * stopped by '/'
    assert _glob_hits("a*b", "src/axxb/y")  # within one component; dir match
    # MULTI-component glob: anchored at the path start, like globset's
    # full-path match in should_exclude_path (a floating match would
    # exclude strictly more than the reference — ADVICE r2)
    assert _glob_hits("build/*", "build/x")
    assert _glob_hits("build/*", "build/x/y")  # matched dir prunes subtree
    assert not _glob_hits("build/*", "proj/build/x")  # anchored: no mid-path
    assert not _glob_hits("build/*", "rebuild/x")  # 'build' != 'rebuild'
    assert not _glob_hits("build/*", "src/main.rs")
    # bare component name excludes the whole subtree, at any depth
    assert _glob_hits("node_modules", "node_modules/pkg/index.js")
    assert _glob_hits("node_modules", "proj/node_modules/x")
    assert not _glob_hits("node_modules", "my_node_modules/x")
    # ? matches exactly one non-separator char
    assert _glob_hits("v?.md", "docs/v1.md")
    assert not _glob_hits("v?.md", "docs/v12.md")
    assert not _glob_hits("v?.md", "docs/v/x.md")
    # ** crosses components (zero or more)
    assert _glob_hits("src/**/test", "src/a/b/test/x.py")
    assert _glob_hits("src/**/test", "src/test/x.py")  # zero components
    assert not _glob_hits("src/**/test", "src/a/tests/x.py")
    assert _glob_hits("**/*.lock", "a/b/Cargo.lock")
    assert _glob_hits("**/*.lock", "Cargo.lock")
    # globset extensions: {a,b} alternation and [...] classes
    assert _glob_hits("*.{png,jpg}", "img/photo.jpg")
    assert _glob_hits("*.{png,jpg}", "photo.png")
    assert not _glob_hits("*.{png,jpg}", "photo.jpeg")
    assert _glob_hits("{build,dist}/*", "dist/x.js")
    assert not _glob_hits("{build,dist}/*", "src/dist/x.js")  # anchored
    assert _glob_hits("file[0-9].txt", "a/file3.txt")
    assert not _glob_hits("file[0-9].txt", "a/fileA.txt")
    assert _glob_hits("file[!0-9].txt", "a/fileA.txt")
    assert not _glob_hits("file[!0-9].txt", "a/file3.txt")


def test_scoped_search_is_exact(spark, engine):
    idx, pdf, dm = engine
    prefix = "src/m001/"
    got = idx.search("parse buffer", k=10, include_prefixes=[prefix],
                     with_paths=True).collect()
    assert got, "scope should keep some results"
    assert all(r["path"].startswith(prefix) for r in got)
    # exact and reference-faithful: GLOBAL stats (idf/avgdl over the whole
    # corpus), candidates restricted to the scope — i.e. the full ranking
    # filtered to scoped docs (ck's post-filter semantics, but computed
    # exactly rather than truncated-then-filtered)
    key2id = {(r.repo, r.path): r.doc_id for r in dm.itertuples()}
    all_docs = {
        key2id[(r.repo, r.path)]: r.content
        for r in pdf.itertuples()
        if "\x00" not in r.content
    }
    scoped_ids = {
        key2id[(r.repo, r.path)] for r in pdf.itertuples() if r.path.startswith(prefix)
    }
    full_rank = bm25_rank(all_docs, "parse buffer", k=len(all_docs), tokenizer_mode="code")
    exp = [(d, s) for d, s in full_rank if d in scoped_ids][:10]
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    np.testing.assert_allclose(
        [r["score"] for r in got], [s for _, s in exp], rtol=1e-9
    )


def test_exclude_globs(spark, engine):
    idx, pdf, dm = engine
    all_rows = idx.search("def", k=200, with_paths=True).collect()
    exts = {r["path"].rsplit(".", 1)[-1] for r in all_rows}
    assert "md" in exts
    scoped = idx.search("def", k=200, exclude_globs=["*.md"], with_paths=True).collect()
    assert scoped
    assert all(not r["path"].endswith(".md") for r in scoped)


def test_scope_pred_column(spark):
    df = spark.createDataFrame(
        [("src/a.py",), ("node_modules/x.js",), ("lib/b.md",)], ["path"]
    )
    kept = df.where(
        path_scope_pred(F.col("path"), None, ["node_modules/*", "*.md"])
    ).collect()
    assert [r["path"] for r in kept] == ["src/a.py"]


def test_scope_excluding_entire_segments(spark, engine):
    # a scope that matches very few docs leaves some doc-hash segments with
    # postings but ZERO allowed docs — the scorer must not blow up there
    idx, pdf, dm = engine
    one_path = pdf[~pdf["path"].str.startswith("edge/")].iloc[0]["path"]
    got = idx.search("def", k=10, include_prefixes=[one_path], with_paths=True).collect()
    assert len(got) <= 1
    if got:
        assert got[0]["path"] == one_path
    # scope matching nothing at all -> clean empty result
    assert idx.search("def", k=10, include_prefixes=["no/such/prefix/"]).count() == 0


def test_near_miss(spark, engine):
    idx, _, _ = engine
    res, near = idx.search_with_near_miss("parse buffer", k=10, threshold=0.9)
    r, n = res.collect(), near.collect()
    assert all(x["score"] >= 0.9 for x in r)
    assert len(n) == 1 and n[0]["score"] < 0.9
    # near miss is the best sub-threshold candidate
    full = idx.search("parse buffer", k=10, normalize=True).collect()
    below = [x for x in full if x["score"] < 0.9]
    assert n[0]["doc_id"] == below[0]["doc_id"]


def test_paginate(spark):
    df = spark.range(0, 23).withColumnRenamed("id", "doc_id")
    pages = [
        [r["doc_id"] for r in paginate(df, [F.asc("doc_id")], page=p, page_size=5).collect()]
        for p in range(6)
    ]
    flat = [d for pg in pages for d in pg]
    assert flat == list(range(23))
    assert pages[4] == [20, 21, 22] and pages[5] == []
    # page size is capped at 200
    big = paginate(spark.range(0, 500).withColumnRenamed("id", "d"),
                   [F.asc("d")], page=0, page_size=1000)
    assert big.count() == 200
