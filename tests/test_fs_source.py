"""Filesystem source connector (S1/S2): recursive scan, ignore semantics,
lossy UTF-8 decode, lang detection, end-to-end index+search over a real
directory tree — the 'point ck at a repo' user journey."""

import os

import pytest

from ck_spark.sources.fs import read_source_tree, tree_snapshot_token


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("srctree")

    def w(rel, data):
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(p, mode) as f:
            f.write(data)

    w("src/main.py", "def fsneedle_main():\n    return 1\n")
    w("src/util/helper.rs", "pub fn fsneedle_helper() -> u32 { 2 }\n")
    w("docs/readme.md", "# readme\nplain prose fsneedle_doc here.\n")
    w("noext", "no extension fsneedle_noext\n")
    w(".git/config", "[core]\n")                      # default-excluded
    w("node_modules/pkg/index.js", "function x() {}")  # default-excluded
    w("build/out.txt", "artifact")                     # default-excluded
    w("assets/logo.bin", b"\x00\x01\x02binary")        # NUL: binary doc
    w("weird/invalid_utf8.txt", b"text \xff\xfe tail\n")
    w("big/huge.txt", "x" * 1024)                      # under the cap
    return str(root)


def test_scan_respects_default_excludes(spark, tree):
    df = read_source_tree(spark, tree)
    paths = sorted(r["path"] for r in df.select("path").collect())
    assert "src/main.py" in paths
    assert "src/util/helper.rs" in paths
    assert "docs/readme.md" in paths
    assert "noext" in paths
    assert not any(p.startswith(".git/") for p in paths)
    assert not any("node_modules" in p for p in paths)
    assert not any(p.startswith("build/") for p in paths)


def test_lang_and_decode(spark, tree):
    rows = {r["path"]: r for r in read_source_tree(spark, tree).collect()}
    assert rows["src/main.py"]["lang"] == "python"
    assert rows["src/util/helper.rs"]["lang"] == "rust"
    assert rows["docs/readme.md"]["lang"] == "markdown"
    assert rows["noext"]["lang"] is None
    # lossy decode: replacement chars, never a crash
    assert "text " in rows["weird/invalid_utf8.txt"]["content"]
    assert "�" in rows["weird/invalid_utf8.txt"]["content"]
    # NUL byte survives the cast (binary detection happens downstream)
    assert "\x00" in rows["assets/logo.bin"]["content"]
    assert rows["src/main.py"]["repo"] == os.path.basename(tree)


def test_size_cap_and_extra_globs(spark, tree):
    df = read_source_tree(spark, tree, max_file_bytes=64)
    paths = {r["path"] for r in df.select("path").collect()}
    assert "big/huge.txt" not in paths  # over the 64-byte cap
    df2 = read_source_tree(spark, tree, exclude_globs=["*.md"])
    paths2 = {r["path"] for r in df2.select("path").collect()}
    assert "docs/readme.md" not in paths2


def test_end_to_end_index_and_search(spark, tree, tmp_path):
    """The reference user journey: point at a tree, index, search — binary
    files excluded from matches, symbol sections work on the real files."""
    from ck_spark.index import build_index
    from ck_spark.query import BM25Index
    from ck_spark.query.sections import grep_full_section

    corpus = read_source_tree(spark, tree)
    root = str(tmp_path / "fsidx")
    build_index(spark, corpus, root, mode="code", n_segments=2,
                term_buckets=4, build_groups=1,
                snapshot_id=tree_snapshot_token(tree))
    idx = BM25Index.load(spark, root)
    hits = idx.search("fsneedle main", k=5, with_paths=True).collect()
    assert hits and hits[0]["path"] == "src/main.py"
    # full-section over the real tree: hit inside the rust fn
    secs = grep_full_section(corpus, "fsneedle_helper").collect()
    assert secs and secs[0]["section"].startswith("pub fn fsneedle_helper")


def test_snapshot_token_changes_on_edit(tree):
    t1 = tree_snapshot_token(tree)
    p = os.path.join(tree, "src", "main.py")
    with open(p, "a") as f:
        f.write("# touched\n")
    t2 = tree_snapshot_token(tree)
    assert t1 != t2
