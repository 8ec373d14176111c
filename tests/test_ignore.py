"""Ignore-file semantics (.gitignore / .ckignore / .git/info/exclude) —
mirrors the reference's own tests (ck-index/src/lib.rs:2057-2176 no-ignore
+ ckignore-without-gitignore; ck-engine/src/lib.rs:1693-1856 hierarchical
merge) plus git's documented matching rules."""

from __future__ import annotations

import os

import pytest

from ck_spark.sources.ignore import (
    IgnoreMatcher,
    collect_ignore_rules,
    parse_ignore_file,
)


def _m(*file_specs):
    """file_specs: (text, base, klass, depth)"""
    rules = []
    for text, base, klass, depth in file_specs:
        rules.extend(parse_ignore_file(text, base, klass, depth))
    return IgnoreMatcher(rules)


def test_basic_glob_and_comments():
    m = _m(("# comment\n\n*.log\nbuild/\n", "", "gitignore", 0))
    assert m.ignored("x.log")
    assert m.ignored("a/b/x.log")
    assert not m.ignored("x.log.txt")
    assert m.ignored("build/out.o")          # dir rule prunes subtree
    assert m.ignored("a/build/out.o")        # non-anchored dir name, any depth
    assert not m.ignored("builder/x.c")      # no partial-component match


def test_negation_last_match_wins():
    m = _m(("*.log\n!keep.log\n", "", "gitignore", 0))
    assert m.ignored("x.log")
    assert not m.ignored("keep.log")
    assert not m.ignored("a/keep.log")
    # order matters: negation before the ignore is overridden
    m2 = _m(("!keep.log\n*.log\n", "", "gitignore", 0))
    assert m2.ignored("keep.log")


def test_cannot_reinclude_inside_ignored_dir():
    m = _m(("logs/\n!logs/keep.txt\n", "", "gitignore", 0))
    assert m.ignored("logs/x.txt")
    # git: re-including a file under an excluded directory is impossible
    assert m.ignored("logs/keep.txt")


def test_anchoring_semantics():
    # leading slash anchors to the ignore file's directory
    m = _m(("/top.txt\nsub/inner.txt\n", "", "gitignore", 0))
    assert m.ignored("top.txt")
    assert not m.ignored("a/top.txt")
    # mid-slash pattern is anchored too (git rule)
    assert m.ignored("sub/inner.txt")
    assert not m.ignored("x/sub/inner.txt")


def test_double_star():
    m = _m(("**/gen\ndocs/**\na/**/b\n", "", "gitignore", 0))
    assert m.ignored("gen")
    assert m.ignored("x/y/gen")
    assert m.ignored("docs/any/depth.txt")
    assert not m.ignored("docs")             # docs/** matches inside only
    assert m.ignored("a/b")                  # zero middle components
    assert m.ignored("a/x/y/b")
    assert not m.ignored("c/a/b")            # anchored (contains '/')


def test_char_class_and_question():
    m = _m(("file[0-9].txt\nv?.c\n", "", "gitignore", 0))
    assert m.ignored("file7.txt")
    assert not m.ignored("fileA.txt")
    assert m.ignored("v1.c")
    assert not m.ignored("v10.c")


def test_nested_ignore_files_relative_to_their_dir():
    m = _m(
        ("*.log\n", "", "gitignore", 0),
        ("*.tmp\n/local.txt\n", "sub", "gitignore", 1),
    )
    assert m.ignored("root.log")
    assert m.ignored("sub/a.log")            # parent rule applies below
    assert m.ignored("sub/a.tmp")
    assert not m.ignored("a.tmp")            # child rule NOT above its dir
    assert m.ignored("sub/local.txt")        # anchored to sub/
    assert not m.ignored("sub/deep/local.txt")


def test_deeper_file_overrides_parent():
    m = _m(
        ("*.tmp\n", "", "gitignore", 0),
        ("!keep.tmp\n", "sub", "gitignore", 1),
    )
    assert m.ignored("sub/x.tmp")
    assert not m.ignored("sub/keep.tmp")     # deeper negation wins
    assert m.ignored("keep.tmp")             # only below sub/


def test_ckignore_higher_precedence_than_gitignore():
    m = _m(
        ("!special.bin\n", "", "gitignore", 0),
        ("*.bin\n", "", "ckignore", 0),
    )
    # ckignore class outranks gitignore regardless of file order
    assert m.ignored("special.bin")


def test_multiple_hierarchical_ckignore_merge():
    """The reference's test_multiple_ckignore_files_merge_correctly."""
    m = _m(
        ("*.log\n", "", "ckignore", 0),
        ("*.tmp\n", "subdir", "ckignore", 1),
        ("*.cache\n", "subdir/deeper", "ckignore", 2),
    )
    assert m.ignored("root.log")
    assert m.ignored("subdir/mid.log")
    assert m.ignored("subdir/mid.tmp")
    assert m.ignored("subdir/deeper/deep.log")
    assert m.ignored("subdir/deeper/deep.tmp")
    assert m.ignored("subdir/deeper/deep.cache")
    assert not m.ignored("subdir/deeper/deep.txt")
    assert not m.ignored("mid.tmp")          # subdir rule not at root
    assert not m.ignored("subdir/mid.cache")


def test_trailing_space_and_escapes():
    m = _m(("*.log   \n\\#literal\nsp\\ ace.txt\n", "", "gitignore", 0))
    assert m.ignored("x.log")
    assert m.ignored("#literal")
    assert m.ignored("sp ace.txt")


# --------------------------------------------------------------------------
# driver-side collection + end-to-end connector
# --------------------------------------------------------------------------


def _write(p, text):
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as fh:
        fh.write(text)


def test_collect_and_git_exclude(tmp_path):
    root = str(tmp_path)
    _write(f"{root}/visible.txt", "v")
    _write(f"{root}/excluded_dir/hidden.txt", "h")
    _write(f"{root}/.git/info/exclude", "/excluded_dir\n")
    m = collect_ignore_rules(root)
    assert m is not None
    assert m.ignored("excluded_dir/hidden.txt")
    assert not m.ignored("visible.txt")
    # reference: respect_gitignore=false disables .git/info/exclude
    assert collect_ignore_rules(root, respect_gitignore=False) is None


def test_collect_prunes_ignored_subtrees(tmp_path):
    """git never reads ignore files inside ignored subtrees — the walk
    must prune them (both for parity and so node_modules-sized ignored
    dirs don't dominate connector startup)."""
    root = str(tmp_path)
    _write(f"{root}/.gitignore", "blocked/\n")
    _write(f"{root}/blocked/.gitignore", "!never-collected\n")
    _write(f"{root}/blocked/deep/file.txt", "x")
    _write(f"{root}/ok/.gitignore", "*.tmp\n")
    _write(f"{root}/ok/file.tmp", "t")
    m = collect_ignore_rules(root)
    bases = {r.base for r in m.rules}
    assert "blocked" not in bases  # its .gitignore was never read
    assert "ok" in bases
    assert m.ignored("blocked/deep/file.txt")
    assert m.ignored("ok/file.tmp")
    # prune_dir_names: default-excluded dir names are not walked either
    _write(f"{root}/node_modules/.gitignore", "!x\n")
    m2 = collect_ignore_rules(root, prune_dir_names=frozenset({"node_modules"}))
    assert "node_modules" not in {r.base for r in m2.rules}


def test_collect_ckignore_without_gitignore(tmp_path):
    """Mirrors test_ckignore_works_without_gitignore."""
    root = str(tmp_path)
    _write(f"{root}/.gitignore", "*.git\n")
    _write(f"{root}/.ckignore", "*.ck\n")
    _write(f"{root}/normal.txt", "n")
    _write(f"{root}/ignored_by_git.git", "g")
    _write(f"{root}/ignored_by_ck.ck", "c")
    m = collect_ignore_rules(root, respect_gitignore=False, use_ckignore=True)
    assert not m.ignored("normal.txt")
    assert not m.ignored("ignored_by_git.git")
    assert m.ignored("ignored_by_ck.ck")
    both_off = collect_ignore_rules(root, respect_gitignore=False, use_ckignore=False)
    assert both_off is None


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ignoretree"))
    _write(f"{root}/keep.py", "print('k')")
    _write(f"{root}/root.log", "log")
    _write(f"{root}/important.log", "keep me")
    _write(f"{root}/sub/mid.py", "x = 1")
    _write(f"{root}/sub/mid.tmp", "t")
    _write(f"{root}/sub/deep/leaf.py", "y = 2")
    _write(f"{root}/sub/deep/leaf.cache", "c")
    _write(f"{root}/gen/out.py", "z = 3")
    _write(f"{root}/.gitignore", "*.log\n!important.log\ngen/\n")
    _write(f"{root}/sub/.gitignore", "*.tmp\n")
    _write(f"{root}/sub/deep/.ckignore", "*.cache\n")
    return root


def test_read_source_tree_honors_ignore_files(spark, tree):
    from ck_spark.sources.fs import read_source_tree

    paths = {
        r["path"]
        for r in read_source_tree(spark, tree).select("path").collect()
    }
    assert paths == {"keep.py", "important.log", "sub/mid.py", "sub/deep/leaf.py"}

    # reference parity: disabling both flags keeps everything
    paths_all = {
        r["path"]
        for r in read_source_tree(
            spark, tree, respect_gitignore=False, use_ckignore=False
        ).select("path").collect()
    }
    assert {"root.log", "sub/mid.tmp", "sub/deep/leaf.cache", "gen/out.py"} <= paths_all
