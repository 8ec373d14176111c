"""Filesystem source: a real recursive directory scan into the corpus
shape — the rebuild of ck's directory walk + ignore semantics (S1/S2:
ck-engine/src/lib.rs walkdir + DEFAULT_EXCLUDES at ck-core/src/lib.rs:
415-453). A reference user points ck at a source tree; this connector is
the Spark equivalent: `read_source_tree(spark, root)` yields the corpus
DataFrame that build_index / grep / chunking consume.

Spark-first: `binaryFile` format scans the tree distributed (file listing
parallelized by the driver, content read by executors), exclude globs
apply to the repo-relative path BEFORE content is read where possible
(the filter is a scan-level predicate on the file-status columns), and
UTF-8 decoding is JVM-side make_valid_utf8 over the binary→string cast
(replacement chars, exactly from_utf8_lossy) — no Python in the ingest
path.

`commit` stays a caller token (default "worktree"): doc ids must be
stable per path so the sha256 diff in update_index classifies changed
files as MODIFIED, mirroring ck's mtime-gated re-index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ck_spark.functions.lang import lang_from_path_col
from ck_spark.query.scope import DEFAULT_EXCLUDE_GLOBS, path_scope_pred

DEFAULT_MAX_FILE_BYTES = 16 * 1024 * 1024  # skip blobs like ck skips huge files


def read_source_tree(
    spark: SparkSession,
    root: str,
    repo: str | None = None,
    commit: str = "worktree",
    include_prefixes: list[str] | None = None,
    exclude_globs: list[str] | None = None,
    use_default_excludes: bool = True,
    respect_gitignore: bool = True,
    use_ckignore: bool = True,
    max_file_bytes: int = DEFAULT_MAX_FILE_BYTES,
) -> DataFrame:
    """Recursive scan of `root` into (repo, path, commit, lang, content).

    - path is repo-relative with '/' separators
    - default excludes (.git, node_modules, target, …) apply unless
      disabled; extra exclude_globs use globset component semantics
    - `.gitignore` files in the tree + `.git/info/exclude` are honored
      when respect_gitignore (hierarchical, with negations, exactly git's
      documented semantics); `.ckignore` files likewise when use_ckignore
      and with HIGHER precedence — mirroring ck's WalkBuilder setup
      (ck-index/src/lib.rs:211-262). Rule files are collected driver-side
      (tiny); the verdict is an Arrow-batched predicate over relpath only.
    - files larger than max_file_bytes are skipped (size predicate on the
      file-status column — their content is never shipped)
    - content is lossy-UTF-8 decoded; binary detection stays downstream
      (build_index flags NUL bytes, which survive the cast)
    """
    # normalize BEFORE building the locate key: a trailing slash would make
    # the key "<root>//" (never present), silently dropping every row
    root = os.path.abspath(root).rstrip("/")
    if not root:
        # scanning "/" would make the relativization key ambiguous (any
        # "/" matches inside the scheme rendering) — and is never what a
        # code-search user means
        raise ValueError("refusing to scan the filesystem root '/'")
    repo = repo or os.path.basename(root) or "repo"
    globs = list(exclude_globs or [])
    if use_default_excludes:
        globs = list(DEFAULT_EXCLUDE_GLOBS) + globs

    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    # binaryFile yields a URI whose scheme/authority rendering varies by
    # store ("file:/abs", "file:///abs", "hdfs://nn/abs", …). Relativize by
    # LOCATING the literal "<root>/" substring (no scheme assumptions, no
    # regex-escaping pitfalls with odd roots) and slicing past it; stores
    # that percent-encode path characters are matched via the quoted
    # rendering of the same key. Rows matching neither are dropped — but
    # LOUDLY (the emptiness check below), never silently.
    from urllib.parse import quote

    key = root + "/"
    qkey = quote(key)
    start = F.locate(key, F.col("path"))
    rel = F.col("path").substr(start + F.lit(len(key)), F.lit(1_000_000))
    if qkey != key:
        qstart = F.locate(qkey, F.col("path"))
        rel = F.when(start > 0, rel).otherwise(
            F.url_decode(F.col("path").substr(qstart + F.lit(len(qkey)), F.lit(1_000_000)))
        )
        start = F.greatest(start, qstart)

    from ck_spark.ops.pdf import extract_pdf_text_udf

    located = raw.where(start > 0)
    # relativization failing on EVERY row of a non-empty listing means the
    # key never matched (unexpected URI rendering) — fail loudly instead
    # of returning a silently empty corpus
    if located.isEmpty() and not raw.isEmpty():
        sample = raw.select("path").limit(1).collect()[0]["path"]
        raise RuntimeError(
            f"could not relativize any scanned path against root {root!r} "
            f"(sample URI: {sample!r}) — unexpected path rendering from "
            "this filesystem/store"
        )
    scoped = (
        located.where(F.col("length") <= F.lit(int(max_file_bytes)))
        .withColumn("relpath", rel)
        .where(path_scope_pred(F.col("relpath"), include_prefixes, globs))
    )

    if respect_gitignore or use_ckignore:
        from ck_spark.sources.ignore import collect_ignore_rules, keep_path_udf

        matcher = collect_ignore_rules(
            root, respect_gitignore=respect_gitignore, use_ckignore=use_ckignore,
            # plain-name exclude globs (node_modules, target, …) match whole
            # path components, so their subtrees never reach the scan —
            # don't walk them for ignore files either
            prune_dir_names=frozenset(
                g for g in globs if "*" not in g and "?" not in g
                and "[" not in g and "/" not in g
            ),
        )
        if matcher is not None:  # no ignore files -> no extra predicate
            scoped = scoped.where(keep_path_udf(matcher)(F.col("relpath")))

    def as_corpus(df, content_col):
        return df.select(
            F.lit(repo).alias("repo"),
            F.col("relpath").alias("path"),
            F.lit(commit).alias("commit"),
            lang_from_path_col(F.col("relpath")).alias("lang"),
            content_col.alias("content"),
        )

    # two branches rather than F.when: a pandas UDF inside when() is
    # extracted into an ArrowEvalPython node that runs over EVERY row, so
    # all non-PDF bytes would round-trip through Python. Split keeps the
    # text branch pure-JVM (make_valid_utf8 over the cast — the bare cast
    # reinterprets bytes and breaks Arrow downstream) and ships only .pdf
    # payloads to the extractor (S4, ops/pdf.py — the pdf_extract
    # preprocessing analogue, ck-index/src/lib.rs:1561-1596).
    is_pdf = F.lower(F.col("relpath")).endswith(".pdf")
    text_part = as_corpus(
        scoped.where(~is_pdf),
        F.expr("make_valid_utf8(cast(content as string))"),
    )
    pdf_part = as_corpus(
        scoped.where(is_pdf), extract_pdf_text_udf()(F.col("content"))
    )
    return text_part.unionByName(pdf_part)


def tree_snapshot_token(root: str) -> str:
    """Cheap change token for build_index(snapshot_id=…): aggregate
    (mtime, size) over the tree — the driver-side analogue of ck's
    manifest mtime fast path. O(files) stat calls, no content reads."""
    acc_m, acc_s, n = 0, 0, 0
    for base, dirs, files in os.walk(root):
        dirs.sort()
        for f in sorted(files):
            try:
                st = os.stat(os.path.join(base, f))
            except OSError:
                continue
            acc_m = (acc_m * 1_000_003 + int(st.st_mtime_ns // 1_000_000)) % (1 << 61)
            acc_s = (acc_s * 1_000_033 + st.st_size) % (1 << 61)
            n += 1
    return f"tree-n{n}-m{acc_m}-s{acc_s}"
