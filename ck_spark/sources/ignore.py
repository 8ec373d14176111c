"""Hierarchical .gitignore / .ckignore / .git-info-exclude semantics for
the filesystem connector — the rebuild of ck's ignore handling
(ck-index/src/lib.rs:211-262: WalkBuilder with git_ignore + git_exclude +
custom `.ckignore` files; hierarchical merge asserted by the reference's
own tests, ck-index/src/lib.rs:2057-2176 and ck-engine/src/lib.rs:
1693-1856).

Design for Spark: ignore FILES are tiny and sparse, so they are collected
once driver-side (`collect_ignore_rules`) and compiled into an ordered
rule list; the per-file verdict is evaluated executor-side by an
Arrow-batched pandas UDF over the repo-relative path column only (short
strings — the content never rides through Python). At 10^12 files across
many repos the same rule objects are built per-repo from a distributed
scan of `**/.gitignore` and broadcast; the matcher below is that seam.

Matching implements git's documented semantics:

- blank lines and `#` comments are skipped (`\\#` escapes a literal hash)
- trailing spaces are stripped unless backslash-escaped
- `!` negates (re-include); later rules override earlier ones
- a trailing `/` makes the rule match DIRECTORIES only
- a rule containing `/` (other than trailing) is anchored to the ignore
  file's own directory; otherwise it matches the basename at any depth
  below it
- `*`/`?` never cross `/`; `[...]` classes supported; `**` crosses
  components (leading `**/`, trailing `/**`, and infix `/**/`)
- a file inside an ignored directory cannot be re-included by a negation
  (git prunes the walk at the directory)

Precedence (highest wins), mirroring the `ignore` crate's source order:
`.ckignore` (deeper file wins) > `.gitignore` (deeper wins) >
`.git/info/exclude`. Implemented as last-match-wins over a list sorted by
(class, depth, line).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

import pandas as pd

_CLASS_RANK = {"git_exclude": 0, "gitignore": 1, "ckignore": 2}


@dataclass(frozen=True)
class IgnoreRule:
    base: str          # ignore file's directory, repo-relative ('' = root)
    regex: re.Pattern  # full-match regex over the path relative to base
    negated: bool      # '!' rule: re-include
    dir_only: bool     # trailing '/': applies to directory prefixes only
    rank: tuple        # (class, depth, line) — sort key; later = higher


def _seg_to_regex(seg: str) -> str:
    """One path segment of a gitignore glob -> regex (no '/' crossing)."""
    out = []
    i, n = 0, len(seg)
    while i < n:
        c = seg[i]
        if c == "*":
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "[":
            j = i + 1
            neg = j < n and seg[j] in "!^"
            if neg:
                j += 1
            if j < n and seg[j] == "]":  # first ']' is literal
                j += 1
            while j < n and seg[j] != "]":
                j += 1
            if j < n:  # well-formed class
                body = seg[i + 1 : j].replace("\\", "\\\\")
                if body.startswith(("!", "^")):
                    body = "^" + body[1:]
                out.append(f"[{body}]")
                i = j
            else:
                out.append(re.escape(c))
        elif c == "\\" and i + 1 < n:
            out.append(re.escape(seg[i + 1]))
            i += 1
        else:
            out.append(re.escape(c))
        i += 1
    return "".join(out)


def _pattern_to_regex(pat: str, anchored: bool) -> re.Pattern:
    """gitignore glob -> compiled full-match regex over the base-relative
    path. Non-anchored rules match the FINAL component at any depth (the
    directory-component case is covered by the caller evaluating every
    ancestor prefix). A matched directory also matches everything under it."""
    segs = pat.split("/")
    parts: list[str] = []
    for idx, s in enumerate(segs):
        if s == "**":
            if idx == len(segs) - 1:
                parts.append("<TAIL>")  # trailing /**: everything under
            else:
                parts.append("<ANY>")   # **/: zero or more components
        else:
            parts.append(_seg_to_regex(s))
    body = ""
    for idx, p in enumerate(parts):
        if p == "<ANY>":
            body += "(?:[^/]+/)*"
        elif p == "<TAIL>":
            body += ".+"
        else:
            body += p
            if idx < len(parts) - 1:
                body += "/"
    prefix = "" if anchored else "(?:^|.*/)"
    # "(?:/.*)?" — a rule matching a directory prefix ignores its subtree
    return re.compile(f"{prefix}{body}(?:/.*)?$")


def parse_ignore_file(text: str, base: str, klass: str, depth: int) -> list[IgnoreRule]:
    rules: list[IgnoreRule] = []
    for line_no, raw in enumerate(text.splitlines()):
        line = raw.rstrip("\n")
        # strip unescaped trailing spaces
        stripped = re.sub(r"(?<!\\) +$", "", line)
        if not stripped or stripped.startswith("#"):
            continue
        if stripped.startswith("\\#"):
            stripped = stripped[1:]
        negated = stripped.startswith("!")
        if negated:
            stripped = stripped[1:]
        elif stripped.startswith("\\!"):
            stripped = stripped[1:]  # '\!name' = literal leading '!'
        if not stripped:
            continue
        dir_only = stripped.endswith("/") and not stripped.endswith("\\/")
        if dir_only:
            stripped = stripped.rstrip("/")
        # anchored iff a '/' remains anywhere but a leading '**/'
        core = stripped[1:] if stripped.startswith("/") else stripped
        anchored = stripped.startswith("/") or "/" in core
        try:
            rx = _pattern_to_regex(core, anchored)
        except re.error:
            continue  # malformed glob: git skips it too
        rules.append(IgnoreRule(
            base=base, regex=rx, negated=negated, dir_only=dir_only,
            rank=(_CLASS_RANK[klass], depth, line_no),
        ))
    return rules


class IgnoreMatcher:
    """Ordered-rule matcher with per-directory memoization. ``ignored(p)``
    implements git's walk semantics on a flat path list: a path is ignored
    iff its nearest decided ancestor directory is ignored, or the
    last-matching rule at its own level says so."""

    def __init__(self, rules: list[IgnoreRule]):
        self.rules = sorted(rules, key=lambda r: r.rank)
        self._dir_cache: dict[str, bool] = {"": False}

    def _decision(self, relpath: str, is_dir: bool) -> bool | None:
        d = None
        for r in self.rules:  # sorted ascending: later match wins
            if r.dir_only and not is_dir:
                continue
            if r.base:
                if not relpath.startswith(r.base + "/"):
                    continue
                sub = relpath[len(r.base) + 1 :]
            else:
                sub = relpath
            if r.regex.match(sub):
                d = not r.negated
        return d

    def _dir_ignored(self, d: str) -> bool:
        cached = self._dir_cache.get(d)
        if cached is not None:
            return cached
        parent = d.rsplit("/", 1)[0] if "/" in d else ""
        if self._dir_ignored(parent):
            out = True
        else:
            dec = self._decision(d, is_dir=True)
            out = bool(dec)
        self._dir_cache[d] = out
        return out

    def ignored(self, relpath: str) -> bool:
        parent = relpath.rsplit("/", 1)[0] if "/" in relpath else ""
        if self._dir_ignored(parent):
            return True
        dec = self._decision(relpath, is_dir=False)
        return bool(dec)


def collect_ignore_rules(
    root: str,
    respect_gitignore: bool = True,
    use_ckignore: bool = True,
    prune_dir_names: frozenset[str] | None = None,
) -> IgnoreMatcher | None:
    """Driver-side sweep for ignore files under ``root`` (they are tiny:
    this reads only the ignore files themselves, never content). Returns
    None when the tree carries no ignore rules — the connector then skips
    the predicate entirely.

    The walk PRUNES directories already decided ignored by the rules
    collected so far (git's own read order: git never reads .gitignore
    files inside ignored subtrees, and an unpruned walk over node_modules
    and friends can dominate connector startup on large roots). The
    pruning can only be exact because os.walk is top-down — every
    ancestor's rules exist before we descend. ``prune_dir_names`` adds
    the connector's default-exclude directory names to the prune set
    (their contents are dropped by the scan predicate anyway)."""
    if not (respect_gitignore or use_ckignore):
        return None
    rules: list[IgnoreRule] = []
    root = os.path.abspath(root)
    matcher: IgnoreMatcher | None = None
    n_rules_built = 0
    for base_abs, dirs, files in os.walk(root):
        rel = os.path.relpath(base_abs, root).replace(os.sep, "/")
        rel = "" if rel == "." else rel
        depth = 0 if not rel else rel.count("/") + 1
        if respect_gitignore and ".gitignore" in files:
            try:
                with open(os.path.join(base_abs, ".gitignore"), encoding="utf-8",
                          errors="replace") as fh:
                    rules.extend(parse_ignore_file(fh.read(), rel, "gitignore", depth))
            except OSError:
                pass
        if use_ckignore and ".ckignore" in files:
            try:
                with open(os.path.join(base_abs, ".ckignore"), encoding="utf-8",
                          errors="replace") as fh:
                    rules.extend(parse_ignore_file(fh.read(), rel, "ckignore", depth))
            except OSError:
                pass
        if respect_gitignore and ".git" in dirs:
            exc = os.path.join(base_abs, ".git", "info", "exclude")
            if os.path.isfile(exc):
                try:
                    with open(exc, encoding="utf-8", errors="replace") as fh:
                        rules.extend(parse_ignore_file(fh.read(), rel, "git_exclude", depth))
                except OSError:
                    pass
        dirs[:] = [d for d in dirs if d != ".git"]  # never walk .git bodies
        if prune_dir_names:
            dirs[:] = [d for d in dirs if d not in prune_dir_names]
        if rules:
            if len(rules) != n_rules_built:
                matcher = IgnoreMatcher(rules)  # rebuild incl. fresh memo
                n_rules_built = len(rules)
            keep = []
            for d in dirs:
                sub = f"{rel}/{d}" if rel else d
                if not matcher._dir_ignored(sub):
                    keep.append(d)
            dirs[:] = keep
    return IgnoreMatcher(rules) if rules else None


def keep_path_udf(matcher: IgnoreMatcher):
    """Arrow pandas UDF: relpath -> True iff NOT ignored. The matcher (a
    small rule list) ships in the task closure — the broadcast-variable
    analogue at this scale."""
    from pyspark.sql import functions as F

    rules = matcher.rules

    @F.pandas_udf("boolean")
    def _udf(paths: pd.Series) -> pd.Series:
        m = IgnoreMatcher(rules)  # fresh per-batch dir-decision memo
        return paths.map(lambda p: not m.ignored(p))

    return _udf
