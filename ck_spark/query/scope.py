"""Path-scope filters: include prefixes, exclude globs, default excludes.

The rebuild of ck's include-pattern filter (canonicalized prefix match,
ck-engine/src/lib.rs:142-183), exclude globs (globset over full path and
components, ck-engine/src/lib.rs:1062-1086) and the built-in default
exclusion list (ck-core/src/lib.rs:415-453 — VCS dirs, build artifacts,
dependency dirs). Globs compile to Java-regex predicates so the filter
stays a Catalyst expression (pushed into the scan for grep mode; applied
inside the segment scorer for index queries).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ck's DEFAULT_EXCLUDES verbatim (ck-core/src/lib.rs:417-453): bare names
# matched as path COMPONENTS at any depth, exactly should_exclude_path's
# component loop. The two suffix globs are this engine's additions for
# generated-artifact noise.
DEFAULT_EXCLUDE_GLOBS = [
    ".ck", ".fastembed_cache", ".cache", "__pycache__",
    ".git", ".svn", ".hg",
    "target", "build", "dist", "node_modules", ".gradle", ".mvn",
    "bin", "obj",
    "venv", ".venv", "env", ".env", "virtualenv",
    ".vscode", ".idea", ".eclipse",
    "tmp", "temp", ".tmp",
    "*.min.js", "*.lock",
]


def glob_to_regex(glob: str) -> str:
    """Translate a ck-style glob to a Java-compatible regex with globset's
    semantics as applied by the reference (should_exclude_path,
    ck-engine/src/lib.rs:1073-1086 — the globset is matched against the
    FULL path and against each SINGLE component):

    - `*` and `?` match within ONE path component (never cross `/`)
    - `**` crosses separators (zero or more components)
    - `[abc]` / `[!abc]` character classes; `{a,b}` alternation (globset)
    - a SINGLE-component glob (`node_modules`, `*.lock`) floats: it
      matches that component at any depth
    - a MULTI-component glob (`build/cache`, `src/**/gen`) anchors at the
      path START, like globset's full-path match; matching a directory
      also excludes everything under it (the walker analogue: an excluded
      dir is pruned)."""
    out = []
    brace_depth = 0
    i, n = 0, len(glob)
    while i < n:
        ch = glob[i]
        if ch == "*":
            if i + 1 < n and glob[i + 1] == "*":
                out.append(".*")
                i += 2
                # collapse a following separator into the ** ("a/**/b"
                # also matches "a/b": zero components)
                if i < n and glob[i] == "/":
                    out[-1] = "(?:.*/)?"
                    i += 1
                continue
            out.append("[^/]*")
        elif ch == "?":
            out.append("[^/]")
        elif ch == "{":
            brace_depth += 1
            out.append("(?:")
        elif ch == "}" and brace_depth > 0:
            brace_depth -= 1
            out.append(")")
        elif ch == "," and brace_depth > 0:
            out.append("|")
        elif ch == "[":
            j = i + 1
            neg = j < n and glob[j] in "!^"
            if neg:
                j += 1
            if j < n and glob[j] == "]":  # leading ']' is literal
                j += 1
            while j < n and glob[j] != "]":
                j += 1
            if j < n:  # well-formed class
                body = glob[i + 1 : j].replace("\\", "\\\\")
                if body.startswith(("!", "^")):
                    body = "^" + body[1:]
                out.append(f"[{body}]")
                i = j
            else:
                out.append(re.escape(ch))
        elif ch == "\\" and i + 1 < n:
            out.append(re.escape(glob[i + 1]))
            i += 1
        else:
            out.append(re.escape(ch))
        i += 1
    prefix = "^" if "/" in glob else "(?:^|/)"
    return prefix + "".join(out) + "(?:/|$)"


def path_scope_pred(
    path_col: Column,
    include_prefixes: list[str] | None = None,
    exclude_globs: list[str] | None = None,
) -> Column:
    """Boolean Column: path is inside the include scope and matches no
    exclude glob."""
    pred = F.lit(True)
    if include_prefixes:
        inc = None
        for p in include_prefixes:
            c = path_col.startswith(p)
            inc = c if inc is None else (inc | c)
        pred = pred & inc
    for g in exclude_globs or []:
        pred = pred & ~path_col.rlike(glob_to_regex(g))
    return pred
