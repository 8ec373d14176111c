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

# The spirit of ck's DEFAULT_EXCLUDES (a representative subset; the full
# reference list covers the same directory families).
DEFAULT_EXCLUDE_GLOBS = [
    ".git/*", "node_modules/*", "target/*", "build/*", "dist/*",
    "__pycache__/*", "*.min.js", "*.lock", ".venv/*", "vendor/*",
]


def glob_to_regex(glob: str) -> str:
    """Translate a ck-style glob to a Java-compatible regex with globset's
    component semantics (ck-engine/src/lib.rs:1062-1086):

    - `*` and `?` match within ONE path component (never cross `/`)
    - `**` crosses separators (zero or more components)
    - the glob matches any component-aligned subpath, so `build/*`
      excludes `build/x`, `a/build/x` and `a/build/x/y`, and a bare name
      like `node_modules` or `*.lock` matches that component at any depth
      (the reference matches globs against the full path AND each
      component)."""
    out = []
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
        else:
            out.append(re.escape(ch))
        i += 1
    return "(?:^|/)" + "".join(out) + "(?:/|$)"


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
