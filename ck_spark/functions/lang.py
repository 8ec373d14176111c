"""Language-from-extension (X3): the reusable operator form of ck's
Language::from_path (/root/reference/ck-core/src/lib.rs:63-95) —
case-insensitive extension lookup, None for unknown/missing extensions.

Both a pure function (drivers, tests, the chunk dispatcher) and a
Catalyst Column expression (whole-stage codegen — a chained CASE over a
literal map, no UDF) are provided; they agree by construction because
the Column is generated from the same table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# extension (lowercase) -> canonical language name (ck-core/src/lib.rs:63-88)
EXTENSION_LANGS: dict[str, str] = {
    "rs": "rust",
    "py": "python",
    "js": "javascript",
    "ts": "typescript", "tsx": "typescript",
    "hs": "haskell", "lhs": "haskell",
    "go": "go",
    "java": "java",
    "c": "c",
    "cpp": "cpp", "cc": "cpp", "cxx": "cpp", "c++": "cpp",
    "h": "cpp", "hpp": "cpp",  # headers assumed C++ like the reference
    "cs": "csharp",
    "rb": "ruby",
    "php": "php",
    "swift": "swift",
    "kt": "kotlin", "kts": "kotlin",
    "zig": "zig",
    "dart": "dart",
    "ex": "elixir", "exs": "elixir",
    "md": "markdown", "markdown": "markdown", "mdx": "markdown",
    "pdf": "pdf",
}


def lang_from_path(path: str | None) -> str | None:
    """Pure form: 'src/Main.RS' -> 'rust'; None when no/unknown ext.
    A dotfile like '.gitignore' has no extension (mirrors Path::extension)."""
    if not path:
        return None
    base = path.rsplit("/", 1)[-1]
    if "." not in base[1:]:
        return None
    ext = base.rsplit(".", 1)[-1].lower()
    return EXTENSION_LANGS.get(ext)


def lang_from_path_col(path_col: Column) -> Column:
    """Column form (codegen, no UDF): extension -> language, NULL unknown."""
    base = F.element_at(F.split(path_col, "/"), -1)
    # Path::extension semantics: the suffix after the last '.', absent for
    # dotfiles and extension-less names
    has_ext = F.substring(base, 2, 1_000_000).contains(".")
    ext = F.lower(F.element_at(F.split(base, "\\."), -1))
    mapping = F.create_map(
        *[F.lit(x) for kv in EXTENSION_LANGS.items() for x in kv]
    )
    return F.when(has_ext, F.element_at(mapping, ext))
