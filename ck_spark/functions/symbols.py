"""Symbol-aware chunking: regex/indentation segmentation of code into
function/class/method/module chunks with ancestry, breadcrumbs, leading
trivia, gap filling, Haskell equation merging and striding.

Rebuilds the visible behavior of the reference's chunking subsystem
without a tree-sitter dependency (not available in this container):

- per-language kind tables              ck-chunk/src/lib.rs:913-1111
- build_chunk trivia/ancestry/breadcrumb ck-chunk/src/lib.rs:1113-1178
- gap filler (blank-line split)         ck-chunk/src/lib.rs:577-712
- Haskell equation/signature merger     ck-chunk/src/lib.rs:715-848
- small-chunk merger (markdown)         ck-chunk/src/lib.rs:2086-2176
- striding of oversized chunks          ck-chunk/src/lib.rs:1945-2084
- language dispatch (C1)                ck-chunk/src/lib.rs:248-298

Like the reference, enclosing symbols AND their nested members are both
emitted (a class chunk covers its methods, which also appear as their own
method chunks with ancestry/breadcrumb pointing at the class).

Spans are line-granular (a symbol starts at the first byte of its header
line — after extending up over decorators/attributes/doc comments — and
ends at the last byte of its final body line, including the line ending),
byte-exact against the \\n / \\r\\n / \\r line table.
"""

from __future__ import annotations

import bisect
import re
from dataclasses import dataclass, field

import pandas as pd

from ck_spark.functions.chunker import (
    chunk_text as generic_chunk_text,
    estimate_tokens,
    split_lines_with_offsets,
)

DEFAULT_MAX_TOKENS = 8192      # ChunkConfig::default (ck-chunk/src/lib.rs:225)
DEFAULT_STRIDE_OVERLAP = 1024  # 12.5% overlap
MARKDOWN_TARGET_TOKENS = 1024  # get_model_chunk_config default (lib.rs:17-41)

PARSEABLE_LANGS = {
    "python", "py",
    "rust", "rs",
    "javascript", "js", "typescript", "ts",
    "go",
    "haskell", "hs",
    "markdown", "md",
    "ruby", "rb",
    "java",
    "c", "cpp", "cc", "cxx", "h", "hpp",
    "csharp", "cs",
    "zig", "dart", "elixir", "ex", "exs",
}

_CANONICAL = {"python", "rust", "javascript", "typescript", "go",
              "haskell", "markdown", "ruby", "java", "c", "cpp", "csharp",
              "zig", "dart", "elixir"}


def canonical_lang(lang: str | None) -> str | None:
    aliases = {"py": "python", "rs": "rust", "js": "javascript",
               "ts": "typescript", "hs": "haskell", "md": "markdown",
               "rb": "ruby", "cs": "csharp",
               "cc": "cpp", "cxx": "cpp", "h": "cpp", "hpp": "cpp",
               "ex": "elixir", "exs": "elixir"}
    if not lang:
        return None
    la = lang.lower()
    la = aliases.get(la, la)
    return la if la in _CANONICAL else None


@dataclass
class SymbolChunk:
    chunk_id: int
    byte_start: int
    byte_end: int
    line_start: int  # 1-indexed inclusive
    line_end: int
    text: str
    estimated_tokens: int
    chunk_type: str          # text | function | class | method | module
    name: str | None = None
    breadcrumb: str | None = None
    ancestry: list[str] = field(default_factory=list)
    stride_index: int | None = None
    total_strides: int | None = None


@dataclass
class _Sym:
    kind: str
    name: str
    start: int          # line index (0-based), after trivia extension
    end: int            # line index (0-based, inclusive)
    ancestry: list[str]


# ---------------------------------------------------------------------------
# per-language detectors (the kind tables, ck-chunk/src/lib.rs:913-1049)
# ---------------------------------------------------------------------------

_PY_HEADER = re.compile(r"^(\s*)(?:async\s+)?(def|class)\s+(\w+)")
_PY_TRIVIA = re.compile(r"^\s*(@|#)")


def _indent_width(s: str) -> int:
    if not s.strip():
        return 0
    e = s.expandtabs(4)
    return len(e) - len(e.lstrip())


def _detect_python_ast(text: str, lines: list[str]) -> list[_Sym] | None:
    """Grammar-exact python symbol detection via the stdlib parser — the
    closest thing this container has to tree-sitter (ck's chunker walks
    tree-sitter function_definition/class_definition nodes,
    ck-chunk/src/query_chunker.rs): headers, names, nesting and kinds come
    from the AST, so `def` inside strings/comments can't false-positive
    and multi-line signatures span correctly. Extents take
    max(AST end_lineno, indentation block_end) so trailing comment lines
    inside a block stay attached — the indentation detector's (and the
    trivia/gap machinery's) established semantics. Returns None when the
    source doesn't parse (partial files, python2 syntax); callers fall
    back to the indentation detector."""
    import ast

    try:
        tree = ast.parse(text)
    except (SyntaxError, ValueError, MemoryError, RecursionError):
        return None
    n = len(lines)
    out: list[_Sym] = []

    def block_end(i: int, indent: int) -> int:
        last = i
        j = i + 1
        while j < n:
            s = lines[j]
            if s.strip():
                if _indent_width(s) <= indent:
                    break
                last = j
            j += 1
        return last

    def walk(node, ancestry: list[str], parent_kind: str | None) -> None:
        for child in ast.iter_child_nodes(node):
            if isinstance(
                child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                is_class = isinstance(child, ast.ClassDef)
                if is_class:
                    kind = "class"
                elif parent_kind == "class":
                    kind = "method"
                else:
                    kind = "function"
                start = child.lineno - 1
                indent = _indent_width(lines[start]) if start < n else 0
                end = max(
                    (child.end_lineno or child.lineno) - 1,
                    block_end(start, indent),
                )
                out.append(_Sym(kind, child.name, start, end, list(ancestry)))
                walk(child, ancestry + [child.name],
                     "class" if is_class else "function")
            else:
                walk(child, ancestry, parent_kind)

    try:
        walk(tree, [], None)
    except RecursionError:
        return None
    return out


def _detect_python(lines: list[str]) -> list[_Sym]:
    """Indentation-scoped def/class detection with nesting. A block ends at
    the last non-blank line before the next statement at indent <= header's
    (mirrors function_definition/class_definition node extents)."""
    out: list[_Sym] = []
    n = len(lines)

    def block_end(i: int, indent: int) -> int:
        last = i
        j = i + 1
        while j < n:
            s = lines[j]
            if s.strip():
                if _indent_width(s) <= indent:
                    break
                last = j
            j += 1
        return last

    def walk(lo: int, hi: int, ancestry: list[str], parent_kind: str | None):
        i = lo
        while i <= hi:
            m = _PY_HEADER.match(lines[i])
            if m:
                indent = _indent_width(lines[i])
                kw, name = m.group(2), m.group(3)
                end = block_end(i, indent)
                if kw == "class":
                    kind = "class"
                elif parent_kind == "class":
                    kind = "method"   # adjust_chunk_type_for_context analogue
                else:
                    kind = "function"
                out.append(_Sym(kind, name, i, end, list(ancestry)))
                walk(i + 1, end, ancestry + [name], "class" if kw == "class" else "function")
                i = end + 1
            else:
                i += 1

    walk(0, n - 1, [], None)
    return out


# brace-language header tables: (regex, kind, container?) — kind mapping per
# classify_chunk_kind (ck-chunk/src/lib.rs:1053-1111)
_BRACE_TABLES: dict[str, list[tuple[re.Pattern, str, bool]]] = {
    "rust": [
        (re.compile(r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:default\s+)?(?:const\s+)?"
                    r"(?:async\s+)?(?:unsafe\s+)?(?:extern\s+\"[^\"]*\"\s+)?fn\s+(\w+)"),
         "function", False),
        (re.compile(r"^\s*(?:pub(?:\([^)]*\))?\s+)?struct\s+(\w+)"), "class", False),
        (re.compile(r"^\s*(?:pub(?:\([^)]*\))?\s+)?enum\s+(\w+)"), "class", False),
        (re.compile(r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:unsafe\s+)?trait\s+(\w+)"), "module", True),
        (re.compile(r"^\s*(?:unsafe\s+)?impl(?:<[^>]*>)?\s+(?:[\w:]+\s+for\s+)?([\w:]+)"),
         "module", True),
        (re.compile(r"^\s*(?:pub(?:\([^)]*\))?\s+)?mod\s+(\w+)"), "module", True),
    ],
    "go": [
        (re.compile(r"^func\s+\([^)]*\)\s+(\w+)\s*\("), "method", False),
        (re.compile(r"^func\s+(\w+)\s*\("), "function", False),
        (re.compile(r"^type\s+(\w+)\s"), "class", False),
        (re.compile(r"^(var|const)\s"), "module", False),
    ],
    "javascript": [
        (re.compile(r"^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s*\*?\s*(\w+)"),
         "function", False),
        (re.compile(r"^\s*(?:export\s+)?(?:default\s+)?(?:abstract\s+)?class\s+(\w+)"),
         "class", True),
        (re.compile(r"^\s*(?:export\s+)?(?:const|let|var)\s+(\w+)\s*=\s*"
                    r"(?:async\s*)?(?:\([^)]*\)|\w+)\s*=>"), "function", False),
        (re.compile(r"^\s*(?:export\s+)?(?:const|let|var)\s+(\w+)\s*=\s*"
                    r"(?:async\s+)?function"), "function", False),
    ],
    "java": [
        (re.compile(r"^\s*(?:(?:public|private|protected|static|final|abstract|synchronized)\s+)*"
                    r"(?:class)\s+(\w+)"), "class", True),
        (re.compile(r"^\s*(?:(?:public|private|protected|static)\s+)*interface\s+(\w+)"),
         "module", True),
        (re.compile(r"^\s*(?:(?:public|private|protected|static)\s+)*enum\s+(\w+)"),
         "class", True),
    ],
    "csharp": [
        (re.compile(r"^\s*(?:(?:public|private|protected|internal|static|sealed|abstract|partial)\s+)*"
                    r"class\s+(\w+)"), "class", True),
        (re.compile(r"^\s*(?:(?:public|private|protected|internal)\s+)*interface\s+(\w+)"),
         "module", True),
        (re.compile(r"^\s*(?:(?:public|private|protected|internal|static)\s+)*"
                    r"(?:struct|enum)\s+(\w+)"), "class", True),
        (re.compile(r"^\s*namespace\s+([\w.]+)"), "module", True),
    ],
    "c": [
        # function definition heuristic: type-ish prefix + name( ... with no
        # ';' on the line (a prototype would end in ';')
        (re.compile(r"^[A-Za-z_][\w\s\*]*?[\s\*](\w+)\s*\([^;]*$"), "function", False),
        (re.compile(r"^(\w+)\s*\([^;]*$"), "function", False),
        (re.compile(r"^\s*typedef\s+(?:struct|enum|union)\s*(\w*)"), "class", False),
        (re.compile(r"^\s*(?:struct|enum|union)\s+(\w+)\s*\{?\s*$"), "class", False),
    ],
    "zig": [
        (re.compile(r"^\s*(?:pub\s+)?(?:export\s+)?(?:inline\s+)?fn\s+(\w+)"),
         "function", False),
        (re.compile(r"^\s*test\s+\"([^\"]+)\""), "module", False),
        # container kinds incl. error sets (error{...} — no space form)
        (re.compile(r"^\s*(?:pub\s+)?const\s+(\w+)\s*=\s*(?:struct|enum|union|opaque|error)\b"),
         "class", False),
        (re.compile(r"^\s*(?:pub\s+)?const\s+(\w+)\s*=\s*@import\b"),
         "module", False),
        (re.compile(r"^\s*(comptime)\s*\{"), "module", False),
    ],
    "dart": [
        (re.compile(r"^\s*(?:abstract\s+)?class\s+(\w+)"), "class", True),
        (re.compile(r"^\s*mixin\s+(\w+)"), "class", True),
        (re.compile(r"^\s*enum\s+(\w+)"), "class", False),
        (re.compile(r"^\s*(?:[\w<>\[\],?]+\s+)?(\w+)\s*\([^;]*\)\s*(?:async\s*)?\{"),
         "function", False),
    ],
}
_BRACE_TABLES["typescript"] = _BRACE_TABLES["javascript"]
# C++ = C plus classes/namespaces/templates
_BRACE_TABLES["cpp"] = [
    (re.compile(r"^\s*(?:template\s*<[^>]*>\s*)?class\s+(\w+)"), "class", True),
    (re.compile(r"^\s*namespace\s+(\w+)"), "module", True),
] + _BRACE_TABLES["c"]

# methods inside a js/ts class body: name(args) { — excluding keywords
_JS_METHOD = re.compile(
    r"^\s*(?:static\s+)?(?:async\s+)?(?:get\s+|set\s+)?\*?\s*(\w+)\s*(?:<[^>]*>)?\([^;]*$"
)
# java/csharp methods & constructors: modifiers/return type words then
# name( — at least one leading word so field declarations don't match
_JVM_METHOD = re.compile(
    r"^\s*(?:[\w<>\[\],.?]+\s+)+(\w+)\s*\([^;]*$"
)
_JS_KEYWORDS = {"if", "for", "while", "switch", "catch", "return", "function",
                "new", "typeof", "await", "do", "else", "try"}

# function-like macro: '#define NAME(' — object-like '#define NAME v' is Text
_C_MACRO_FN = re.compile(r"^\s*#\s*define\s+(\w+)\(")

# C/C++ inline member function: type words, then name( — the '{' may be on
# the same line (one-liner body allowed: '[^;{]*' only constrains the ARG
# list) or a following line
_CPP_METHOD = re.compile(
    r"^\s*(?:[\w:<>,*&~\[\]]+\s+)+([\w~]+|operator\S*)\s*\([^;{]*\)\s*(?:const\s*)?(?:noexcept\s*)?"
)

_TRIVIA_RES = {
    "rust": re.compile(r"^\s*(///|//!|//|#\[|#!\[)"),
    "go": re.compile(r"^\s*//"),
    "javascript": re.compile(r"^\s*(//|/\*|\*|@)"),
    "typescript": re.compile(r"^\s*(//|/\*|\*|@)"),
    "python": _PY_TRIVIA,
    "haskell": re.compile(r"^\s*(--|\{-)"),
    "ruby": re.compile(r"^\s*#"),
    "java": re.compile(r"^\s*(//|/\*|\*|@)"),
    "csharp": re.compile(r"^\s*(//|/\*|\*|\[)"),
    "c": re.compile(r"^\s*(//|/\*|\*|#)"),
    "cpp": re.compile(r"^\s*(//|/\*|\*|#)"),
    "zig": re.compile(r"^\s*(///|//)"),
    "dart": re.compile(r"^\s*(///|//|@)"),
    "elixir": re.compile(r"^\s*(#|@doc|@moduledoc|@spec)"),
}

_STRING_OR_COMMENT = re.compile(
    r'"(?:\\.|[^"\\])*"'       # double-quoted strings
    r"|'(?:\\.|[^'\\])*'"      # single-quoted strings/chars
    r"|//.*$"                  # line comments
)


def _brace_delta(line: str) -> tuple[int, int]:
    """(net brace depth change, depth of first opening) with strings and
    line comments stripped — a heuristic (block comments / raw strings can
    fool it), acceptable for a regex rebuild and flagged in tests."""
    clean = _STRING_OR_COMMENT.sub("", line)
    return clean.count("{") - clean.count("}"), clean.count("{")


def _brace_block_end(lines: list[str], i: int, table=None) -> int:
    """Line index (inclusive) where the block opened at/after line i closes.
    If a ';' terminates the declaration before any '{', ends there; a
    brace-less declaration also ends at a blank line or at the next line
    matching a header pattern (so `const f = x => x * x` followed directly
    by `function g() {...}` never swallows g)."""
    depth = 0
    opened = False
    paren_depth = 0  # unclosed (/[ in the signature: still mid-declaration
    j = i
    n = len(lines)
    last_nonblank = i
    while j < n:
        clean = _STRING_OR_COMMENT.sub("", lines[j])
        if not opened and paren_depth <= 0:
            # the blank-line / next-header terminators only apply OUTSIDE
            # an open signature: a multi-line param list (or a grouped
            # `var (...)`) may legitimately contain blank lines before '{'
            if j > i and not lines[j].strip():
                # blank line before any '{'/';': the declaration ended
                # (brace-less one-liner like `const f = x => x * x`)
                return last_nonblank
            if j > i and table is not None and any(
                rx.match(lines[j]) for rx, _k, _c in table
            ):
                return last_nonblank  # next symbol starts: decl ended
        if not opened:
            brace_pos = clean.find("{")
            semi_pos = clean.find(";")
            if (paren_depth <= 0 and semi_pos != -1
                    and (brace_pos == -1 or semi_pos < brace_pos)):
                return j  # `struct Foo;` / `type A = B;` one-liner decl
        paren_depth += (clean.count("(") - clean.count(")")
                        + clean.count("[") - clean.count("]"))
        if lines[j].strip():
            last_nonblank = j
        d, _ = _brace_delta(lines[j])
        if d != 0 or "{" in clean:
            opened = opened or "{" in clean
        depth += d
        if opened and depth <= 0:
            return j
        j += 1
    return n - 1


def _detect_brace(lines: list[str], lang: str) -> list[_Sym]:
    table = _BRACE_TABLES[lang]
    out: list[_Sym] = []
    n = len(lines)

    def walk(lo: int, hi: int, ancestry: list[str], in_container: str | None):
        i = lo
        while i <= hi:
            line = lines[i]
            # function-like macros are Function chunks in the reference's
            # C/C++ captures (test_chunk_c_corner_cases: '#define MAX(a,b)'
            # -> Function, '#define VERSION 3' -> Text); ends at the last
            # backslash-continued line
            if lang in ("c", "cpp"):
                m = _C_MACRO_FN.match(line)
                if m:
                    end = i
                    while end < hi and lines[end].rstrip().endswith("\\"):
                        end += 1
                    out.append(_Sym("function", m.group(1), i, end, list(ancestry)))
                    i = end + 1
                    continue
            matched = False
            for rx, kind, is_container in table:
                m = rx.match(line)
                if m:
                    name = m.group(1) if m.groups() else kind
                    end = min(_brace_block_end(lines, i, table), hi)
                    k = kind
                    # fn nested in an impl/trait/class is a method; fns in
                    # a C++/C# NAMESPACE stay plain functions (the
                    # reference's captures qualify by node kind, and a
                    # namespace is not a type — test_chunk_cpp_corner_cases
                    # expects 'T add' inside `namespace math` as Function)
                    if kind == "function" and in_container in ("class", "module"):
                        k = "method"
                    out.append(_Sym(k, name, i, end, list(ancestry)))
                    if is_container and end > i:
                        if kind == "class":
                            child = "class"
                        elif kind == "module" and lang in ("cpp", "csharp"):
                            child = "namespace"
                        else:
                            child = "module"
                        walk(i + 1, end, ancestry + [name], child)
                    i = end + 1
                    matched = True
                    break
            if matched:
                continue
            # methods inside a class body (method_definition /
            # method_declaration — js/ts/java/csharp share the shape;
            # c/cpp inline member functions incl. one-liners)
            if in_container == "class" and lang in (
                "javascript", "typescript", "java", "csharp", "c", "cpp"
            ):
                if lang in ("c", "cpp"):
                    rx_m = _CPP_METHOD
                elif lang in ("java", "csharp"):
                    rx_m = _JVM_METHOD
                else:
                    rx_m = _JS_METHOD
                m = rx_m.match(line)
                # Allman style (java/csharp convention) puts '{' on the
                # NEXT line — accept a signature line whose following
                # non-blank line opens the body
                opens_next = False
                if m and "{" not in line and lang in ("java", "csharp"):
                    for j in range(i + 1, min(i + 3, hi + 1)):
                        nxt = lines[j].strip()
                        if not nxt:
                            continue
                        opens_next = nxt.startswith("{")
                        break
                if m and m.group(1) not in _JS_KEYWORDS and (
                    "{" in line or opens_next
                ):
                    end = min(_brace_block_end(lines, i), hi)
                    out.append(_Sym("method", m.group(1), i, end, list(ancestry)))
                    i = end + 1
                    continue
            i += 1

    walk(0, n - 1, [], None)
    return out


_RB_HEADER = re.compile(
    r"^(\s*)(def|class|module)\s+(?:self\.)?([\w?!.]+)"
)


def _detect_ruby(lines: list[str]) -> list[_Sym]:
    """Ruby def/class/module blocks: the block ends at the first 'end' at
    the SAME indentation as the header (the dominant formatting for the
    kinds the reference captures: method/class/module/singleton_method,
    ck-chunk/src/lib.rs:941-943)."""
    out: list[_Sym] = []
    n = len(lines)

    def block_end(i: int, indent: str) -> int:
        for j in range(i + 1, n):
            if lines[j].rstrip() == indent + "end":
                return j
        return n - 1

    def walk(lo: int, hi: int, ancestry: list[str], parent_kind: str | None):
        i = lo
        while i <= hi:
            m = _RB_HEADER.match(lines[i])
            if m:
                indent, kw, name = m.group(1), m.group(2), m.group(3)
                end = min(block_end(i, indent), hi)
                if kw == "class":
                    kind = "class"
                elif kw == "module":
                    kind = "module"
                elif parent_kind == "class":
                    kind = "method"
                else:
                    kind = "function"
                out.append(_Sym(kind, name, i, end, list(ancestry)))
                walk(i + 1, end - 1, ancestry + [name],
                     "class" if kw in ("class", "module") else "function")
                i = end + 1
            else:
                i += 1

    walk(0, n - 1, [], None)
    return out


_EX_HEADER = re.compile(
    r"^(\s*)(defmodule|defmacro|defprotocol|defimpl|defp|def)\s+([\w.?!]+)"
)


def _detect_elixir(lines: list[str]) -> list[_Sym]:
    """Elixir defmodule/def/defp/defmacro blocks (the reference handles
    elixir via query-based chunking over 'call' nodes, ck-chunk/src/
    lib.rs:1012-1014; kinds per classify_chunk_kind: def/defp->Function,
    defmacro->Method, defmodule/defprotocol->Module). `do:`-style
    one-liners end on their own line; do-blocks end at the matching
    same-indent 'end'."""
    out: list[_Sym] = []
    n = len(lines)

    def block_end(i: int, indent: str) -> int:
        if "do:" in lines[i]:
            return i  # keyword-list one-liner
        for j in range(i + 1, n):
            if lines[j].rstrip() == indent + "end":
                return j
        return n - 1

    kinds = {"defmodule": "module", "defprotocol": "module",
             "defimpl": "module", "defmacro": "method",
             "def": "function", "defp": "function"}

    def walk(lo: int, hi: int, ancestry: list[str]):
        i = lo
        while i <= hi:
            m = _EX_HEADER.match(lines[i])
            if m:
                indent, kw, name = m.group(1), m.group(2), m.group(3)
                end = min(block_end(i, indent), hi)
                out.append(_Sym(kinds[kw], name, i, end, list(ancestry)))
                if kw in ("defmodule", "defprotocol", "defimpl") and end > i:
                    walk(i + 1, end - 1, ancestry + [name])
                i = end + 1
            else:
                i += 1

    walk(0, n - 1, [])
    return out


_HS_SIG = re.compile(r"^(\w[\w']*)\s*(?:,\s*[\w']+\s*)*::")
_HS_EQ = re.compile(r"^(\w[\w']*)\s+[^=]*=|^(\w[\w']*)\s*=")
_HS_DATA = re.compile(r"^(data|newtype|type)\s+(\w+)")
_HS_CLASS = re.compile(r"^(class|instance)\s+.*?\b(\w+)\b[^=]*where\s*$")


def _hs_block_end(lines: list[str], i: int) -> int:
    """A Haskell top-level binding extends over following indented or blank
    lines until the next column-0 line."""
    j = i + 1
    last = i
    n = len(lines)
    while j < n:
        s = lines[j]
        if s.strip() == "":
            j += 1
            continue
        if not s[0].isspace():
            break
        last = j
        j += 1
    return last


def _detect_haskell(lines: list[str]) -> list[_Sym]:
    out: list[_Sym] = []
    i, n = 0, len(lines)
    while i < n:
        s = lines[i]
        if not s or s[0].isspace():
            i += 1
            continue
        m = _HS_DATA.match(s)
        if m:
            end = _hs_block_end(lines, i)
            out.append(_Sym("module", m.group(2), i, end, []))
            i = end + 1
            continue
        m = _HS_CLASS.match(s)
        if m:
            end = _hs_block_end(lines, i)
            out.append(_Sym("class", m.group(2), i, end, []))
            i = end + 1
            continue
        m = _HS_SIG.match(s)
        if m:
            end = _hs_block_end(lines, i)
            out.append(_Sym("function", m.group(1), i, end, []))
            i = end + 1
            continue
        m = _HS_EQ.match(s)
        if m:
            name = m.group(1) or m.group(2)
            end = _hs_block_end(lines, i)
            out.append(_Sym("function", name, i, end, []))
            i = end + 1
            continue
        i += 1
    return _merge_haskell_equations(out)


def _merge_haskell_equations(syms: list[_Sym]) -> list[_Sym]:
    """C7: a signature + its equations (and multi-equation definitions like
    'fib 0 = ...' / 'fib n = ...') merge into ONE function symbol spanning
    first signature line to last equation line
    (merge_haskell_functions, ck-chunk/src/lib.rs:715-848)."""
    merged: list[_Sym] = []
    for s in syms:
        if (merged and s.kind == "function" and merged[-1].kind == "function"
                and merged[-1].name == s.name):
            merged[-1].end = max(merged[-1].end, s.end)
        else:
            merged.append(s)
    return merged


_MD_HEADING = re.compile(r"^(#{1,6})\s+(.+?)\s*#*\s*$")


def _detect_markdown(lines: list[str]) -> list[_Sym]:
    """Headings open sections that end before the next heading of the same
    or higher level (the tree-sitter 'section' node analogue)."""
    out: list[_Sym] = []
    heads = [(i, len(m.group(1)), m.group(2))
             for i, ln in enumerate(lines) if (m := _MD_HEADING.match(ln))]
    n = len(lines)
    for hi, (i, level, title) in enumerate(heads):
        end = n - 1
        for j, lvl, _t in heads[hi + 1:]:
            if lvl <= level:
                end = j - 1
                break
        anc = []
        for pj, plvl, pt in heads[:hi][::-1]:
            if plvl < level and (not anc or plvl < anc[-1][0]):
                anc.append((plvl, pt))
        ancestry = [t for _l, t in sorted(anc)]
        out.append(_Sym("module", title, i, end, ancestry))
    return out


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------


def _extend_leading_trivia(lines: list[str], start: int, lang: str) -> int:
    """Pull decorators / attributes / doc comments directly above the header
    into the chunk (extend_with_leading_trivia, ck-chunk/src/lib.rs:1183+)."""
    rx = _TRIVIA_RES.get(lang)
    if rx is None:
        return start
    i = start - 1
    while i >= 0 and lines[i].strip() and rx.match(lines[i]):
        i -= 1
    return i + 1


def _line_span_bytes(offsets, start_line: int, end_line: int) -> tuple[int, int]:
    return offsets[start_line][0], offsets[end_line][1]


def _make_chunk(data: bytes, offsets, sym: _Sym, lines: list[str], lang: str) -> SymbolChunk:
    start = _extend_leading_trivia(lines, sym.start, lang)
    b0, b1 = _line_span_bytes(offsets, start, sym.end)
    text = data[b0:b1].decode("utf-8")
    ancestry = sym.ancestry + [sym.name]
    return SymbolChunk(
        chunk_id=-1, byte_start=b0, byte_end=b1,
        line_start=start + 1, line_end=sym.end + 1,
        text=text, estimated_tokens=estimate_tokens(text),
        chunk_type=sym.kind, name=sym.name,
        breadcrumb="::".join(ancestry), ancestry=ancestry,
    )


def _fill_gaps(chunks: list[SymbolChunk], data: bytes, offsets) -> list[SymbolChunk]:
    """C6: uncovered regions become 'text' chunks, split on blank lines
    (fill_gaps, ck-chunk/src/lib.rs:577-712). Line lookups are binary
    searches over the line table — O((chunks+gaps)·log lines), never a
    per-gap prefix decode (files with many gaps stay linear)."""
    if not chunks:
        return chunks
    chunks = sorted(chunks, key=lambda c: (c.byte_start, c.byte_end))
    starts = [b0 for b0, _b1, _ln in offsets]

    def line_of(b: int) -> int:
        """0-based index of the line containing byte b."""
        return max(bisect.bisect_right(starts, b) - 1, 0)

    def gap_segments(g0: int, g1: int):
        """Split [g0,g1) on blank lines; yield (b0,b1) with content."""
        seg_start = None
        li = line_of(g0)
        while li < len(offsets):
            b0, b1, ln = offsets[li]
            if b0 >= g1:
                break
            li += 1
            if b1 <= g0:
                continue
            s0, s1 = max(b0, g0), min(b1, g1)
            if ln.strip() == "" or data[s0:s1].decode("utf-8", "ignore").strip() == "":
                if seg_start is not None:
                    yield (seg_start, s0)
                    seg_start = None
            else:
                if seg_start is None:
                    seg_start = s0
        if seg_start is not None:
            yield (seg_start, g1)

    gaps: list[tuple[int, int]] = []
    last_end = 0
    for c in chunks:
        if last_end < c.byte_start:
            gaps.extend(gap_segments(last_end, c.byte_start))
        last_end = max(last_end, c.byte_end)
    if last_end < len(data):
        gaps.extend(gap_segments(last_end, len(data)))

    out = list(chunks)
    for g0, g1 in gaps:
        seg = data[g0:g1].decode("utf-8")
        if not seg.strip():
            continue
        # gap boundaries are line-aligned (chunks span whole lines), so the
        # line table answers both endpoints directly
        line_start = line_of(g0) + 1
        line_end = max(line_start, line_of(max(g1 - 1, g0)) + 1)
        out.append(SymbolChunk(
            chunk_id=-1, byte_start=g0, byte_end=g1,
            line_start=line_start, line_end=line_end,
            text=seg, estimated_tokens=estimate_tokens(seg),
            chunk_type="text",
        ))
    out.sort(key=lambda c: (c.byte_start, c.byte_end))
    return out


def _merge_small(chunks: list[SymbolChunk], data: bytes, target_tokens: int) -> list[SymbolChunk]:
    """C9: group ADJACENT small chunks up to target_tokens; mixed-type
    groups become 'text' (merge_small_chunks, ck-chunk/src/lib.rs:2086)."""
    if not chunks:
        return chunks
    result: list[SymbolChunk] = []
    group: list[SymbolChunk] = []
    group_tokens = 0

    def flush():
        nonlocal group, group_tokens
        if not group:
            return
        if len(group) == 1:
            result.append(group[0])
        else:
            first = group[0]
            # overlapping members (a markdown section grouped with its own
            # nested subsection) can END before an earlier member does:
            # take the MAX end so the merged span never silently truncates
            # a parent section's tail (ADVICE r2)
            end = max(c.byte_end for c in group)
            line_end = max(c.line_end for c in group)
            text = data[first.byte_start:end].decode("utf-8")
            ctype = first.chunk_type if all(
                c.chunk_type == first.chunk_type for c in group) else "text"
            result.append(SymbolChunk(
                chunk_id=-1, byte_start=first.byte_start, byte_end=end,
                line_start=first.line_start, line_end=line_end,
                text=text, estimated_tokens=estimate_tokens(text),
                chunk_type=ctype,
            ))
        group, group_tokens = [], 0

    for c in chunks:
        if group_tokens + c.estimated_tokens > target_tokens:
            flush()
        if c.estimated_tokens > target_tokens:
            flush()
            result.append(c)
            continue
        group.append(c)
        group_tokens += c.estimated_tokens
    flush()
    return result


def _stride(chunks: list[SymbolChunk], max_tokens: int, overlap_tokens: int) -> list[SymbolChunk]:
    """C8: split oversized chunks into overlapping windows carrying
    (stride_index, total_strides) (stride_large_chunk, lib.rs:1971-2084)."""
    out: list[SymbolChunk] = []
    for c in chunks:
        if c.estimated_tokens <= max_tokens:
            out.append(c)
            continue
        text = c.text
        nchars = len(text)
        cpt = nchars / max(c.estimated_tokens, 1)
        window = int(max_tokens * 0.9 * cpt)
        overlap = int(overlap_tokens * cpt)
        step = max(window - overlap, 1)
        total = 1 if nchars <= window else -(-(nchars - overlap) // step)
        start = 0
        idx = 0
        # incremental prefix tracking: starts advance monotonically, so
        # byte offsets / newline counts accumulate in O(step) per stride
        prev_start, prev_bytes, prev_nl = 0, 0, 0
        while start < nchars:
            endc = min(start + window, nchars)
            seg = text[start:endc]
            prev_bytes += len(text[prev_start:start].encode("utf-8"))
            prev_nl += text[prev_start:start].count("\n")
            prev_start = start
            b_off = prev_bytes
            b_end = b_off + len(seg.encode("utf-8"))
            line_off = prev_nl
            out.append(SymbolChunk(
                chunk_id=-1,
                byte_start=c.byte_start + b_off, byte_end=c.byte_start + b_end,
                line_start=c.line_start + line_off,
                line_end=c.line_start + line_off + max(seg.rstrip("\n").count("\n"), 0),
                text=seg, estimated_tokens=estimate_tokens(seg),
                chunk_type=c.chunk_type, name=c.name,
                breadcrumb=c.breadcrumb, ancestry=list(c.ancestry),
                stride_index=idx, total_strides=total,
            ))
            if endc >= nchars:
                break
            start += step
            idx += 1
    return out


def chunk_code(
    text: str,
    lang: str | None,
    max_tokens: int = DEFAULT_MAX_TOKENS,
    stride_overlap: int = DEFAULT_STRIDE_OVERLAP,
) -> list[SymbolChunk]:
    """Language dispatch (C1) + the full chunk pipeline. Falls back to the
    generic line-window chunker for unknown languages or symbol-free files
    (chunk_text_with_config_and_model, ck-chunk/src/lib.rs:248-298)."""
    la = canonical_lang(lang)
    if not text:
        return []
    if la is None:
        return _generic_as_symbol_chunks(text)

    lines_off = split_lines_with_offsets(text)
    lines = [ln for _b0, _b1, ln in lines_off]
    data = text.encode("utf-8")

    if la == "python":
        syms = _detect_python_ast(text, lines)
        if syms is None:  # doesn't parse: indentation fallback
            syms = _detect_python(lines)
    elif la in ("rust", "go", "javascript", "typescript",
                "java", "csharp", "c", "cpp", "zig", "dart"):
        syms = _detect_brace(lines, la)
    elif la == "ruby":
        syms = _detect_ruby(lines)
    elif la == "elixir":
        syms = _detect_elixir(lines)
    elif la == "haskell":
        syms = _detect_haskell(lines)
    else:  # markdown
        syms = _detect_markdown(lines)

    if not syms:
        return _generic_as_symbol_chunks(text)

    chunks = [_make_chunk(data, lines_off, s, lines, la) for s in syms]
    # drop exact duplicates (same span), like extract_code_chunks does
    seen: set[tuple[int, int]] = set()
    uniq = []
    for c in chunks:
        key = (c.byte_start, c.byte_end)
        if key not in seen:
            seen.add(key)
            uniq.append(c)
    chunks = _fill_gaps(uniq, data, lines_off)
    if la == "markdown":
        chunks = _merge_small(chunks, data, MARKDOWN_TARGET_TOKENS)
    chunks = _stride(chunks, max_tokens, stride_overlap)
    for i, c in enumerate(chunks):
        c.chunk_id = i
    return chunks


def _generic_as_symbol_chunks(text: str) -> list[SymbolChunk]:
    out = []
    for c in generic_chunk_text(text):
        out.append(SymbolChunk(
            chunk_id=c.chunk_id, byte_start=c.byte_start, byte_end=c.byte_end,
            line_start=c.line_start, line_end=c.line_end, text=c.text,
            estimated_tokens=c.estimated_tokens, chunk_type="text",
        ))
    return out


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

SYMBOL_CHUNK_SCHEMA = (
    "chunk_id int, byte_start long, byte_end long, line_start int, "
    "line_end int, text string, estimated_tokens int, chunk_type string, "
    "name string, breadcrumb string, ancestry array<string>, "
    "stride_index int, total_strides int"
)


def symbol_chunks_udf(max_tokens: int = DEFAULT_MAX_TOKENS,
                      stride_overlap: int = DEFAULT_STRIDE_OVERLAP):
    """Arrow pandas UDF: (content, lang) -> array<struct<symbol chunk>>.
    Chunking is per-document and embarrassingly parallel — the UDF is the
    right boundary (pure Python string work, no Spark state)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StructType

    struct_t = StructType.fromDDL(SYMBOL_CHUNK_SCHEMA)

    @F.pandas_udf(ArrayType(struct_t))
    def _udf(content: pd.Series, lang: pd.Series) -> pd.Series:
        out = []
        for text, la in zip(content.fillna(""), lang):
            out.append([c.__dict__ for c in
                        chunk_code(text, la, max_tokens, stride_overlap)])
        return pd.Series(out)

    return _udf


def chunk_corpus_symbols(corpus, max_tokens: int = DEFAULT_MAX_TOKENS,
                         stride_overlap: int = DEFAULT_STRIDE_OVERLAP):
    """corpus -> symbol-aware chunks table (C1 dispatch by the corpus lang
    column; falls back to the generic line-window chunker per doc). One row
    per chunk: identity + span + chunk_type/name/breadcrumb/ancestry +
    stride info."""
    from pyspark.sql import functions as F

    from ck_spark.index.builder import doc_id_expr

    return (
        corpus.withColumn("doc_id", doc_id_expr())
        .select(
            "doc_id", "repo", "path", "lang",
            F.explode(symbol_chunks_udf(max_tokens, stride_overlap)(
                F.col("content"), F.col("lang"))).alias("c"),
        )
        .select("doc_id", "repo", "path", "lang", "c.*")
    )
