"""Chunker parity against the reference's OWN test sources.

Each case embeds the source from a named ck-chunk test
(ck-chunk/src/lib.rs:2645-2893 C/C++ corner cases; the markdown fixture is
covered in test_symbols.py) and asserts the expectations that test makes.

Documented divergences from the tree-sitter-capture reference (regex
rebuild — kinds/names/nesting match, exact byte spans may differ):
- a class chunk's text INCLUDES its method bodies (the reference's class
  capture excludes nested method bodies from the class chunk text);
- `using`/`typedef` aliases inside a namespace ride in the namespace
  chunk rather than separate Text chunks;
- `#include` lines adjacent to a symbol may attach as leading trivia.
"""

from __future__ import annotations

from ck_spark.functions.symbols import chunk_code

C_CORNER = """
#define MAX(a,b) ((a) > (b) ? (a) : (b))
#define VERSION 3

typedef struct Node {
    int value;
    struct Node* next;
} Node;

union Payload {
    int i;
    float f;
};

enum Color {
    Red,
    Green,
    Blue,
};

static inline int add(int a, int b) {
    return a + b;
}

int main(void) {
    return MAX(add(1, 2), VERSION);
}
"""


def test_chunk_c_corner_cases():
    """Mirrors ck-chunk test_chunk_c_corner_cases (lib.rs:2645)."""
    chunks = chunk_code(C_CORNER, "c")
    assert chunks

    def has(ct, frag):
        return any(c.chunk_type == ct and frag in c.text for c in chunks)

    assert has("function", "#define MAX")      # function-like macro
    assert has("text", "#define VERSION")      # object-like macro is Text
    assert has("class", "struct Node")
    assert has("class", "union Payload")
    assert has("class", "enum Color")
    assert has("function", "static inline int add")
    assert has("function", "int main")


def test_chunk_c_struct_declaration_without_body_stays_intact():
    """Mirrors lib.rs:2702: variable declarations of struct type must not
    be split into bodyless struct chunks."""
    src = """
#include <stdint.h>

struct mtd_info_user meminfo;
struct foo forward;
"""
    chunks = chunk_code(src, "c")
    assert any("struct mtd_info_user meminfo;" in c.text for c in chunks)
    assert any("struct foo forward;" in c.text for c in chunks)
    assert not any(c.text.strip() == "struct mtd_info_user" for c in chunks)
    assert not any(c.text.strip() == "struct foo" for c in chunks)


CPP_CORNER = """
#include <vector>
#define SQUARE(x) ((x) * (x))

namespace math {
template <typename T>
T add(T a, T b) {
    return a + b;
}

using Vec = std::vector<int>;
typedef unsigned long ulong_t;

struct Point {
    int x;
    int y;
};

class Calculator {
public:
    int add(int a, int b) { return a + b; }
};

enum class Color { Red, Green, Blue };
} // namespace math

int main() {
    return math::add(1, 2);
}
"""


def test_chunk_cpp_corner_cases():
    """Mirrors lib.rs:2721 (minus the documented class-text divergence)."""
    chunks = chunk_code(CPP_CORNER, "cpp")
    assert chunks

    def has(ct, frag):
        return any(c.chunk_type == ct and frag in c.text for c in chunks)

    assert any("template <typename T>" in c.text for c in chunks)
    assert has("function", "#define SQUARE")
    # a function nested in a NAMESPACE is a Function, not a Method
    assert has("function", "T add")
    # inline one-liner member function is captured as a Method
    assert has("method", "int add(int a, int b)")
    assert has("class", "struct Point")
    assert has("class", "class Calculator")
    assert has("function", "int main")
    # enum class inside the namespace: captured (kind class) or carried by
    # the namespace chunk
    assert any("enum class Color" in c.text for c in chunks)
    # namespace itself is a module chunk named math
    assert any(c.chunk_type == "module" and c.name == "math" for c in chunks)


def test_cpp_member_methods_have_class_ancestry():
    chunks = chunk_code(CPP_CORNER, "cpp")
    meth = [c for c in chunks if c.chunk_type == "method" and c.name == "add"]
    assert meth and meth[0].ancestry[:-1] == ["math", "Calculator"]


def test_cpp_function_like_macro_with_continuation():
    src = """
#define SWAP(a, b) do { \\
    int t = (a);          \\
    (a) = (b);            \\
    (b) = t;              \\
} while (0)

int f(void) {
    return 0;
}
"""
    chunks = chunk_code(src, "c")
    mac = [c for c in chunks if c.chunk_type == "function" and c.name == "SWAP"]
    assert mac and "while (0)" in mac[0].text
    assert any(c.chunk_type == "function" and c.name == "f" for c in chunks)


def test_byte_coverage_c_cpp():
    """Non-blank bytes of both corner-case sources are covered by chunks
    (the reference's gap-filling coverage invariant, lib.rs:3325)."""
    for src, lang in ((C_CORNER, "c"), (CPP_CORNER, "cpp")):
        chunks = chunk_code(src, lang)
        data = src.encode()
        covered = bytearray(len(data))
        for c in chunks:
            for j in range(c.byte_start, c.byte_end):
                covered[j] = 1
        missing = [
            j for j, ch in enumerate(data)
            if ch not in b" \t\r\n" and not covered[j]
        ]
        assert not missing, (lang, missing[:5])


# ---------------------------------------------------------------------------
# Per-language parity: sources + assertions from the reference's own tests
# (ck-chunk/src/lib.rs test_chunk_rust:2311, test_chunk_go:2459,
# test_chunk_ruby:2402, test_chunk_zig:3057, test_chunk_csharp:3175,
# test_chunk_elixir_basic:3597)
# ---------------------------------------------------------------------------


def _types(code, lang):
    return [c.chunk_type for c in chunk_code(code, lang)]


def test_chunk_rust_reference_case():
    code = """
pub struct Calculator {
    memory: f64,
}

impl Calculator {
    pub fn new() -> Self {
        Calculator { memory: 0.0 }
    }

    pub fn add(&mut self, a: f64, b: f64) -> f64 {
        a + b
    }
}

fn main() {
    let calc = Calculator::new();
}

pub mod utils {
    pub fn helper() {}
}
"""
    t = _types(code, "rust")
    assert "class" in t        # struct
    assert "module" in t       # impl and mod
    assert "function" in t     # fns


def test_chunk_go_reference_case():
    code = """
package main

import "fmt"

const Pi = 3.14159

var memory float64

type Calculator struct {
    memory float64
}

type Operation interface {
    Calculate(a, b float64) float64
}

func NewCalculator() *Calculator {
    return &Calculator{memory: 0.0}
}

func (c *Calculator) Add(a, b float64) float64 {
    return a + b
}

func main() {
    calc := NewCalculator()
}
"""
    t = _types(code, "go")
    assert "module" in t       # const and var
    assert "class" in t        # struct and interface
    assert "function" in t
    assert "method" in t       # receiver func


def test_chunk_ruby_reference_case():
    code = """
class Calculator
  def initialize
    @memory = 0.0
  end

  def add(a, b)
    a + b
  end

  def self.class_method
    "class method"
  end

  private

  def private_method
    "private"
  end
end

module Utils
  def self.helper
    "helper"
  end
end

def main
  calc = Calculator.new
end
"""
    t = _types(code, "ruby")
    assert "class" in t
    assert "module" in t
    # the reference asserts Function for methods; ours distinguishes
    # method-in-class, so accept either kind for the def chunks
    assert ("function" in t) or ("method" in t)


def test_chunk_zig_reference_case():
    code = """
const std = @import("std");

const Calculator = struct {
    memory: f64,

    pub fn init() Calculator {
        return Calculator{ .memory = 0.0 };
    }

    pub fn add(self: *Calculator, a: f64, b: f64) f64 {
        const result = a + b;
        self.memory = result;
        return result;
    }
};

const Color = enum {
    Red,
    Green,
    Blue,
};

const Value = union(enum) {
    int: i32,
    float: f64,
};

const Handle = opaque {};

const MathError = error{
    DivisionByZero,
    Overflow,
};

pub fn multiply(a: i32, b: i32) i32 {
    return a * b;
}

pub fn divide(a: i32, b: i32) MathError!i32 {
    if (b == 0) return error.DivisionByZero;
    return @divTrunc(a, b);
}

comptime {
    @compileLog("Compile-time validation");
}

pub fn main() !void {
    var calc = Calculator.init();
}

test "calculator addition" {
    var calc = Calculator.init();
}

test "multiply function" {
    const result = multiply(3, 4);
}
"""
    t = _types(code, "zig")
    # reference: >=5 Class (struct, enum, union, opaque, error set),
    # >=3 Function (multiply, divide, main), >=4 Module (const std,
    # comptime, 2 tests)
    assert t.count("class") >= 5, t
    assert t.count("function") >= 3, t
    assert t.count("module") >= 4, t


def test_chunk_csharp_reference_case():
    code = """
namespace Calculator;

public interface ICalculator
{
    double Add(double x, double y);
}

public class Calculator
{
    public static const double PI = 3.14159;
    private double _memory;

    public Calculator()
    {
        _memory = 0.0;
    }

    public double Add(double x, double y)
    {
        return x + y;
    }

    public static void Main(string[] args)
    {
        var calc = new Calculator();
    }
}
"""
    t = _types(code, "csharp")
    assert "module" in t       # namespace / interface
    assert "class" in t
    assert "method" in t


def test_chunk_elixir_reference_cases():
    basic = """
defmodule Calculator do
  @moduledoc "A simple calculator module"

  def add(a, b) do
    a + b
  end

  defp multiply(a, b) do
    a * b
  end
end
"""
    t = _types(basic, "elixir")
    assert "module" in t       # defmodule
    assert ("function" in t) or ("method" in t)  # def/defp

    protocol = """
defprotocol Stringable do
  @doc "Converts to string"
  def to_string(value)
end
"""
    t2 = _types(protocol, "elixir")
    assert "module" in t2      # defprotocol
