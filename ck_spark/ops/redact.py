"""PII redaction operator — a first-class training-data-pipeline stage
(round brief: the operations a large-scale training pipeline needs).

Detects and masks personally-identifying spans (emails, phone numbers,
IPv4 addresses, SSNs, credit-card numbers) with pure Catalyst
expressions: `regexp_replace` / `regexp_extract_all` run JVM-side under
whole-stage codegen, so the operator is a narrow map — no shuffle, no
Python in the hot path, scales linearly with corpus bytes.

Patterns are deliberately restricted to the regex subset with identical
semantics in Java regex (Spark) and RE2 (DuckDB/Go): no lookaround, no
backreferences — so the DuckDB oracle in __spark_entry__.py can mirror
the operator 1:1 and the driver hash-verifies real redaction output.

Redaction is applied in a FIXED order (emails first — they contain
digit runs that would otherwise partially match phone patterns); match
counts are taken per kind on the text as each kind sees it, i.e. after
the previous kinds were masked, which makes counts well-defined and
order-independent to re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: earlier kinds are masked before later kinds are counted
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("credit_card", r"\b\d{4}[\- ]\d{4}[\- ]\d{4}[\- ]\d{4}\b"),
    ("phone", r"\b\d{3}[\-.]\d{3}[\-.]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: list[str] | None = None,
    mask: str = "[PII-{kind}]",
) -> DataFrame:
    """Returns df with `text_col` redacted in place plus one
    `n_<kind>` count column per redacted kind and a `pii_total`.

    The mask template receives the kind name; a fixed string (e.g.
    "[REDACTED]") is also valid. Counting uses regexp_extract_all
    (codegen) on the pre-mask text of each stage."""
    active = [(k, p) for k, p in PII_PATTERNS
              if kinds is None or k in kinds]
    if kinds is not None:
        unknown = set(kinds) - {k for k, _ in PII_PATTERNS}
        if unknown:
            raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    out = df
    cur = F.col(text_col)
    counts = []
    for kind, pat in active:
        n_col = f"n_{kind}"
        out = out.withColumn(
            n_col, F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        )
        cur = F.regexp_replace(cur, pat, mask.format(kind=kind))
        counts.append(n_col)
    out = out.withColumn(text_col, cur)
    expr = F.lit(0)
    for c in counts:
        expr = expr + F.col(c)
    return out.withColumn("pii_total", expr)


def redaction_oracle_sql(
    text_expr: str, kinds: list[str] | None = None,
    mask: str = "[PII-{kind}]",
) -> tuple[str, list[str]]:
    """Builds the DuckDB-equivalent expressions for redact_pii: returns
    (redacted_text_sql, [count_sql per kind]) over `text_expr`. Used by
    the contract query so the oracle is generated from the SAME pattern
    table — no drift between engine and oracle."""
    active = [(k, p) for k, p in PII_PATTERNS
              if kinds is None or k in kinds]
    cur = text_expr
    count_exprs = []
    for kind, pat in active:
        lit = pat.replace("'", "''")
        count_exprs.append(
            f"len(regexp_extract_all({cur}, '{lit}')) AS n_{kind}")
        cur = (f"regexp_replace({cur}, '{lit}', "
               f"'{mask.format(kind=kind)}', 'g')")
    return cur, count_exprs
