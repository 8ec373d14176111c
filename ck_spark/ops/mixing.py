"""Data-mixing operator — deterministic weighted sampling by source,
the stage that turns a cleaned corpus into a training MIXTURE (e.g.
wiki x3.2 epochs, web x0.6): every pretraining run weights its sources.

Semantics: a weight w for a source means each of its docs appears
floor(w) times for sure, plus once more with probability frac(w) —
decided DETERMINISTICALLY per doc by an arithmetic hash of (doc id,
repeat index), so the sample is reproducible run-to-run, independent of
partitioning, and exactly mirrored by the DuckDB oracle (no RNG, no
engine-specific hash: Knuth multiplicative hashing in plain modular
arithmetic both engines evaluate bit-identically).

Scale design: pure codegen — a narrow map + posexplode of a per-row
replication array built from the broadcast weight map; no shuffle, no
Python. Unknown sources get weight 0 by default (dropped LOUDLY via a
distinct-source check when strict=True).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative constant; 32-bit modulus keeps every engine's
# integer arithmetic exact (DuckDB BIGINT / Spark LONG never overflow)
_KNUTH = 2654435761
_MOD = 1 << 32


def mix_fraction_hash(id_col: str = "doc_id", rep: int = 0) -> "F.Column":
    """Uniform-ish [0,1) decision value for (doc, repeat) — plain modular
    arithmetic, bit-identical in any SQL engine."""
    h = ((F.col(id_col) * 2 + 1 + rep) * F.lit(_KNUTH)) % F.lit(_MOD)
    return h / F.lit(float(_MOD))


def weighted_mixture(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    strict: bool = True,
) -> DataFrame:
    """Replicate/sample rows per source weight. Output = input rows with
    an extra `copy_id` (0..n-1 within a doc); a doc with weight 2.3
    yields copies 0,1 always and copy 2 iff its decision hash < 0.3.

    strict=True raises if the data contains a source with no weight
    (silent drops are how training mixtures go wrong)."""
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for source {s!r}: {w}")
    if strict:
        seen = {r[0] for r in df.select(source_col).distinct().collect()}
        missing = seen - set(weights)
        if missing:
            raise ValueError(
                f"sources with no mixture weight: {sorted(missing)} "
                "(pass strict=False to drop them)")

    # n_copies = floor(w) + (hash(doc, floor(w)) < frac(w))
    whole = F.lit(0)
    frac = F.lit(0.0)
    expr_whole = None
    expr_frac = None
    for s, w in weights.items():
        cond = F.col(source_col) == s
        wi, wf = int(w), w - int(w)
        expr_whole = (F.when(cond, wi) if expr_whole is None
                      else expr_whole.when(cond, wi))
        expr_frac = (F.when(cond, wf) if expr_frac is None
                     else expr_frac.when(cond, wf))
    whole = expr_whole.otherwise(0) if expr_whole is not None else F.lit(0)
    frac = expr_frac.otherwise(0.0) if expr_frac is not None else F.lit(0.0)

    extra = (mix_fraction_hash(id_col, rep=0) < frac).cast("int")
    n_copies = (whole + extra).cast("int")
    out = (
        df.withColumn("_n_copies", n_copies)
        .where(F.col("_n_copies") > 0)
        .withColumn("copy_id",
                    F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)))
        .drop("_n_copies")
    )
    return out


def mixture_stats(mixed: DataFrame, source_col: str = "source",
                  input_df: DataFrame | None = None) -> DataFrame:
    """Per-source achieved multiplicity — audit the mixture against its
    intended weights (two tiny aggregations). Pass the PRE-mix frame as
    input_df to measure sub-1.0 weights correctly (without it the
    denominator only sees docs that survived sampling, so achieved
    weight is floored at 1)."""
    out = mixed.groupBy(source_col).agg(
        F.count("*").alias("rows_out"),
        F.countDistinct("doc_id").alias("docs_sampled"),
    )
    if input_df is not None:
        denom = input_df.groupBy(source_col).agg(
            F.count("*").alias("docs_in"))
        return out.join(denom, source_col, "right").fillna(
            0, ["rows_out", "docs_sampled"]).withColumn(
            "achieved_weight", F.col("rows_out") / F.col("docs_in"))
    return out.withColumn("achieved_weight",
                          F.col("rows_out") / F.col("docs_sampled"))
