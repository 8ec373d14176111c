"""Repetition filters — the Gopher/MassiveText quality-filter family
(Rae et al. 2021, appendix A1.1): documents dominated by repeated lines
or n-grams are low-quality training data (boilerplate, scraper loops,
keyword stuffing). Every serious pretraining pipeline applies these.

Metrics per document (all fractions in [0,1]):
- dup_line_frac        duplicate lines / total lines
- dup_line_char_frac   characters inside duplicate lines / total chars
- top_2gram_char_frac  characters covered by the most frequent word
                       2-gram (count x gram length) / total chars
- dup_2gram_char_frac  characters covered by 2-grams occurring more
                       than once / total chars

Gopher's published rejection thresholds (for reference defaults in
`gopher_repetition_flags`): dup_line_frac > 0.30,
dup_line_char_frac > 0.20, top_2gram_char_frac > 0.20,
dup_2gram_char_frac > 0.10 (approximating their n-gram family with the
2-gram member).

Scale design: the unit of aggregation is the (doc, line) / (doc, gram)
pair — one explode + groupBy per metric family, shuffling keys that are
hashes of bounded-length strings. No driver-side state; thresholds are
pure column predicates. Mirrored 1:1 by DuckDB oracle SQL (contract
query `repetition_stats`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda x: x != F.lit(""))


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc repetition metrics; every input doc appears exactly once
    (docs with no lines/grams report 0.0 everywhere)."""
    base = df.select(id_col, text_col)

    # ---- line family: explode lines, count per (doc, line)
    lines = base.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).where(F.col("line") != "")
    per_line = lines.groupBy(id_col, "line").agg(
        F.count("*").alias("cnt"))
    line_stats = per_line.groupBy(id_col).agg(
        F.sum("cnt").alias("n_lines"),
        # a line occurring c times contributes c-1 duplicate instances
        F.sum(F.col("cnt") - 1).alias("n_dup_lines"),
        F.sum(F.length("line") * F.col("cnt")).alias("line_chars"),
        F.sum(F.when(F.col("cnt") > 1,
                     F.length("line") * F.col("cnt")).otherwise(0))
        .alias("dup_line_chars"),
    )

    # ---- 2-gram family
    # let-bind the token array (tokenizer.let_col): slice(toks, i, 2)
    # inside the transform lambda would otherwise re-tokenize the doc per
    # gram — O(tokens^2) per row in interpreted higher-order eval
    from ck_spark.tokenizer import let_col

    def build_grams(t):
        cnt = F.size(t)
        idxs = F.when(cnt >= 2, F.sequence(F.lit(1), cnt - 1)).otherwise(
            F.array().cast("array<int>"))
        return F.transform(idxs, lambda i: F.concat_ws(" ", F.slice(t, i, 2)))

    grams = base.select(
        F.col(id_col),
        F.explode(let_col(_tokens(text_col), build_grams)).alias("gram"),
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    gram_chars = (F.length("gram") - 1) * F.col("cnt")  # chars w/o the join space
    gram_stats = per_gram.groupBy(id_col).agg(
        F.sum(gram_chars).alias("gram_chars"),
        # ties broken toward the lexicographically-smallest gram so the
        # metric (and the oracle) is deterministic
        F.max(F.struct(F.col("cnt"), (F.length("gram") - 1).alias("glen")))
        .alias("top"),
        F.sum(F.when(F.col("cnt") > 1, gram_chars).otherwise(0))
        .alias("dup_gram_chars"),
    ).select(
        id_col, "gram_chars", "dup_gram_chars",
        (F.col("top.cnt") * F.col("top.glen")).alias("top_gram_chars"),
    )

    out = (
        base.select(id_col)
        .join(line_stats, id_col, "left")
        .join(gram_stats, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_dup_lines") / F.col("n_lines"), F.lit(0.0))
            .alias("dup_line_frac"),
            F.coalesce(F.col("dup_line_chars") / F.col("line_chars"),
                       F.lit(0.0)).alias("dup_line_char_frac"),
            F.coalesce(F.col("top_gram_chars") / F.col("gram_chars"),
                       F.lit(0.0)).alias("top_2gram_char_frac"),
            F.coalesce(F.col("dup_gram_chars") / F.col("gram_chars"),
                       F.lit(0.0)).alias("dup_2gram_char_frac"),
        )
    )
    return out


GOPHER_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "dup_2gram_char_frac": 0.10,
}


def gopher_repetition_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """repetition_stats + a boolean `keep` applying the (Gopher-default)
    thresholds: a doc is rejected when ANY metric exceeds its bound."""
    th = dict(GOPHER_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(th)
        if unknown:
            raise ValueError(f"unknown repetition metrics: {sorted(unknown)}")
        th.update(thresholds)
    stats = repetition_stats(df, id_col=id_col, text_col=text_col)
    keep = F.lit(True)
    for metric, bound in th.items():
        keep = keep & (F.col(metric) <= bound)
    return stats.withColumn("keep", keep)
