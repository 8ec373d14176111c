"""End-to-end corpus preprocessing pipeline — the composition a real
pretraining data job runs, built from this package's verified operators
in the canonical order:

  1. language filter        (ops/textstats.lang_id)
  2. quality + repetition   (ops/textstats.quality_scores,
                             ops/repetition.gopher_repetition_flags)
  3. line-level dedup       (ops/dedup.line_dedup — cross-document
                             boilerplate line removal; opt-in, rewrites
                             `text` and drops docs emptied by it)
  4. exact dedup            (ops/dedup.exact_dedup keeps min doc_id)
  5. near-dedup             (ops/dedup MinHash-LSH clusters, keep one)
  6. decontamination        (ops/decontam vs a benchmark table)
  7. PII redaction          (ops/redact)
  8. mixture weighting      (ops/mixing, optional)
  9. sequence packing       (ops/packing.pack_greedy, optional)

Each stage is individually DuckDB-oracle-verified by the driver
contract; this module only composes them lazily (one DataFrame plan —
Catalyst pipelines the narrow stages; the shuffling stages are the
documented ones: dedup groupBys, near-dup LSH join, packing's single
exchange) and reports per-stage retention counts via `accumulate=True`
(which materializes per-stage counts — costlier, for audits) or as
cheap lazily-derived flags.

Scale note: stages 1-2 and 5-6 are narrow maps / broadcast semijoins;
stages 3-4 shuffle on content hashes — the unavoidable dedup exchanges.
Nothing collects to the driver except the audit counts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PreprocessConfig:
    languages: list[str] | None = None        # None = keep all
    min_quality: float = 0.0                  # quality_scores threshold
    repetition_thresholds: dict | None = None  # None = Gopher defaults
    line_dedup: bool = False                  # cross-doc boilerplate lines
    near_dedup: bool = True
    decontam_n: int = 8
    redact: bool = True
    mixture_weights: dict[str, float] | None = None
    pack_seq_len: int | None = None
    stages: list[str] = field(default_factory=lambda: [
        "lang", "quality", "repetition", "line_dedup", "exact_dedup",
        "near_dedup", "decontam", "redact", "mixture", "pack"])


def preprocess_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    config: PreprocessConfig | None = None,
    audit: bool = False,
) -> tuple[DataFrame, dict]:
    """Run the pipeline; returns (clean_docs, report). With audit=True
    the report carries per-stage retained-doc counts (materializes each
    stage once); otherwise only the stage list."""
    cfg = config or PreprocessConfig()
    if cfg.mixture_weights and cfg.pack_seq_len:
        raise ValueError(
            "mixture and packing are mutually exclusive in one pass: "
            "packing keys on doc_id, which the mixture duplicates — "
            "pack the mixed output in a second pass with a copy-unique "
            "id column")
    report: dict = {"stages": []}
    cur = docs

    def note(stage: str) -> None:
        report["stages"].append(stage)
        if audit:
            report[f"docs_after_{stage}"] = cur.count()

    if "lang" in cfg.stages and cfg.languages is not None:
        from ck_spark.ops.textstats import lang_id

        langs = lang_id(cur).select("doc_id", "pred_lang")
        cur = cur.join(langs, "doc_id").where(
            F.col("pred_lang").isin(cfg.languages)).drop("pred_lang")
        note("lang")

    if "quality" in cfg.stages and cfg.min_quality > 0:
        from ck_spark.ops.textstats import quality_scores

        q = quality_scores(cur).select("doc_id", "quality")
        cur = cur.join(q, "doc_id").where(
            F.col("quality") >= cfg.min_quality).drop("quality")
        note("quality")

    if "repetition" in cfg.stages:
        from ck_spark.ops.repetition import gopher_repetition_flags

        rep = gopher_repetition_flags(
            cur, thresholds=cfg.repetition_thresholds
        ).select("doc_id", "keep")
        cur = cur.join(rep, "doc_id").where("keep").drop("keep")
        note("repetition")

    if "line_dedup" in cfg.stages and cfg.line_dedup:
        from ck_spark.ops.dedup import line_dedup

        cleaned = line_dedup(cur).select(
            "doc_id", "clean_text", "n_removed")
        cur = (
            cur.join(cleaned, "doc_id")
            .where(F.length("clean_text") > 0)
            .withColumn("text", F.col("clean_text"))
            .drop("clean_text", "n_removed")
        )
        note("line_dedup")

    if "exact_dedup" in cfg.stages:
        from ck_spark.ops.dedup import exact_dedup

        # keep only canonical rows: without the is_duplicate filter the
        # join is the identity and exact dups silently survive whenever
        # near_dedup is off
        keep = exact_dedup(cur).where(~F.col("is_duplicate")).select("doc_id")
        cur = cur.join(keep, "doc_id")
        note("exact_dedup")

    if "near_dedup" in cfg.stages and cfg.near_dedup:
        from ck_spark.ops.dedup import (
            dedup_clusters,
            lsh_candidate_pairs,
            minhash_signatures,
        )

        pairs = lsh_candidate_pairs(minhash_signatures(cur))
        clusters = dedup_clusters(pairs, cur)
        keep = clusters.where(F.col("doc_id") == F.col("cluster_id")) \
            .select("doc_id")
        cur = cur.join(keep, "doc_id")
        note("near_dedup")

    if "decontam" in cfg.stages and benchmark is not None:
        from ck_spark.ops.decontam import contamination_flags

        flags = contamination_flags(cur, benchmark, n=cfg.decontam_n)
        cur = cur.join(flags.where(~F.col("contaminated"))
                       .select("doc_id"), "doc_id")
        note("decontam")

    if "redact" in cfg.stages and cfg.redact:
        from ck_spark.ops.redact import PII_PATTERNS, redact_pii

        cur = redact_pii(cur).drop(
            "pii_total", *[f"n_{k}" for k, _ in PII_PATTERNS])
        note("redact")

    if "mixture" in cfg.stages and cfg.mixture_weights:
        from ck_spark.ops.mixing import weighted_mixture

        cur = weighted_mixture(cur, cfg.mixture_weights)
        note("mixture")

    if "pack" in cfg.stages and cfg.pack_seq_len:
        from ck_spark.ops.packing import pack_greedy

        assignments = pack_greedy(cur, cfg.pack_seq_len)
        report["packing"] = "greedy"
        cur = cur.join(
            assignments.select("doc_id", "shard", "seq_id",
                               "offset_in_seq", "oversize"), "doc_id")
        note("pack")

    return cur, report
