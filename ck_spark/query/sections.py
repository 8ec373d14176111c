"""Full-section extraction (--full-section): return the enclosing
function/class section for a line-granular hit.

The rebuild of ck's extract_code_sections + find_containing_section
(/root/reference/ck-engine/src/lib.rs:1231-1283): sections are the
function/class/method chunks of the file (module/text for markdown);
the FIRST section in span order containing the hit line wins (the
reference scans the chunk list — sorted by byte_start — and returns the
first match, so an enclosing class wins over its method).

Spark-first: the hit table joins the chunk table on doc identity plus a
line-range predicate; the "first containing" pick is a min_by aggregation
on chunk_id (chunk ids are assigned in span order at chunk time). The
chunk table is the reusable artifact — at 100 TB it is built once
(chunk_corpus_symbols → parquet, partitioned like the corpus) and every
full-section query is an equi-join on (repo, path) with the range check
as a post-join filter; hits are top-k-bounded so the join is
broadcast-sized on the hit side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CODE_SECTION_TYPES = ("function", "class", "method")
MD_SECTION_TYPES = ("module", "text")


def section_chunks(chunks: DataFrame) -> DataFrame:
    """Filter a symbol-chunk table to section-eligible chunks, per the
    reference's filter (lib.rs:1239-1253): function/class/method for code,
    module/text for markdown files."""
    is_md = F.lower(F.coalesce(F.col("lang"), F.lit(""))).isin("markdown", "md")
    return chunks.where(
        (is_md & F.col("chunk_type").isin(*MD_SECTION_TYPES))
        | (~is_md & F.col("chunk_type").isin(*CODE_SECTION_TYPES))
    )


def full_sections(
    hits: DataFrame,
    chunks: DataFrame,
    keys: list[str] = ("repo", "path"),
    line_col: str = "line_no",
) -> DataFrame:
    """Attach the enclosing section to each hit.

    hits must carry keys + line_col; chunks is a chunk table (generic or
    symbol-aware) carrying keys + chunk_id/line_start/line_end/text.
    Hits with no containing section are dropped (the reference falls back
    to plain line output for those — callers union the remainder back if
    they need grep-compatible totals).

    Returns hits' columns + section_chunk_id / section_line_start /
    section_line_end / section (text)."""
    keys = list(keys)
    ch = chunks.select(
        *keys,
        F.col("chunk_id").alias("_sec_id"),
        F.col("line_start").alias("_sec_ls"),
        F.col("line_end").alias("_sec_le"),
        F.col("text").alias("_sec_text"),
    )
    joined = hits.join(ch, keys, "inner").where(
        F.col(line_col).between(F.col("_sec_ls"), F.col("_sec_le"))
    )
    # first containing section in span order == min chunk_id
    # (find_containing_section scans sorted chunks, lib.rs:1273-1283)
    hit_cols = [c for c in hits.columns]
    pick = joined.groupBy(*hit_cols).agg(
        F.min_by(
            F.struct(
                F.col("_sec_id").alias("section_chunk_id"),
                F.col("_sec_ls").alias("section_line_start"),
                F.col("_sec_le").alias("section_line_end"),
                F.col("_sec_text").alias("section"),
            ),
            F.col("_sec_id"),
        ).alias("_sec")
    )
    return pick.select(*hit_cols, "_sec.*")


def grep_full_section(
    corpus: DataFrame,
    pattern: str,
    chunks: DataFrame | None = None,
    **grep_kw,
) -> DataFrame:
    """grep --full-section: regex hits expanded to their enclosing
    function/class section. Builds the symbol chunk table on the fly when
    one isn't supplied (supply a persisted one at scale)."""
    from ck_spark.functions.symbols import chunk_corpus_symbols
    from ck_spark.query.grep import grep

    hits = grep(corpus, pattern, **grep_kw).select("repo", "path", "line_no", "line")
    if chunks is None:
        chunks = chunk_corpus_symbols(corpus)
    sections = section_chunks(chunks)
    return full_sections(hits, sections).orderBy("path", "line_no")
