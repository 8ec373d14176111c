"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame expressions (whole-stage codegen, no
Python UDFs) and every hash primitive is md5/sha2 hex — deterministic and
reproducible in any ANSI SQL engine, which is what the DuckDB oracles in
__spark_entry__.py exploit.

Scale notes (100 TB):
- exact dedup: one shuffle on sha256(text) — the canonical hash-groupBy.
- MinHash+LSH: signatures via a single explode→groupBy (8 min-aggregates);
  candidate generation via band-bucket self-join — only docs sharing a
  band key ever meet, so the join is bucket-local and skew-bounded (a
  pathological bucket means near-identical docs, which is the signal).
- SimHash: 60-bit signatures from md5-derived bits; candidate pairs via
  banded join on 15-bit sub-keys (4 bands → Hamming distance <= 3 is
  guaranteed to share >= 1 band by pigeonhole), then exact bit_count.
- n-gram Jaccard: exact verification on candidate pairs (or all pairs at
  test scale) via shared-shingle counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ck_spark.tokenizer import shingles_col, sql_tokens_col

MINHASH_H = 8           # minhash functions
MINHASH_BANDS = 4       # bands of 2 rows each
SIMHASH_BITS = 60       # fits a 15-hex-char md5 prefix in a signed long
SIMHASH_BANDS = 4       # 15-bit bands -> catches Hamming distance <= 3


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: every row annotated with its content
    group (sha256), group size, and the canonical (min-id) member."""
    h = F.sha2(F.col(text_col), 256).alias("content_sha256")
    w = Window.partitionBy("content_sha256")
    return (
        df.select(F.col(id_col), h)
        .withColumn("group_size", F.count("*").over(w).cast("long"))
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_duplicate", F.col(id_col) != F.col("canonical_id"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = MINHASH_H, shingle_n: int = 3,
) -> DataFrame:
    """(id, h0..h{H-1}): h_i = min over shingles of md5(shingle || '#i').

    Lexicographic min over md5 hex strings is a valid min-wise hash family
    and — unlike integer-seeded hashing — is bit-identical across engines.
    Docs with fewer than `shingle_n` tokens produce no signature.
    """
    sh = df.select(
        F.col(id_col), F.explode(shingles_col(F.col(text_col), shingle_n)).alias("sh")
    )
    aggs = [
        F.min(F.md5(F.concat(F.col("sh"), F.lit(f"#{i}")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str = "doc_id",
    num_hashes: int = MINHASH_H, bands: int = MINHASH_BANDS,
) -> DataFrame:
    """Band the signature (rows_per_band = H/bands), bucket the ids per
    band key, emit the within-bucket pairs: pairs sharing >= 1 band key,
    with the count of shared bands.

    Bucketed PAIR GENERATION, not a self-join: the former
    melted-join-melted formulation computed the whole signature pipeline
    TWICE (one side becomes the broadcast/build relation, so exchange
    reuse never applies — verified in the captured plan) and paid the
    join machinery on top. Collecting each (band, key) bucket's sorted
    id list and expanding ordered pairs with array expressions keeps ONE
    signature evaluation and one exchange. Per-bucket cost is quadratic
    in bucket size in BOTH formulations (that is LSH's contract — a hot
    bucket means near-identical docs); memory is bounded by the largest
    bucket's id list (ids only, not rows)."""
    rows = num_hashes // bands
    band_keys = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"h{b * rows + r}") for r in range(rows)])).alias("key"),
        )
        for b in range(bands)
    ])
    melted = sig.select(F.col(id_col), F.explode(band_keys).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    buckets = (
        melted.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    # ordered pairs (id_a < id_b) from the sorted bucket list: for the
    # element at 0-based position i, pair it with every later element
    pair_arr = F.flatten(F.transform(
        F.col("ids"),
        lambda x, i: F.transform(
            F.slice(F.col("ids"), i + F.lit(2),
                    F.greatest(F.size(F.col("ids")) - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
        ),
    ))
    return (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared_bands"))
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    shingle_n: int = 3, threshold: float = 0.0,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct token-shingle sets. With `candidates`
    (id_a, id_b) the work is DRIVEN BY the candidate pairs — a's shingles
    join the pair list on id_a, then b's shingles on (id_b, sh) — so the
    verify cost is ∝ Σ over candidate pairs of shingle-set size, never the
    shingle self-join (whose cost is quadratic in docs-per-shingle and is
    dominated by ubiquitous shingles at corpus scale). The 100 TB path is
    LSH candidates -> exact verify; the all-pairs self-join runs only when
    candidates is None (test-scale / tiny corpora)."""
    sh = (
        df.select(F.col(id_col), F.explode(shingles_col(F.col(text_col), shingle_n)).alias("sh"))
        .dropDuplicates([id_col, "sh"])
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").cast("long").alias("n_sh"))
    if candidates is not None:
        # id_a < id_b mirrors the self-join's orientation filter
        cand = candidates.select("id_a", "id_b").where(
            F.col("id_a") < F.col("id_b")
        ).dropDuplicates(["id_a", "id_b"])
        a_sh = sh.select(F.col(id_col).alias("id_a"), "sh")
        b_sh = sh.select(F.col(id_col).alias("id_b"), "sh")
        inter = (
            cand.join(a_sh, "id_a")
            .join(b_sh, ["id_b", "sh"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").cast("long").alias("n_inter"))
        )
    else:
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, "sh")
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .agg(F.count("*").cast("long").alias("n_inter"))
        )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def _term_hash60():
    """md5 -> 60-bit non-negative long (15 hex chars)."""
    return F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10).cast("long")


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """tf-weighted SimHash: bit b of the signature is the sign of
    Σ_tokens tf · (2·bit_b(md5(token)) − 1)."""
    toks = df.select(F.col(id_col), F.explode(sql_tokens_col(F.col(text_col))).alias("term"))
    h = toks.withColumn("h", _term_hash60())
    bit_sums = [
        F.sum(
            (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    sums = h.groupBy(id_col).agg(*bit_sums)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    sig: DataFrame, id_col: str = "doc_id",
    max_hamming: int = 3, bits: int = SIMHASH_BITS, bands: int = SIMHASH_BANDS,
) -> DataFrame:
    """Candidate pairs via banded sub-key join (pigeonhole: Hamming <= bands-1
    guarantees a shared band), verified with exact bit_count."""
    width = bits // bands
    mask = (1 << width) - 1
    band_arr = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit(mask)).alias("key"),
        )
        for i in range(bands)
    ])
    melted = sig.select(F.col(id_col), F.col("simhash"), F.explode(band_arr).alias("bk")).select(
        id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a, b = melted.alias("a"), melted.alias("b")
    return (
        a.join(b, ["band", "key"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def line_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_dup_docs: int = 2, min_line_chars: int = 4,
) -> DataFrame:
    """Cross-document line-level exact dedup (CCNet / RefinedWeb-style
    boilerplate removal): a line whose trimmed form occurs in at least
    ``min_dup_docs`` DISTINCT documents is boilerplate (nav bars, license
    headers, cookie banners) and is removed from every document; the
    surviving lines are reassembled in their original order.

    Lines shorter than ``min_line_chars`` after trimming (including empty
    lines) are never removed — they are structure, not boilerplate, and
    counting them would tie every document to every other.

    Returns (id, clean_text, n_lines, n_removed) for EVERY input doc —
    a doc that loses all its lines comes back with clean_text = ''.

    Scale notes (100 TB): three key-partitioned shuffles, no driver state
    — (1) groupBy(trimmed line) with map-side partial counts to find the
    boilerplate set, (2) a left-semi-shaped join of the exploded lines
    against that (much smaller) set, (3) groupBy(doc) to reassemble.
    Skew on ubiquitous lines ('', 'import os') is bounded by the
    min_line_chars floor and by count-distinct partial aggregation; AQE
    handles the rest. No regex, no Python UDF — whole-stage codegen end
    to end.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("pos", "line"),
    ).withColumn("key", F.trim(F.col("line")))
    eligible = F.length("key") >= min_line_chars
    boiler = (
        lines.where(eligible)
        .groupBy("key")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_dup_docs)
        .select("key")
    )
    kept = (
        lines.where(eligible).join(boiler, "key", "left_anti").drop("key")
        .unionByName(lines.where(~eligible).drop("key"))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count("*").cast("long").alias("n_kept"),
    )
    base = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\n", -1)).cast("long").alias("n_lines"),
    )
    return (
        base.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_removed"),
        )
    )


def dedup_clusters(
    pairs: DataFrame, universe: DataFrame,
    id_col: str = "doc_id", max_iterations: int = 25,
) -> DataFrame:
    """Connected components over near-duplicate candidate pairs — the step
    that turns pairwise signals (LSH/SimHash/Jaccard) into KEEP/DROP
    decisions: every doc gets cluster_id = the minimum doc id reachable
    through the dup graph; keeping one doc per cluster_id deduplicates.

    pairs: (id_a, id_b); universe: frame carrying id_col (docs absent from
    every pair become singleton clusters of themselves).

    Algorithm: iterative min-label propagation (hash-to-min). Each round
    every node adopts the minimum label among itself and its neighbors —
    converges in O(graph diameter) rounds; near-dup components are
    near-cliques, so 2-3 rounds in practice. Each round is one join + one
    groupBy shuffle on doc id; localCheckpoint() every round truncates the
    lineage so the plan doesn't grow with iterations (the classic Spark
    iterative-algorithm footgun). The driver sees only a change-count per
    round (observe-style aggregate), never the data.
    """
    sym = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"),
                                  F.col("id_a").alias("dst")))
        .distinct()
    )
    labels = universe.select(F.col(id_col).alias("src")).distinct().withColumn(
        "label", F.col("src")
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("src", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "src", "left")
            .select(
                "src",
                F.least(F.col("label"), F.coalesce("nmin", "label")).alias("label"),
                (F.col("nmin") < F.col("label")).alias("_changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.where(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    else:
        # silent non-convergence would hand downstream dedup a component
        # split across multiple cluster_ids — fail loudly instead
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iterations} rounds "
            "(a dup component's graph diameter exceeds max_iterations — "
            "raise it; near-dup components are normally near-cliques)"
        )
    out = labels.select(
        F.col("src").alias(id_col),
        F.col("label").alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id")
    return out.withColumn("cluster_size", F.count("*").over(w).cast("long"))
