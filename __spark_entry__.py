"""Driver contract for the spark-graft builder (PySpark target).

Every `queries()` entry runs the REAL engine (the distributed inverted
index + BM25 scorer from ck_spark, built on the fly — cached/resumable —
over the driver's `documents` table, or DataFrame operators over the test
tables), and every `oracle_sql()` entry is independent ANSI SQL DuckDB
executes over the same parquet — row-count + schema + order-insensitive
value-hash must match.

Tokenization used here is the engine's `simple` mode — exactly the
reference's effective analyzer (tantivy 0.24 default TEXT pipeline; ck
registers no custom tokenizer, /root/reference/ck-engine/src/lib.rs:750-753)
— which is also exactly expressible in SQL. The code-aware mode is
exercised against the pure-Python oracle in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"

K1, B = 1.2, 0.75


# --------------------------------------------------------------------------
# oracle SQL builders (DuckDB dialect-compatible ANSI)
# --------------------------------------------------------------------------

_TOK_CTES = """
raw AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
),
tok AS (
  SELECT doc_id, term FROM raw WHERE term <> '' AND length(term) <= 40
),
dl AS (
  SELECT d.doc_id, CAST(coalesce(c.cnt, 0) AS DOUBLE) AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS cnt FROM tok GROUP BY doc_id) c
    ON d.doc_id = c.doc_id
),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term)
"""


def _bm25_scored_cte(terms: list[str]) -> str:
    values = ", ".join(f"('{t}')" for t in terms)
    return f"""WITH {_TOK_CTES},
q(term) AS (VALUES {values}),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({K1} + 1.0)
             / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))) AS score,
         count(*) AS matched
  FROM tf
  JOIN q ON tf.term = q.term
  JOIN df ON tf.term = df.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)"""


def _bm25_sql(terms: list[str], k: int, mode: str = "or") -> str:
    where = f"WHERE matched = {len(terms)}" if mode == "and" else ""
    return f"""{_bm25_scored_cte(terms)}
SELECT doc_id, round(score, 6) AS score
FROM scored {where}
ORDER BY scored.score DESC, doc_id
LIMIT {k}"""


# --------------------------------------------------------------------------
# engine-side query callables
# --------------------------------------------------------------------------


def _bm25(query: str, k: int, mode: str = "or"):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F

        from ck_spark.adapters import search_documents

        df = search_documents(spark, sf_dir, query, k=k, mode=mode)
        return df.select("doc_id", F.round("score", 6).alias("score"))

    return run


def _q_term_df_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ck_spark.adapters import documents_index

    idx = documents_index(spark, sf_dir)
    ts = spark.read.parquet(idx.paths.term_stats)
    return (
        ts.select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(50)
    )


def _q_doc_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ck_spark.adapters import documents_index

    idx = documents_index(spark, sf_dir)
    dm = spark.read.parquet(idx.paths.doc_map)
    return dm.select(
        F.col("path").cast("long").alias("doc_id"),
        F.col("doc_len").cast("long").alias("doc_len"),
    ).orderBy("doc_id")


def _q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ck_spark.adapters import documents_index

    idx = documents_index(spark, sf_dir)
    cs = spark.read.parquet(idx.paths.corpus_stats)
    return cs.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round("avgdl", 6).alias("avgdl"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
    )


GREP_PATTERN = "row|window"


def _q_grep_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ck_spark.adapters import documents_as_corpus, load_documents
    from ck_spark.query.grep import grep

    corpus = documents_as_corpus(load_documents(spark, sf_dir))
    hits = grep(corpus, GREP_PATTERN, count_matches=True)
    return hits.select(
        F.col("path").cast("long").alias("doc_id"),
        F.col("n_matches").cast("long").alias("n_matches"),
    ).orderBy("doc_id")


def _q_grep_files_without(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ck_spark.adapters import documents_as_corpus, load_documents
    from ck_spark.query.grep import files_without_matches

    corpus = documents_as_corpus(load_documents(spark, sf_dir))
    out = files_without_matches(corpus, GREP_PATTERN)
    return out.select(F.col("path").cast("long").alias("doc_id")).orderBy("doc_id")


HYBRID_BM25_TERMS = ["spark", "join"]
HYBRID_GREP = "window"


def _q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ck_spark.adapters import (
        documents_as_corpus,
        load_documents,
        search_documents,
    )
    from ck_spark.query.grep import grep
    from ck_spark.query.hybrid import add_rank, rrf_fuse

    bm = search_documents(spark, sf_dir, " ".join(HYBRID_BM25_TERMS), k=30)
    bm_r = add_rank(bm, [F.desc("score"), F.asc("doc_id")])

    corpus = documents_as_corpus(load_documents(spark, sf_dir))
    gr = (
        grep(corpus, HYBRID_GREP, count_matches=True)
        .select(F.col("path").cast("long").alias("doc_id"), "n_matches")
    )
    gr_r = add_rank(gr, [F.desc("n_matches"), F.asc("doc_id")]).where(F.col("rank") <= 30)

    fused = rrf_fuse([bm_r, gr_r], ["doc_id"], k=20)
    return fused.select("doc_id", F.round("rrf_score", 9).alias("rrf_score"))


def _q_bm25_norm_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ck_spark.adapters import search_documents

    df = search_documents(
        spark, sf_dir, "spark join window", k=20, normalize=True, threshold=0.5
    )
    return df.select("doc_id", F.round("score", 6).alias("score"))


# --------------------------------------------------------------------------
# contract surface
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: distributed BM25 top-k via the full inverted-index engine
    on the sf0.001 documents table."""
    return _bm25("spark join window", k=20)(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_single_term": _bm25("spark", k=20),
        "bm25_topk_or": _bm25("spark join window", k=20),
        "bm25_topk_and": _bm25("table join", k=20, mode="and"),
        "bm25_ubiquitous_term": _bm25("table", k=20),
        "bm25_norm_threshold": _q_bm25_norm_threshold,
        "term_df_top50": _q_term_df_top50,
        "doc_len_stats": _q_doc_len,
        "corpus_stats": _q_corpus_stats,
        "grep_count": _q_grep_count,
        "grep_files_without": _q_grep_files_without,
        "hybrid_rrf": _q_hybrid_rrf,
    }


def oracle_sql() -> dict[str, str]:
    hybrid_terms = HYBRID_BM25_TERMS
    return {
        "bm25_single_term": _bm25_sql(["spark"], 20),
        "bm25_topk_or": _bm25_sql(["spark", "join", "window"], 20),
        "bm25_topk_and": _bm25_sql(["table", "join"], 20, mode="and"),
        "bm25_ubiquitous_term": _bm25_sql(["table"], 20),
        "bm25_norm_threshold": f"""{_bm25_scored_cte(["spark", "join", "window"])},
top AS (
  SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 20
),
norm AS (
  SELECT doc_id, score / max(score) OVER () AS score FROM top
)
SELECT doc_id, round(score, 6) AS score FROM norm WHERE score >= 0.5
ORDER BY score DESC, doc_id""",
        "term_df_top50": f"""WITH {_TOK_CTES}
SELECT term, CAST(df AS BIGINT) AS df
FROM df ORDER BY df DESC, term LIMIT 50""",
        "doc_len_stats": f"""WITH {_TOK_CTES}
SELECT doc_id, CAST(dl AS BIGINT) AS doc_len FROM dl ORDER BY doc_id""",
        "corpus_stats": f"""WITH {_TOK_CTES}
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(dl), 6) AS avgdl,
       CAST(sum(dl) AS BIGINT) AS total_tokens
FROM dl""",
        "grep_count": f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{GREP_PATTERN}')) AS BIGINT) AS n_matches
FROM documents
WHERE regexp_matches(text, '{GREP_PATTERN}')
ORDER BY doc_id""",
        "grep_files_without": f"""
SELECT doc_id FROM documents
WHERE NOT regexp_matches(text, '{GREP_PATTERN}')
ORDER BY doc_id""",
        "hybrid_rrf": f"""{_bm25_scored_cte(hybrid_terms)},
bm AS (
  SELECT doc_id, row_number() OVER (ORDER BY scored.score DESC, doc_id) AS rank
  FROM scored ORDER BY scored.score DESC, doc_id LIMIT 30
),
gr_all AS (
  SELECT doc_id, len(regexp_extract_all(text, '{HYBRID_GREP}')) AS n_matches
  FROM documents WHERE regexp_matches(text, '{HYBRID_GREP}')
),
gr AS (
  SELECT doc_id, row_number() OVER (ORDER BY n_matches DESC, doc_id) AS rank
  FROM gr_all ORDER BY n_matches DESC, doc_id LIMIT 30
),
unioned AS (SELECT doc_id, rank FROM bm UNION ALL SELECT doc_id, rank FROM gr),
fused AS (
  SELECT doc_id, sum(1.0 / (60 + rank)) AS rrf
  FROM unioned GROUP BY doc_id
  ORDER BY rrf DESC, doc_id LIMIT 20
)
SELECT doc_id, round(rrf, 9) AS rrf_score FROM fused""",
    }
