"""Capture `.explain("formatted")` plans for the round-6 optimization
deliverable (plans/r06/<name>_{before,after}.txt).

Usage: python scripts/capture_plans_r06.py <repo_root> <suffix> <out_dir>
  repo_root — tree whose ck_spark to import (round-start worktree for
              "before", the live repo for "after")
  suffix    — "before" | "after"
  out_dir   — where to write the plan files

Plans are captured over the sf0.1 documents/embeddings tables (plan
SHAPE is scale-independent; only row estimates differ)."""

from __future__ import annotations

import os
import sys

repo, suffix, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)

from pyspark.sql import functions as F  # noqa: E402

from ck_spark.session import get_spark  # noqa: E402

os.makedirs(out_dir, exist_ok=True)
spark = get_spark("plans-r06", cores=8, shuffle_partitions=8)
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")


def dump(name: str, df) -> None:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print(f"wrote {name}_{suffix}.txt ({len(plan.splitlines())} lines)",
          flush=True)


from ck_spark.ops.dedup import (  # noqa: E402
    lsh_candidate_pairs, minhash_signatures, ngram_jaccard_pairs,
    simhash_signatures,
)

dump("dedup_minhash_lsh", lsh_candidate_pairs(minhash_signatures(docs)))
dump("dedup_simhash", simhash_signatures(docs))
dump("dedup_ngram_jaccard",
     ngram_jaccard_pairs(docs.limit(500), threshold=0.2))

from ck_spark.ops.decontam import contamination_flags  # noqa: E402

dump("decontam_overlap",
     contamination_flags(docs, docs.where(F.col("doc_id") % 97 == 3)))

from ck_spark.ops.repetition import repetition_stats  # noqa: E402

dump("repetition_stats", repetition_stats(docs))

from ck_spark.ops.textstats import quality_scores  # noqa: E402

dump("text_quality", quality_scores(docs))

from ck_spark.ops.ivf import (  # noqa: E402
    _assigned_df, _sample_driver_side, kmeans_train,
)

X = _sample_driver_side(emb, 1024, "vec_id", "embedding")
cent = kmeans_train(X, 16, iters=3, seed=7)
dump("ann_ivf_assign", _assigned_df(spark, emb, cent, "vec_id", "embedding"))

# index build: the doc_map write frame (tokenize -> partition -> sort)
import inspect  # noqa: E402

from ck_spark.adapters import documents_as_corpus  # noqa: E402
from ck_spark.index.builder import (  # noqa: E402
    _with_doc_columns, doc_map_cols,
)

corpus = documents_as_corpus(docs.repartition(8))
sig = inspect.signature(_with_doc_columns)
if "range_width" in sig.parameters:
    dm = _with_doc_columns(corpus, "simple", 8, range_width=8).select(
        *doc_map_cols(True)).sortWithinPartitions("seg", "doc_id")
else:
    dm = _with_doc_columns(corpus, "simple", 8).select(
        *doc_map_cols(True)).repartition(8, "seg").sortWithinPartitions(
        "seg", "doc_id")
dump("index_docmap_write", dm)

spark.stop()
