"""ck_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
engine ``ck`` (a Rust grep/BM25/semantic code-search CLI at
/root/reference): code-aware tokenization, distributed inverted-index
construction with delta-gap + varint-compressed posting lists, BM25
(k1=1.2, b=0.75) top-k scoring with block-max pruning, grep/regex mode,
RRF hybrid fusion, plus the training-data-pipeline operators a 100 TB
corpus needs (dedup, ANN similarity, text quality stats).

Architecture is DataFrame-first: Catalyst plans everything declarative;
the only custom kernels are Arrow-vectorized pandas UDFs (tokenizer,
posting codec) and a cogrouped ``applyInPandas`` segment scorer.
"""

__version__ = "0.1.0"

from ck_spark.constants import BM25_B, BM25_K1, RRF_K

__all__ = ["BM25_K1", "BM25_B", "RRF_K", "__version__"]
