"""Materialize the deterministic synthetic corpus as a stored parquet
table (the scaling runs' input — the north rule's production input is a
stored Iceberg table, so generation is not part of the timed build).

Usage: python scripts/make_corpus.py --n-docs 480000 --out /tmp/ck_corpus_480k
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--gen-partitions", type=int, default=64)
    ap.add_argument("--body-scale", type=int, default=3)
    args = ap.parse_args()

    from ck_spark.corpus import generate_corpus_spark
    from ck_spark.session import get_spark

    spark = get_spark("ck-make-corpus")
    df = generate_corpus_spark(
        spark, args.n_docs, seed=args.seed,
        partitions=args.gen_partitions, body_scale=args.body_scale,
    )
    df.write.mode("overwrite").parquet(args.out)
    print(f"wrote {args.n_docs} docs -> {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
