"""Subprocess worker for the kill/resume test: builds the index over the
deterministic corpus into the given root (resume=True). Killed and
re-invoked by tests/test_kill_resume.py and scripts/kill_resume_test.py."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    root, n_docs, cores = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from ck_spark.corpus import generate_corpus_spark
    from ck_spark.index import build_index
    from ck_spark.session import get_spark

    spark = get_spark("kill-resume-worker", cores=cores, shuffle_partitions=cores * 2)
    corpus = generate_corpus_spark(spark, n_docs, seed=42, partitions=16)
    build_index(
        spark, corpus, root, mode="code",
        n_segments=8, term_buckets=8, build_groups=4, resume=True,
    )
    print("BUILD_COMPLETE")
    spark.stop()


if __name__ == "__main__":
    main()
