"""Large-scale demo: build the index over a ~1M-file deterministic corpus
on local[32], report throughput (files/s, LOC/s), index size ratio, and
warm query latencies — the closest this sandbox gets to the 10^12-file
design point. Writes BENCH/SCALE_DEMO.md."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def du(path: str) -> int:
    t = 0
    for base, _, files in os.walk(path):
        t += sum(os.path.getsize(os.path.join(base, f)) for f in files)
    return t


def main() -> None:
    n_docs = int(os.environ.get("SCALE_DEMO_DOCS", "1000000"))
    cores = int(os.environ.get("SCALE_DEMO_CORES", "32"))

    from pyspark.sql import functions as F

    from ck_spark.corpus import generate_corpus_spark
    from ck_spark.index import build_index
    from ck_spark.query import BM25Index
    from ck_spark.session import get_spark

    spark = get_spark("scale-demo", cores=cores, shuffle_partitions=cores * 2)
    corpus = generate_corpus_spark(spark, n_docs, seed=42, partitions=cores * 8)

    # count source bytes/lines in the same pass style the build uses
    stats = corpus.agg(
        F.sum(F.octet_length("content")).alias("bytes"),
        F.sum(F.size(F.split("content", "\n")) - 1).alias("lines"),
    ).collect()[0]
    src_bytes, src_lines = int(stats["bytes"]), int(stats["lines"])

    root = tempfile.mkdtemp(prefix="ck_scale_demo_")
    t0 = time.time()
    build_index(
        spark, corpus, root, mode="code",
        n_segments=max(16, n_docs // 100_000), term_buckets=32,
        build_groups=4, resume=False,
    )
    build_s = time.time() - t0

    idx = BM25Index.load(spark, root)
    idx.search("warmup", k=1).collect()
    latencies = {}
    for q, mode, k in [("def", "or", 10), ("parse buffer", "or", 10),
                       ("def return import", "and", 10),
                       ("getUserName", "or", 100)]:
        t0 = time.time()
        idx.search(q, k=k, mode=mode).collect()
        latencies[f"{q} ({mode},k={k})"] = round(time.time() - t0, 2)
    t0 = time.time()
    idx.search_many([("def", "or"), ("parse buffer", "or"), ("token index", "or"),
                     ("merge split cache", "and"), ("read write", "or")], k=10).collect()
    latencies["batch of 5 (one job)"] = round(time.time() - t0, 2)

    core_idx = sum(du(os.path.join(root, d))
                   for d in ("postings", "term_stats", "doc_map", "corpus_stats"))
    report = {
        "n_docs": n_docs,
        "cores": cores,
        "build_s": round(build_s, 1),
        "files_per_sec": round(n_docs / build_s, 1),
        "source_lines": src_lines,
        "loc_per_sec": round(src_lines / build_s, 1),
        "source_mb": round(src_bytes / 1e6, 1),
        "index_mb": round(core_idx / 1e6, 1),
        "index_to_source_ratio": round(core_idx / max(src_bytes, 1), 3),
        "latencies_s": latencies,
    }
    print(json.dumps(report, indent=1))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH", "SCALE_DEMO.json"), "w") as f:
        json.dump(report, f, indent=1)
    md = f"""# BENCH/SCALE_DEMO.md — 1M-file build on local[{cores}]

Deterministic synthetic source corpus, {n_docs:,} files,
{src_lines:,} LOC ({report['source_mb']} MB).

- index build: **{report['build_s']} s** = **{report['files_per_sec']:,} files/s**
  = **{report['loc_per_sec']:,} LOC/s** (reference target: ~1M LOC in < 2 min,
  /root/reference/README.md:390 — this build does 1M LOC in
  {round(1e6 / max(report['loc_per_sec'], 1), 1)} s)
- index size: {report['index_mb']} MB = **{report['index_to_source_ratio']}x
  source** (reference target <= 2x, README.md:393); doc_map carries the
  per-doc tf maps, so incremental updates need no extra intermediate
- warm query latencies (distributed scan + segment scoring):
"""
    for k, v in latencies.items():
        md += f"  - `{k}`: {v} s\n"
    md += "\nCommand: `python scripts/scale_demo.py` (SCALE_DEMO_DOCS / SCALE_DEMO_CORES env).\n"
    with open(os.path.join(repo, "BENCH", "SCALE_DEMO.md"), "w") as f:
        f.write(md)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
