"""Process-tree CPU accounting for one N-vs-4N scaling pair.

Spark's own stage metrics under-attribute Python-UDF work: JVM tasks
that block on an Arrow socket to a pyspark worker report executorRunTime
but NOT the worker's CPU, so `run >> cpu` in the REST metrics is
ambiguous between "tasks wait on memory/IO" and "the CPU burn lives in
a child process Spark can't see". This wrapper measures the whole
process TREE per level with resource.getrusage(RUSAGE_CHILDREN) around
spark-submit: JVM + every pyspark worker + the daemon, user+sys.

Interpretation for the scaling writeup (BENCH/BASELINE.md):
  - tree CPU ~equal at 2 and 8 cores  -> same total work at both levels
    (the engine adds no parallelism overhead); the wall gap is then
    pure occupancy — how many cores the DAG keeps busy on one box.
  - tree CPU inflating at 8 cores     -> real contention burn (memory
    stalls are on-CPU), quantifying the single-box bandwidth share of
    the sub-4x quotient.

Usage:
  python scripts/cpu_pair.py [--corpus /tmp/ck_corpus_480k]
                             [--n-docs 480000] [--cores 8 2]
Appends one JSON line per level to BENCH/cpu_pair.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "cpu_pair.jsonl")


def one(cores: int, n_docs: int, corpus: str | None,
        n_segments: int | None = None) -> dict:
    cmd = [
        "spark-submit", "--master", f"local[{cores}]",
        "--driver-memory", f"{2 * cores}g",
        "--py-files", os.path.join(REPO, "BENCH", "dist.zip"),
        "--conf", "spark.ui.enabled=false",
        os.path.join(REPO, "scripts", "scaling_job.py"),
        "--cores", str(cores), "--n-docs", str(n_docs),
    ]
    if n_segments:
        # partition count must scale WITH input (as any production job
        # does) or per-task working sets grow superlinearly at fixed heap
        cmd += ["--n-segments", str(n_segments)]
    if corpus:
        cmd += ["--corpus-path", corpus]
    r0 = resource.getrusage(resource.RUSAGE_CHILDREN)
    t0 = time.perf_counter()
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    wall = time.perf_counter() - t0
    r1 = resource.getrusage(resource.RUSAGE_CHILDREN)
    rec = {"cores": cores, "wall_s": round(wall, 1),
           "tree_user_s": round(r1.ru_utime - r0.ru_utime, 1),
           "tree_sys_s": round(r1.ru_stime - r0.ru_stime, 1),
           "loadavg_1m": round(os.getloadavg()[0], 2),
           "ts": time.time()}
    for ln in out.stdout.splitlines():
        if ln.startswith("SCALING_RESULT "):
            j = json.loads(ln[len("SCALING_RESULT "):])
            rec.update({k: j[k] for k in
                        ("build_s", "total_s", "results_sha256", "stage_ms")
                        if k in j})
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=os.environ.get("HARVEST_CORPUS"))
    ap.add_argument("--n-docs", type=int, default=480000)
    ap.add_argument("--cores", type=int, nargs="+", default=[8, 2])
    ap.add_argument("--n-segments", type=int, default=None)
    args = ap.parse_args()
    for c in args.cores:
        rec = one(c, args.n_docs, args.corpus, args.n_segments)
        if args.n_segments:
            rec["n_segments"] = args.n_segments
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
