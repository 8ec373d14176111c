"""Orchestrate the N-vs-4N scaling evidence (north rule).

Packages ck_spark into dist.zip, runs scripts/scaling_job.py via
spark-submit --py-files at local[N] and local[4N] on the identical
deterministic corpus, takes the best of `--repeats` runs per level
(the sandbox host is shared; min filters external noise), asserts
result-identity, computes throughput scaling efficiency, and rewrites
BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "ck_spark")
        for base, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(base, f)
                    z.write(full, os.path.relpath(full, REPO))


def run_level(zip_path: str, cores: int, n_docs: int, repeats: int,
              body_scale: int = 3) -> dict:
    best = None
    for _ in range(repeats):
        cmd = [
            "spark-submit",
            "--master", f"local[{cores}]",
            "--driver-memory", f"{2 * cores}g",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            os.path.join(REPO, "scripts", "scaling_job.py"),
            "--cores", str(cores), "--n-docs", str(n_docs),
            "--body-scale", str(body_scale),
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("SCALING_RESULT ")]
        if not line:
            sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-5000:] + "\n")
            raise RuntimeError(f"no result line at cores={cores}")
        res = json.loads(line[-1].removeprefix("SCALING_RESULT "))
        if best is None or res["total_s"] < best["total_s"]:
            best = res
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2, help="small cluster size N")
    ap.add_argument("--n-docs", type=int, default=60000)
    ap.add_argument("--body-scale", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    zip_path = os.path.join(REPO, "BENCH", "dist.zip")
    os.makedirs(os.path.dirname(zip_path), exist_ok=True)
    make_zip(zip_path)

    small = run_level(zip_path, args.n, args.n_docs, args.repeats, args.body_scale)
    large = run_level(zip_path, args.n * 4, args.n_docs, args.repeats, args.body_scale)

    assert small["results_sha256"] == large["results_sha256"], (
        "query results differ across parallelism levels!"
    )
    eff_total = (small["total_s"] / large["total_s"]) / 4.0
    eff_build = (small["build_s"] / large["build_s"]) / 4.0
    report = {
        "n_cores": args.n,
        "n4_cores": args.n * 4,
        "n_docs": args.n_docs,
        "small": small,
        "large": large,
        "efficiency_total": round(eff_total, 3),
        "efficiency_build": round(eff_build, 3),
        "results_identical": True,
    }
    print(json.dumps(report, indent=1))
    out = os.path.join(REPO, "BENCH", "SCALING.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)

    md = f"""# BENCH/BASELINE.md — scaling evidence (N vs 4N)

North rule: run the identical build+query job via `spark-submit
--py-files` at two cluster sizes (N and 4N executors) with throughput
scaling efficiency >= 0.8. No real cluster exists in this sandbox, so the
two levels are `local[{args.n}]` and `local[{args.n * 4}]` on the same
machine with the byte-identical deterministic corpus
({args.n_docs} synthetic source files, body_scale={args.body_scale},
seed=42, generation partitioning fixed at 64 so content is independent of
core count). Best of {args.repeats} runs per level (shared host; min
filters external tenant noise — the machine routinely carries load >10
from other tenants, which systematically penalizes the larger level, so N
is chosen such that 4N still fits the free capacity).

| level | cores | build s | query s | total s | docs/s (build) |
|---|---|---|---|---|---|
| N  | {args.n} | {small['build_s']} | {small['query_s']} | {small['total_s']} | {small['build_docs_per_sec']} |
| 4N | {args.n * 4} | {large['build_s']} | {large['query_s']} | {large['total_s']} | {large['build_docs_per_sec']} |

- throughput scaling efficiency (total): **{eff_total:.3f}**
- throughput scaling efficiency (index build): **{eff_build:.3f}**
- top-k results at both levels: **identical**
  (sha256 {small['results_sha256'][:16]}…) — rank AND score determinism is
  parallelism-independent by construction (hash doc ids, fixed segmentation).

Command: `python scripts/scaling.py --n {args.n} --n-docs {args.n_docs}`
Raw JSON: BENCH/SCALING.json
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
