"""Variance hunt for the trigram build: repeated isolated runs of ONLY
build_trigram_index over a prebuilt stored-content index, each in a
fresh spark-submit JVM with per-stage task quantiles — so when a slow
run appears (observed 50-555 s for the identical job on an idle guest),
the stage table says where the time went (python kernel vs shuffle vs
write vs gram-stats), separating engine pathology from host noise.

Driver:  python scripts/trigram_variance_probe.py --root <index> --runs 10
Worker:  spark-submit ... scripts/trigram_variance_probe.py --root <index> \
             --cores 8 --worker
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(args) -> None:
    from pyspark.sql import SparkSession

    from ck_spark.session import _pin_malloc_env

    _pin_malloc_env()
    spark = (
        SparkSession.builder.appName("ck-tri-probe")
        .master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(max(args.cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.task.maxFailures", "4")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ck_spark.query.trigram import build_trigram_index

    t0 = time.time()
    rows = build_trigram_index(spark, None, args.root)
    wall = time.time() - t0

    out = {"trigram_s": round(wall, 2), "rows": rows, "cores": args.cores}
    try:
        import urllib.request

        app_id = spark.sparkContext.applicationId
        ui = spark.sparkContext.uiWebUrl or "http://localhost:4040"
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        ) as r:
            st = json.loads(r.read())
        big = sorted(st, key=lambda s: -s["executorRunTime"])[:4]
        tops = []
        for s in big:
            row = {
                "tasks": s["numCompleteTasks"],
                "run_s": round(s["executorRunTime"] / 1e3, 1),
                "cpu_s": round(s["executorCpuTime"] / 1e9, 1),
                "gc_s": round(s["jvmGcTime"] / 1e3, 1),
                "write_s": round(s.get("shuffleWriteTime", 0) / 1e9, 1),
                "fetch_s": round(s.get("shuffleFetchWaitTime", 0) / 1e3, 1),
            }
            try:
                with urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/stages/"
                    f"{s['stageId']}/{s['attemptId']}/taskSummary"
                    "?quantiles=0.0,0.5,1.0",
                    timeout=10,
                ) as rq:
                    q = json.loads(rq.read())
                lo, med, hi = q["executorRunTime"]
                row["task_med_s"] = round(med / 1e3, 1)
                row["task_max_s"] = round(hi / 1e3, 1)
            except Exception:
                pass
            tops.append(row)
        out["top_stages"] = tops
    except Exception as e:
        out["metrics_error"] = str(e)[:120]
    print("TRI_PROBE_RESULT " + json.dumps(out))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--worker", action="store_true")
    args = ap.parse_args()
    if args.worker:
        worker(args)
        return
    out_path = os.path.join(REPO, "BENCH", "trigram_variance_probe.jsonl")
    zip_path = os.path.join(REPO, "BENCH", "dist.zip")
    def cpu_ticks():
        # (busy, steal, total) jiffies from /proc/stat — steal is CPU the
        # HYPERVISOR withheld from this guest (the host-variance witness)
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return sum(vals), steal

    for i in range(args.runs):
        lb = os.getloadavg()[0]
        tot0, steal0 = cpu_ticks()
        r = subprocess.run(
            [
                "spark-submit", "--master", f"local[{args.cores}]",
                "--driver-memory", f"{2 * args.cores}g",
                "--py-files", zip_path,
                os.path.abspath(__file__),
                "--root", args.root, "--cores", str(args.cores), "--worker",
            ],
            capture_output=True, text=True, timeout=1800,
        )
        for ln in r.stdout.splitlines():
            if ln.startswith("TRI_PROBE_RESULT "):
                rec = json.loads(ln[len("TRI_PROBE_RESULT "):])
                rec["load_before"] = round(lb, 2)
                tot1, steal1 = cpu_ticks()
                rec["steal_pct"] = round(
                    100.0 * (steal1 - steal0) / max(tot1 - tot0, 1), 2
                )
                rec["ts"] = time.time()
                with open(out_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(i, rec["trigram_s"], flush=True)
                break
        else:
            sys.stderr.write(r.stderr[-1500:] + "\n")


if __name__ == "__main__":
    main()
