"""Steal-gated bench sampler (round 6 measurement harness): waits for a
host-steal-calm window, runs the UNMODIFIED bench.py N times, writes the
per-query min to a summary json (results committed as
BENCH/r06_gated_samples.json). Usage: bench_gated.py OUT.json [N] [label];
SF dir via $GATED_SF_DIR."""
import json, os, re, subprocess, sys, time

OUT = sys.argv[1]
N = int(sys.argv[2]) if len(sys.argv) > 2 else 3
LABEL = sys.argv[3] if len(sys.argv) > 3 else "run"

def steal_pct(secs=8):
    def rd():
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        return sum(v), v[7]
    t0, s0 = rd(); time.sleep(secs); t1, s1 = rd()
    return 100.0 * (s1 - s0) / max(t1 - t0, 1)

samples = []
for i in range(N):
    for attempt in range(60):
        sp = steal_pct()
        if sp < 1.0:
            break
        print(f"[{LABEL}] waiting for calm window (steal {sp:.1f}%)", flush=True)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=os.environ.get("GATED_SF_DIR", "/root/testdata/sf1.0"), SPARK_GRAFT_CPUS="32")
    t0 = time.time()
    p = subprocess.run([sys.executable, "bench.py"], cwd="/root/repo", env=env,
                       capture_output=True, text=True, timeout=900)
    m = None
    for line in p.stdout.splitlines():
        if '"metric"' in line:
            m = json.loads(re.search(r'\{"metric".*\}', line).group(0))
    if m:
        samples.append(m)
        print(f"[{LABEL}] sample {i}: total {m['value']} steal {m['cpu_steal_pct']} wall {time.time()-t0:.0f}s", flush=True)
    else:
        print(f"[{LABEL}] sample {i} FAILED rc={p.returncode}\n{p.stdout[-500:]}\n{p.stderr[-500:]}", flush=True)

if samples:
    keys = samples[0]["queries"].keys()
    qmin = {k: min(s["queries"][k] for s in samples if k in s["queries"]) for k in keys}
    summary = {"label": LABEL, "n": len(samples), "queries_min": qmin,
               "total_min_sum": round(sum(qmin.values()), 3),
               "totals": [s["value"] for s in samples],
               "steals": [s["cpu_steal_pct"] for s in samples]}
    with open(OUT, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[{LABEL}] DONE total_min_sum={summary['total_min_sum']}", flush=True)
