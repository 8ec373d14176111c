"""Memory-bandwidth saturation probe for the scaling-evidence writeup.

The N-vs-4N scaling runs (BENCH/scaling_runs_r4b.jsonl) show the SAME
stages' summed task wall inflating 45-75% at 8-way vs 2-way concurrency
with flat GC — the signature of shared-resource contention, not extra
engine work. This probe separates the two candidate resources on this
box by running the actual postings-encode kernel (numpy unique/lexsort
over flat shuffle rows + the varint block codec — the exact per-bucket
work `_make_bucket_encoder` does) in K concurrent PROCESSES (no GIL
sharing, no Spark) against a cache-resident control (small matmul):

  - kernel per-process wall flat in K, control flat  -> no contention
  - kernel inflates with K, control flat             -> memory bandwidth
  - both inflate                                     -> external host load

A real 4N-executor cluster brings 4N sockets' worth of memory channels;
one local[N] box does not — this probe quantifies how much of the
sub-4x wall quotient is that hardware delta rather than the engine.

Usage: python scripts/membw_probe.py [--rows 2000000] [--reps 3]
Appends one JSON line per (workload, K) to BENCH/membw_probe.jsonl.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _encode_kernel(rows: int, seed: int) -> float:
    """One bucket-encode's worth of work, timed: synthetic flat
    (term_code, doc_id, tf, dl) arrays -> unique/lexsort/split -> varint
    block encode. Mirrors builder._make_bucket_encoder."""
    import numpy as np

    from ck_spark.codec import encode_posting_blocks_batch

    rng = np.random.default_rng(seed)
    n_terms = max(64, rows // 200)
    codes = rng.integers(0, n_terms, rows)
    doc_ids = rng.integers(0, 1 << 40, rows)
    tfs = rng.integers(1, 4, rows)  # realistic small tf; sizes the pos stream
    dls = rng.integers(20, 4000, rows)
    flat_pos_all = rng.integers(0, 4000, int(tfs.sum()))
    t0 = time.perf_counter()
    order = np.lexsort((doc_ids, codes))
    codes_s = codes[order]
    bounds = np.concatenate([[0], np.flatnonzero(np.diff(codes_s)) + 1,
                             [len(codes_s)]])
    ids_l = np.split(doc_ids[order], bounds[1:-1])
    tfs_l = np.split(tfs[order], bounds[1:-1])
    dls_l = np.split(dls[order], bounds[1:-1])
    tf_cum = np.cumsum(tfs[order])
    pos_bounds = np.concatenate([[0], tf_cum])[bounds[1:-1]]
    poss_l = np.split(flat_pos_all[: tf_cum[-1]], pos_bounds)
    for chunk in range(0, len(ids_l), 4096):
        encode_posting_blocks_batch(
            ids_l[chunk:chunk + 4096], tfs_l[chunk:chunk + 4096],
            dls_l[chunk:chunk + 4096], poss_l[chunk:chunk + 4096],
            400.0, 1.2, 0.75, 128,
        )
    return time.perf_counter() - t0


def _trigram_kernel(rows: int, seed: int) -> float:
    """One trigram-extraction task's worth of work, timed: synthetic
    code-like documents -> lowercase/encode -> `_extract_pairs` in the
    same ~8 MB flush rhythm `_partial_posting_rows` uses. ``rows`` is
    interpreted as total content bytes (default 2 MB * rows/2e6 docs of
    ~2 KB). This is the stage the 480k with-trigram scaling runs show
    FLAT across 2-vs-8 cores (scaling_runs_r4c.jsonl); this probe
    attributes that to per-process inflation under concurrency, not to a
    serial term in the job."""
    import numpy as np

    from ck_spark.query.trigram import _extract_pairs

    from ck_spark.corpus import generate_corpus

    # the REAL corpus content (identifier diversity matters: a low-
    # diversity synthetic shows NO inflation because its post-dedupe
    # arrays stay cache-resident; production content does not)
    n_docs = max(64, rows // 900)  # ~900 B/doc at body_scale 1
    docs = [
        str(c).lower().encode("utf-8")
        for c in generate_corpus(n_docs, seed=seed)["content"]
    ]
    t0 = time.perf_counter()
    bufs, nb = [], 0
    for b in docs:
        bufs.append(b)
        nb += len(b)
        if nb >= 8 * (1 << 20):
            _extract_pairs(bufs)
            bufs, nb = [], 0
    if bufs:
        _extract_pairs(bufs)
    return time.perf_counter() - t0


def _control_kernel(rows: int, seed: int) -> float:
    """Cache-resident compute control: repeated 192x192 matmul (~300 KB
    working set, fits L2) with FLOP count scaled to ~the kernel's wall
    at K=1 so the two report comparable magnitudes."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.standard_normal((192, 192)).astype(np.float32)
    b = rng.standard_normal((192, 192)).astype(np.float32)
    iters = max(1, rows // 2500)
    t0 = time.perf_counter()
    for _ in range(iters):
        a = np.tanh(a @ b)
    return time.perf_counter() - t0


def _worker(kind: str, rows: int, seed: int, q: mp.Queue) -> None:
    os.environ["OMP_NUM_THREADS"] = "1"  # one core per process, no BLAS fan-out
    fn = {"kernel": _encode_kernel, "trigram": _trigram_kernel,
          "control": _control_kernel}[kind]
    q.put(fn(rows, seed))


def run_level(kind: str, k: int, rows: int, reps: int) -> dict:
    walls = []
    for rep in range(reps):
        q: mp.Queue = mp.Queue()
        procs = [
            mp.Process(target=_worker, args=(kind, rows, 1000 + i, q))
            for i in range(k)
        ]
        t0 = time.perf_counter()
        for p in procs:
            p.start()
        vals = [q.get() for _ in procs]
        for p in procs:
            p.join()
        walls.append({
            "batch_wall_s": round(time.perf_counter() - t0, 3),
            "per_proc_mean_s": round(sum(vals) / len(vals), 3),
            "per_proc_max_s": round(max(vals), 3),
        })
    best = min(walls, key=lambda w: w["per_proc_mean_s"])
    return {"workload": kind, "concurrency": k, **best, "reps": reps}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--workloads", default="kernel,control")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(repo, "BENCH", "membw_probe.jsonl")
    for kind in args.workloads.split(","):
        base = None
        for k in (1, 2, 4, 8):
            rec = run_level(kind, k, args.rows, args.reps)
            if base is None:
                base = rec["per_proc_mean_s"]
            rec["inflation_vs_k1"] = round(rec["per_proc_mean_s"] / base, 3)
            rec["loadavg_1m"] = round(os.getloadavg()[0], 2)
            rec["ts"] = time.time()
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
