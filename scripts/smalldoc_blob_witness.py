"""Small-doc blob-tier IO witness (round 5 — VERDICT r4 ask #7).

The format-2 content store packs up to _PACK_MAX_DOCS (32) small docs
per compressed block, so the point-read blob tier should now beat the
sequential scan
on ~small-doc corpora where the per-doc framing overhead previously
measured 4x the scan's bytes (BENCH/SCALE_DEMO r4, which routed these
corpora to a scan-equal doc_map semi-join instead). This script
witnesses that directly: build a small-doc corpus, force the
distributed over-cap fetch path (CANDIDATE_COLLECT_MAX=0), and compare
the /proc rchar process-tree read volume of the plain scan grep vs the
trigram+blob grep on MID-SIZE candidate sets.

The rchar witness is load-insensitive (bytes, not wall), so this can
run on a busy host. Methodology identical to scripts/scale_demo.py
(whole process tree: JVM + python workers + driver; socket reads
double-counted AGAINST the blob side, never for it).

Usage: python scripts/smalldoc_blob_witness.py [--docs 120000]
Prints one JSON line per pattern and a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tree_pids() -> list[int]:
    pids = [os.getpid()]
    i = 0
    while i < len(pids):
        kids = subprocess.run(
            ["pgrep", "-P", str(pids[i])], capture_output=True, text=True
        ).stdout.split()
        pids.extend(int(k) for k in kids)
        i += 1
    return pids


def _rchar_tree() -> dict[int, int]:
    out: dict[int, int] = {}
    for pid in _tree_pids():
        try:
            with open(f"/proc/{pid}/io") as f:
                for line in f:
                    if line.startswith("rchar:"):
                        out[pid] = int(line.split()[1])
                        break
        except OSError:
            pass
    return out


def _rchar_delta(before: dict[int, int], after: dict[int, int]) -> int:
    return sum(v - before.get(p, 0) for p, v in after.items())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=120000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import time

    from pyspark.sql import functions as F

    import ck_spark.query.trigram as tri_mod
    from ck_spark.corpus import generate_corpus_spark
    from ck_spark.index import build_index
    from ck_spark.index.content_store import ContentStore, build_content_store
    from ck_spark.query.grep import grep
    from ck_spark.query.trigram import TrigramIndex, build_trigram_index
    from ck_spark.session import get_spark

    spark = get_spark("smalldoc-blob-witness", cores=args.cores)
    root = tempfile.mkdtemp(prefix="ck_smalldoc_")
    # body_scale=1: the smallest synthetic docs the generator makes —
    # the regime where per-doc blob framing previously lost to the scan
    corpus = generate_corpus_spark(
        spark, args.docs, seed=11, partitions=args.cores * 4, body_scale=1
    )
    cpath = os.path.join(root, "corpus_parquet")
    corpus.write.mode("overwrite").parquet(cpath)
    disk = spark.read.parquet(cpath)
    avg_doc = float(
        disk.agg(F.avg(F.octet_length("content"))).collect()[0][0]
    )
    build_index(spark, disk, root, mode="code",
                n_segments=max(4, args.docs // 60000), term_buckets=16,
                build_groups=1, resume=False)
    build_trigram_index(spark, disk, root)
    build_content_store(spark, root)
    store = ContentStore.load(spark, root)
    assert store.packed, "expected a format-2 packed store"
    assert store.avg_raw_len < tri_mod.BLOB_MIN_DOC_BYTES, (
        "corpus must be small-doc for this witness", store.avg_raw_len)
    tri = TrigramIndex.load(spark, root, cache=True)

    # force the DISTRIBUTED over-cap fetch path: with the driver-side
    # collect cap at 0 every candidate set routes through the pointer
    # join + ranged block reads (the tier under test)
    tri_mod.CANDIDATE_COLLECT_MAX = 0

    tri.grep(pattern="zzwarmupzz", topk=1).collect()  # warm workers
    grep(disk, "zzwarmupzz", topk=1).collect()

    rows_out = []
    # patterns chosen to SPAN candidate fractions: rare literals (the
    # selective-grep case the tier exists for) through broad ones
    # (where the 15% triage knee rightly hands off to the scan)
    for pat in [r"quixotic", r"zephyrblade_\w+", r"parse_buffer",
                r"def parse_\w+", r"return cache"]:
        n_cand = tri.candidates(tri_mod.trigram_dnf(pat.lower())).count()
        scan_mb, blob_mb, scan_w, blob_w = [], [], [], []
        scan_rows = blob_rows = 0
        for _ in range(args.reps):
            r0, t0 = _rchar_tree(), time.time()
            scan_rows = len(grep(disk, pat, topk=100000).collect())
            scan_w.append(time.time() - t0)
            scan_mb.append(_rchar_delta(r0, _rchar_tree()) / 1e6)
            r0, t0 = _rchar_tree(), time.time()
            blob_rows = len(tri.grep(pattern=pat, topk=100000).collect())
            blob_w.append(time.time() - t0)
            blob_mb.append(_rchar_delta(r0, _rchar_tree()) / 1e6)
        assert scan_rows == blob_rows, (pat, scan_rows, blob_rows)
        rec = {
            "pattern": pat,
            "candidates": int(n_cand),
            "candidate_frac": round(n_cand / args.docs, 4),
            "rows": scan_rows,
            "scan_read_mb": round(statistics.median(scan_mb), 1),
            "blob_read_mb": round(statistics.median(blob_mb), 1),
            "io_saving": round(statistics.median(scan_mb)
                               / max(statistics.median(blob_mb), 1e-9), 2),
            "scan_wall_s": round(statistics.median(scan_w), 2),
            "blob_wall_s": round(statistics.median(blob_w), 2),
        }
        rows_out.append(rec)
        print(json.dumps(rec), flush=True)

    print(json.dumps({
        "metric": "smalldoc_blob_witness",
        "docs": args.docs,
        "avg_doc_bytes": round(avg_doc, 1),
        "store_avg_raw_len": round(store.avg_raw_len, 1),
        "patterns": rows_out,
    }))
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
