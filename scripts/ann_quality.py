"""ANN quality harness: measured recall@k of the approximate paths (IVF
nprobe sweep, LSH multi-probe sweep) against exact brute-force cosine, on
the sf0.1 embeddings table. Writes BENCH/ANN.{json,md}.

Ground truth is computed in numpy driver-side (the table is collected
once — at harness scale only; the measured paths are the REAL Spark
operators). Queries are deterministic (sin closed form), so the table is
reproducible run-to-run.
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_QUERIES = 20


def qvec(i: int, dim: int = 64) -> list[float]:
    return [math.sin(i * 37 + j + 1) for j in range(dim)]


def main() -> None:
    from ck_spark.ops.ivf import build_ivf_index, ivf_topk
    from ck_spark.ops.similarity import ann_index_topk, build_ann_index
    from ck_spark.session import get_spark

    spark = get_spark("ann-quality", cores=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)

    def exact_topk(q: list[float]) -> set[int]:
        qv = np.asarray(q)
        sims = Mn @ (qv / np.linalg.norm(qv))
        order = np.lexsort((ids, -sims))[:K]
        return set(int(ids[i]) for i in order)

    truth = {i: exact_topk(qvec(i)) for i in range(N_QUERIES)}

    ivf_root = tempfile.mkdtemp(prefix="annq_ivf_")
    lsh_root = tempfile.mkdtemp(prefix="annq_lsh_")
    t0 = time.time()
    build_ivf_index(spark, emb, ivf_root, k_lists=16, sample_size=4096,
                    iters=10, seed=7)
    ivf_build_s = round(time.time() - t0, 2)
    t0 = time.time()
    build_ann_index(spark, emb, lsh_root, n_planes=8, dim=64)
    lsh_build_s = round(time.time() - t0, 2)

    report: dict = {
        "sf_dir": SF_DIR, "n_vectors": int(len(ids)), "k": K,
        "n_queries": N_QUERIES,
        "ivf": {"k_lists": 16, "build_s": ivf_build_s, "sweep": []},
        "lsh": {"n_planes": 8, "build_s": lsh_build_s, "sweep": []},
    }

    for nprobe in (1, 2, 4, 8, 16):
        hits = 0
        t0 = time.time()
        for i in range(N_QUERIES):
            got = {r["vec_id"] for r in
                   ivf_topk(spark, ivf_root, qvec(i), k=K, nprobe=nprobe).collect()}
            hits += len(got & truth[i])
        report["ivf"]["sweep"].append({
            "nprobe": nprobe,
            "recall_at_10": round(hits / (K * N_QUERIES), 4),
            "frac_lists_probed": round(nprobe / 16, 3),
            "s_per_query": round((time.time() - t0) / N_QUERIES, 3),
        })

    for probes in (0, 2, 4, 8):
        hits = 0
        t0 = time.time()
        for i in range(N_QUERIES):
            got = {r["vec_id"] for r in
                   ann_index_topk(spark, lsh_root, qvec(i), k=K,
                                  n_probes=probes).collect()}
            hits += len(got & truth[i])
        report["lsh"]["sweep"].append({
            "n_probes": probes,
            "recall_at_10": round(hits / (K * N_QUERIES), 4),
            "frac_buckets_probed": round((1 + probes) / 256, 4),
            "s_per_query": round((time.time() - t0) / N_QUERIES, 3),
        })

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ANN.json", "w") as f:
        json.dump(report, f, indent=1)
    lines = [
        "# ANN quality — measured recall vs probe budget\n",
        f"{len(ids)} vectors (64-dim, {SF_DIR}), k={K}, {N_QUERIES} "
        "deterministic queries; ground truth = exact cosine (numpy, "
        "driver-side); measured paths = the real Spark operators "
        "(ops/ivf.py, ops/similarity.py). Exhaustive probing is "
        "EXACT by construction on both paths (oracle-verified in the "
        "contract suite); the sweep shows what partial probing buys:\n",
        "## IVF (k-means, 16 lists, build "
        f"{ivf_build_s}s)\n",
        "| nprobe | lists probed | recall@10 | s/query |",
        "|---|---|---|---|",
    ]
    for e in report["ivf"]["sweep"]:
        lines.append(f"| {e['nprobe']} | {e['frac_lists_probed']:.0%} | "
                     f"{e['recall_at_10']} | {e['s_per_query']} |")
    lines += [
        f"\n## LSH (8 hyperplanes → 256 buckets, build {lsh_build_s}s)\n",
        "| extra probes | buckets probed | recall@10 | s/query |",
        "|---|---|---|---|",
    ]
    for e in report["lsh"]["sweep"]:
        lines.append(f"| {e['n_probes']} | {e['frac_buckets_probed']:.2%} | "
                     f"{e['recall_at_10']} | {e['s_per_query']} |")
    lines.append(
        "\nReading: IVF recall climbs with probed fraction and reaches "
        "1.0 at nprobe=k_lists (the exactness contract); LSH buys much "
        "smaller probed fractions at lower recall per probe — the two "
        "paths trade differently, which is why both ship. At 100 TB the "
        "probed-fraction column is the IO story: a query reads only the "
        "probed partitions (PLANS.md shows the PartitionFilters).\n\n"
        "Caveat: the synthetic embeddings are near-uniform random — the "
        "ADVERSARIAL case for a coarse quantizer (no cluster structure, "
        "so IVF recall ≈ probed fraction, the information-theoretic "
        "floor). Real embedding corpora cluster heavily; FAISS-style "
        "IVF recall curves there sit far above this floor at the same "
        "nprobe. The harness pins the floor so a regression in the "
        "assignment/probing machinery (recall dropping BELOW ≈fraction) "
        "is detectable.\n"
    )
    with open("BENCH/ANN.md", "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
