"""Retrieval-quality harness: Recall@K + MRR of the BM25 stack on
synthesized known-answer queries — the analogue of the reference's
SWE-bench Lite retrieval benchmark (benchmarks/swe-bench/README.md:11-21:
Recall@K = gold file in top K, MRR = 1/rank of the first relevant file,
BM25 baseline).

No external dataset exists in this sandbox, so ground truth is
synthesized deterministically over the engine's generated code corpus
(ck_spark.corpus.generate_corpus — compound identifiers make documents
distinguishable; the driver's sf* documents table is a ~31-word bag with
no discriminative terms, useless for ranking ground truth): for each
sampled document, the "issue" is a query of that document's rarest
sub-tokens (df >= 2, so ranking matters — several docs share each term),
and the gold answer is that document. This guards RANKING QUALITY
regressions beyond the hash-identity contract: a scorer bug that kept
hash-parity with a broken oracle would still crater Recall@10 here.

All queries run through search_many — ONE Spark job for the whole query
set (the batch path the 100 TB deployment would use).

Usage: python scripts/retrieval_quality.py [--n 100] [--docs 1500]
Appends a per-round row to BENCH/RETRIEVAL.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1500, help="corpus size")
    ap.add_argument("--n", type=int, default=100, help="queries to synthesize")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tag", default="", help="row label (e.g. r3)")
    args = ap.parse_args()

    import tempfile

    import numpy as np

    from ck_spark.corpus import generate_corpus
    from ck_spark.index import build_index
    from ck_spark.query import BM25Index
    from ck_spark.session import get_spark
    from ck_spark.tokenizer import tokenize

    spark = get_spark("retrieval-quality", cores=8)
    pdf = generate_corpus(args.docs, seed=args.seed + 1)
    root = tempfile.mkdtemp(prefix="retrieval-")
    build_index(spark, spark.createDataFrame(pdf), root, mode="code",
                n_segments=4, term_buckets=16, build_groups=1)
    idx = BM25Index.load(spark, root)
    rng = np.random.default_rng(args.seed)

    # df for term selection (at scale: one pruned read of term_stats)
    ts = spark.read.parquet(idx.paths.term_stats).select("term", "df").toPandas()
    df_map = dict(zip(ts["term"], ts["df"]))
    dm = spark.read.parquet(idx.paths.doc_map).select(
        "doc_id", "repo", "path").toPandas()
    key2id = {(r.repo, r.path): int(r.doc_id) for r in dm.itertuples()}

    body = pdf[~pdf["content"].str.contains("\x00") & (pdf["content"].str.len() > 80)]
    picked = rng.choice(len(body), size=min(args.n, len(body)), replace=False)
    queries, gold = [], []
    for i in picked:
        row = body.iloc[int(i)]
        toks = list(dict.fromkeys(tokenize(row["content"], "code")))
        # rarest terms with df >= 2: discriminative, but shared with other
        # docs so the ranking (not just candidate membership) is exercised
        cand = sorted(
            (t for t in toks if df_map.get(t, 0) >= 2),
            key=lambda t: (df_map[t], t),
        )
        if len(cand) < 3:
            continue
        queries.append((" ".join(cand[:4]), "or"))
        gold.append(key2id[(row["repo"], row["path"])])
    assert queries, "no queries synthesized"

    t0 = time.time()
    res = idx.search_many(queries, k=args.k).toPandas()
    wall = time.time() - t0

    hits, rr = 0, 0.0
    for qid, g in enumerate(gold):
        ranked = res[res["query_id"] == qid]["doc_id"].tolist()
        if g in ranked:
            hits += 1
            rr += 1.0 / (ranked.index(g) + 1)
    n = len(gold)
    recall = hits / n
    mrr = rr / n

    out = {
        "metric": "retrieval_quality",
        "recall_at_k": round(recall, 4),
        "mrr": round(mrr, 4),
        "k": args.k,
        "n_queries": n,
        "batch_wall_sec": round(wall, 3),
        "per_query_ms": round(1000 * wall / n, 1),
        "corpus_docs": args.docs,
        "seed": args.seed,
    }
    print(json.dumps(out))

    md = os.path.join(REPO, "BENCH", "RETRIEVAL.md")
    header = (
        "# RETRIEVAL — ranking-quality tracking (Recall@K / MRR)\n\n"
        "Known-answer queries synthesized from held-out documents "
        "(scripts/retrieval_quality.py — the SWE-bench-Lite analogue, "
        "reference benchmarks/swe-bench/README.md:11-21). Guards ranking "
        "quality beyond the hash-identity contract. All queries run as ONE "
        "batched search_many job.\n\n"
        "| round | corpus | n | Recall@10 | MRR | batch wall (s) | per-query (ms) |\n"
        "|---|---|---|---|---|---|---|\n"
    )
    if not os.path.exists(md):
        with open(md, "w") as f:
            f.write(header)
    with open(md, "a") as f:
        f.write(
            f"| {args.tag or 'r?'} | gen{args.docs} | {n} "
            f"| {recall:.3f} | {mrr:.3f} | {wall:.2f} "
            f"| {1000 * wall / n:.1f} |\n"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
