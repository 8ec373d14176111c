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

    # near-duplicate competitors: duplicate ~10% of docs with a tiny
    # perturbation BEFORE indexing — the gold doc must outrank its dup
    dup_idx = rng.choice(len(pdf), size=max(len(pdf) // 10, 5), replace=False)
    dups = pdf.iloc[dup_idx].copy()
    dups["path"] = dups["path"] + "_neardup"
    dups["content"] = dups["content"] + "\n# nd pad line\n"
    import pandas as _pd

    pdf = _pd.concat([pdf, dups], ignore_index=True)
    # rebuild over the dup-augmented corpus
    import shutil as _shutil

    _shutil.rmtree(root, ignore_errors=True)
    build_index(spark, spark.createDataFrame(pdf), root, mode="code",
                n_segments=4, term_buckets=16, build_groups=1)
    idx = BM25Index.load(spark, root)
    ts = spark.read.parquet(idx.paths.term_stats).select("term", "df").toPandas()
    df_map = dict(zip(ts["term"], ts["df"]))
    dm = spark.read.parquet(idx.paths.doc_map).select(
        "doc_id", "repo", "path").toPandas()
    key2id = {(r.repo, r.path): int(r.doc_id) for r in dm.itertuples()}

    from ck_spark.tokenizer import term_positions_text

    body = pdf[~pdf["content"].str.contains("\x00")
               & (pdf["content"].str.len() > 80)
               & ~pdf["path"].str.endswith("_neardup")]
    picked = rng.choice(len(body), size=min(args.n, len(body)), replace=False)
    dup_paths = set(dups["path"])

    # query classes (VERDICT r3 ask #6 — the harness needs headroom):
    #   rare        4 rarest df>=2 tokens (the round-3 ceiling class)
    #   distractor  2 rare tokens + 2 HIGH-df tokens — noise terms must
    #               not drown the signal
    #   mid_df      4 mid-frequency tokens (df 5..60) — weakly
    #               discriminative, ranking carries all the weight
    #   phrase      a distinctive adjacent bigram as a "syntax" phrase
    #   prox_bigram the phrase-class bigram issued as a BAG-OF-WORDS query
    #               — BM25 is adjacency-blind here, so the class isolates
    #               the proximity reranker's contribution
    #   near_dup    rare-token query for a doc whose near-duplicate is in
    #               the index — gold must beat its own copy
    queries, gold, qclass = [], [], []

    def add(cls, q, mode, gid):
        queries.append((q, mode))
        gold.append(gid)
        qclass.append(cls)

    for i in picked:
        row = body.iloc[int(i)]
        gid = key2id[(row["repo"], row["path"])]
        toks = list(dict.fromkeys(tokenize(row["content"], "code")))
        rare = sorted((t for t in toks if df_map.get(t, 0) >= 2),
                      key=lambda t: (df_map[t], t))
        common = sorted((t for t in toks if df_map.get(t, 0) >= 2),
                        key=lambda t: (-df_map[t], t))
        mid = [t for t in rare if 5 <= df_map[t] <= 150]
        if len(rare) >= 3:
            add("rare", " ".join(rare[:4]), "or", gid)
        if len(rare) >= 2 and len(common) >= 2 and df_map[common[0]] >= 50:
            add("distractor", " ".join(rare[:2] + common[:2]), "or", gid)
        if len(mid) >= 3:
            add("mid_df", " ".join(mid[:4]), "or", gid)
        pos = term_positions_text(row["content"], "code")
        posmap = {p: t for t, ps in pos.items() for p in ps}
        big = None
        for p, t in sorted(posmap.items()):
            nxt = posmap.get(p + 1)
            if nxt and t != nxt and 2 <= df_map.get(t, 9e9) <= 30 \
                    and df_map.get(nxt, 0) >= 2:
                big = (t, nxt)
                break
        if big:
            add("phrase", f'"{big[0]} {big[1]}"', "syntax", gid)
            # the SAME bigram as a bag-of-words query: BM25 cannot see
            # adjacency, so this class isolates what the proximity
            # reranker adds (phrase class resolves it index-side instead)
            add("prox_bigram", f"{big[0]} {big[1]}", "or", gid)
        if row["path"] + "_neardup" in dup_paths and len(rare) >= 3:
            add("near_dup", " ".join(rare[:4]), "or", gid)

    # top up the mid_df class to >=100 queries from the full corpus (the
    # picked sample alone yields ~15: few docs carry >=3 mid-band tokens
    # — VERDICT r4 ask #4 wants the weakest class at n>=100)
    md_have = sum(1 for c in qclass if c == "mid_df")
    md_gold = {g for g, c in zip(gold, qclass) if c == "mid_df"}
    for j in rng.permutation(len(body)):
        if md_have >= 100:
            break
        row = body.iloc[int(j)]
        gid = key2id[(row["repo"], row["path"])]
        if gid in md_gold:
            continue
        toks = list(dict.fromkeys(tokenize(row["content"], "code")))
        mid = sorted((t for t in toks if 5 <= df_map.get(t, 0) <= 150),
                     key=lambda t: (df_map[t], t))
        if len(mid) >= 3:
            add("mid_df", " ".join(mid[:4]), "or", gid)
            md_gold.add(gid)
            md_have += 1

    # top up the near_dup class from the dup'd originals directly (the
    # random picked-sample intersection alone is a handful of queries)
    nd_have = sum(1 for c in qclass if c == "near_dup")
    for _, row in pdf.iloc[dup_idx].iterrows():
        if nd_have >= 40:
            break
        if "\x00" in row["content"] or row["path"].endswith("_neardup"):
            continue
        gid = key2id[(row["repo"], row["path"])]
        if gid in {g for g, c in zip(gold, qclass) if c == "near_dup"}:
            continue
        toks = list(dict.fromkeys(tokenize(row["content"], "code")))
        rare = sorted((t for t in toks if df_map.get(t, 0) >= 2),
                      key=lambda t: (df_map[t], t))
        if len(rare) >= 3:
            add("near_dup", " ".join(rare[:4]), "or", gid)
            nd_have += 1
    assert queries, "no queries synthesized"

    t0 = time.time()
    res = idx.search_many(queries, k=args.k).toPandas()
    wall = time.time() - t0

    # rerank arm: rescore each query's top-k with the proximity kernel
    # (query/rerank.py — the same function the distributed rerank=True
    # path runs inside its Arrow UDF; test_rerank.py pins that path).
    # Rerank permutes WITHIN the top-k, so Recall@K is unchanged by
    # construction — the arm measures the MRR delta per class.
    from ck_spark.query.rerank import proximity_boost_text

    id2content = {
        key2id[(r.repo, r.path)]: r.content for r in pdf.itertuples()
    }

    def rerank_order(qid: int, ranked: list, scores: list) -> list:
        q, _mode = queries[qid]
        qterms = list(dict.fromkeys(tokenize(q.strip('"'), "code")))
        rescored = sorted(
            ((s * proximity_boost_text(id2content[d], qterms, "code"), d)
             for d, s in zip(ranked, scores)),
            key=lambda x: (-x[0], x[1]))
        return [d for _, d in rescored]

    from collections import defaultdict

    agg = defaultdict(lambda: {"n": 0, "hits": 0, "rr": 0.0, "rr_rr": 0.0,
                               "perm": 0, "gold_moved": 0})
    for qid, (g, cls) in enumerate(zip(gold, qclass)):
        sub = res[res["query_id"] == qid]
        ranked = sub["doc_id"].tolist()
        rr_ranked = rerank_order(qid, ranked, sub["score"].tolist())
        for key in (cls, "ALL"):
            a = agg[key]
            a["n"] += 1
            if rr_ranked != ranked:
                a["perm"] += 1
            if g in ranked:
                a["hits"] += 1
                a["rr"] += 1.0 / (ranked.index(g) + 1)
                a["rr_rr"] += 1.0 / (rr_ranked.index(g) + 1)
                if rr_ranked.index(g) != ranked.index(g):
                    a["gold_moved"] += 1

    per_class = {
        cls: {"n": a["n"], "recall_at_k": round(a["hits"] / a["n"], 4),
              "mrr": round(a["rr"] / a["n"], 4),
              "mrr_rerank": round(a["rr_rr"] / a["n"], 4),
              "lists_permuted": a["perm"], "gold_moved": a["gold_moved"]}
        for cls, a in sorted(agg.items())
    }
    n = agg["ALL"]["n"]
    recall = agg["ALL"]["hits"] / n
    mrr = agg["ALL"]["rr"] / n

    # mid_df miss diagnosis (VERDICT r4 ask #4): for every mid_df query
    # whose gold is not rank-1, compare gold vs the doc that beat it —
    # term coverage, summed tf over the query terms, and doc length.
    # If winners cover MORE query terms / higher tf, the miss is
    # BM25-inherent (another doc genuinely matches the bag-of-words
    # better); if coverage/tf tie and the winner is merely shorter, it
    # is length-normalization; mismatched token splits would show up as
    # gold coverage below the query's term count.
    from collections import Counter

    def _cov_tf(doc_id_: int, qterms_: list) -> tuple[int, int, int]:
        tl = tokenize(id2content[doc_id_], "code")
        c = Counter(tl)
        return (sum(1 for t in qterms_ if c[t] > 0),
                sum(c[t] for t in qterms_), len(tl))

    mid_diag = []
    for qid, (g, cls) in enumerate(zip(gold, qclass)):
        if cls != "mid_df":
            continue
        sub = res[res["query_id"] == qid]
        ranked = sub["doc_id"].tolist()
        rank = ranked.index(g) + 1 if g in ranked else None
        if rank == 1:
            continue
        qterms = queries[qid][0].split()
        g_cov, g_tf, g_len = _cov_tf(g, qterms)
        w_cov, w_tf, w_len = _cov_tf(int(ranked[0]), qterms)
        mid_diag.append({
            "rank": rank, "n_qterms": len(qterms),
            "gold": {"cov": g_cov, "tf": g_tf, "len": g_len},
            "winner": {"cov": w_cov, "tf": w_tf, "len": w_len},
        })

    out = {
        "metric": "retrieval_quality",
        "mid_df_misses": mid_diag,
        "recall_at_k": round(recall, 4),
        "mrr": round(mrr, 4),
        "k": args.k,
        "n_queries": n,
        "per_class": per_class,
        "batch_wall_sec": round(wall, 3),
        "per_query_ms": round(1000 * wall / n, 1),
        "corpus_docs": args.docs,
        "seed": args.seed,
    }
    print(json.dumps(out))

    md = os.path.join(REPO, "BENCH", "RETRIEVAL.md")
    tag = args.tag or "r?"
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
    sect = (
        "## per-class breakdown (round 4+: harder query classes)\n\n"
        "rare = rarest-token queries (the old ceiling class); "
        "distractor = 2 rare + 2 ubiquitous noise terms; mid_df = "
        "only mid-frequency terms; phrase = adjacent-bigram syntax "
        "query; prox_bigram = the same bigram as bag-of-words "
        "(adjacency invisible to BM25 — the reranker's showcase); "
        "near_dup = gold must outrank its own near-duplicate."
        "\n\n"
        "| round | class | n | Recall@10 | MRR |\n"
        "|---|---|---|---|---|\n"
    )
    rr_sect = (
        "## rerank arm — proximity reranker MRR delta\n\n"
        "Same query set, each top-k rescored with the proximity "
        "kernel (ck_spark/query/rerank.py — the rerank=True path's "
        "scorer; permutes within top-k, so Recall@K is unchanged "
        "by construction and only MRR moves). `lists permuted` = "
        "queries whose top-k ORDER changed under rerank (proof the "
        "arm is live); `gold moved` = queries whose GOLD rank "
        "changed — a zero delta with nonzero permutations means "
        "the boost reorders tail competitors but BM25 already "
        "placed gold correctly relative to its own coverage "
        "class.\n\n"
        "| round | class | n | MRR base | MRR rerank | delta "
        "| lists permuted | gold moved |\n"
        "|---|---|---|---|---|---|---|---|\n"
    )

    def insert_rows(text: str, section: str, rows: list[str]) -> str:
        """Append rows to the END of `section`'s table (the text between
        its heading and the next '## ' heading or EOF), creating the
        section at EOF if absent. Appending at file-end unconditionally —
        the old behavior — interleaved each re-run's headline/per-class/
        rerank rows after the LAST table, producing misaligned columns
        (the corruption VERDICT r4 flagged at commit 5b50d69)."""
        head = section.splitlines()[0]
        if head not in text:
            if not text.endswith("\n"):
                text += "\n"
            return text + "\n" + section + "".join(rows)
        start = text.index(head)
        nxt = text.find("\n## ", start + len(head))
        end = len(text) if nxt == -1 else nxt + 1  # keep trailing newline
        seg = text[:end].rstrip("\n") + "\n" + "".join(rows)
        if nxt == -1:
            return seg
        return seg + "\n" + text[end:].lstrip("\n")

    text = open(md).read() if os.path.exists(md) else header
    text = insert_rows(
        text, header,
        [f"| {tag} | gen{args.docs}+dups | {n} "
         f"| {recall:.3f} | {mrr:.3f} | {wall:.2f} "
         f"| {1000 * wall / n:.1f} |\n"],
    )
    cls_rows = [
        f"| {tag} | {cls} | {v['n']} "
        f"| {v['recall_at_k']:.3f} | {v['mrr']:.3f} |\n"
        for cls, v in per_class.items() if cls != "ALL"
    ] + [f"| {tag} | **ALL** | {n} | {recall:.3f} | {mrr:.3f} |\n"]
    text = insert_rows(text, sect, cls_rows)
    rr_rows = [
        f"| {tag} | {'**ALL**' if cls == 'ALL' else cls} | {v['n']} "
        f"| {v['mrr']:.3f} | {v['mrr_rerank']:.3f} "
        f"| {v['mrr_rerank'] - v['mrr']:+.3f} "
        f"| {v['lists_permuted']} | {v['gold_moved']} |\n"
        for cls, v in per_class.items()
    ]
    text = insert_rows(text, rr_sect, rr_rows)
    with open(md, "w") as f:
        f.write(text)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
