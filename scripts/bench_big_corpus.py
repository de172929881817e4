"""Dedup/ANN walls past fixed-overhead territory (VERDICT r03 task #8).

Every sf0.1 headline timing (5,000 docs / 2,000 vectors) is dominated by
job overhead; this script generates a 100×-larger corpus ONCE (500k docs
with controlled 5% near-dup structure, 500k clustered embeddings) and
times the headline dedup/similarity operators against it, so the shuffle
behavior the plans promise is actually exercised. Protocol: warm run
then best-of-2 (CLAUDE.md), one job at a time, loadavg stamped.

ANN parameters scale with the corpus (the sf0.1 entry points are sized
for n=2,000): LSH uses (n_planes=14, n_tables=8) — ~16k buckets/table,
~30 corpus rows per bucket; IVF uses centroid_mod=1024, n_probe=8
(~490 lists). Both are the "more planes / more lists at larger n"
guidance the BENCH.md recall section derives.

Usage: python scripts/bench_big_corpus.py [n_docs] [cpus]   # default 500000 32
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DOCS_PATH = f"/tmp/lcs_big_docs_{N}"
EMB_PATH = f"/tmp/lcs_big_emb_{N}"
DIM = 64


def main() -> None:
    from pyspark.sql import functions as F

    from lyrics_crawler_spark.operators.similarity import (
        ann_ivf_topk,
        ann_lsh_topk,
    )
    from lyrics_crawler_spark.operators.textdedup import (
        exact_dedup,
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )
    from lyrics_crawler_spark.session import get_spark
    from lyrics_crawler_spark.sitegen.corpus import synthetic_documents
    from lyrics_crawler_spark.sitegen.embeddings import clustered_embeddings

    spark = get_spark(
        "bigcorpus", master=f"local[{CPUS}]", shuffle_partitions=32
    )
    if not os.path.exists(DOCS_PATH):
        synthetic_documents(spark, N).write.parquet(DOCS_PATH)
    if not os.path.exists(EMB_PATH):
        clustered_embeddings(
            spark, N, dim=DIM, n_clusters=max(50, N // 2000)
        ).write.parquet(EMB_PATH)
    docs = spark.read.parquet(DOCS_PATH)
    emb = spark.read.parquet(EMB_PATH)

    queries = {
        "dedup_exact": lambda: exact_dedup(docs),
        "dedup_lsh_pairs": lambda: lsh_candidate_pairs(docs),
        "dedup_lsh_verified": lambda: ngram_jaccard_pairs(
            docs, threshold=0.3, candidates=lsh_candidate_pairs(docs)
        ),
        "ann_lsh": lambda: ann_lsh_topk(
            emb, queries_max_id=200, corpus_max_id=N, k=5,
            n_planes=14, n_tables=8, dim=DIM,
        ),
        "ann_ivf": lambda: ann_ivf_topk(
            emb, queries_max_id=200, corpus_max_id=N, k=5,
            centroid_mod=1024, n_probe=8,
        ),
    }
    results = {}
    print(f"| query | best wall | rows out | docs-of-work/s |")
    print(f"|---|---|---|---|")
    for name, build in queries.items():
        walls, rows = [], 0
        for _ in range(3):  # first run is the warm-up
            t0 = time.time()
            rows = build().count()
            walls.append(time.time() - t0)
        best = min(walls[1:])
        results[name] = {"sec": round(best, 2), "rows": rows,
                         "walls": [round(w, 2) for w in walls]}
        print(f"| {name} | {best:.1f}s | {rows:,} | {N / best:,.0f} |",
              flush=True)

    # ---- IVF build/probe amortization (VERDICT r04 next-round #5):
    # the one-shot ann_ivf wall above is dominated by the index build;
    # a deployment builds ONCE (persisted, partitioned by list_id so a
    # probe prunes partitions) and pays only the probe per query batch.
    from lyrics_crawler_spark.operators.similarity import (
        ann_ivf_probe, build_ivf_index,
    )

    idx = f"/tmp/lcs_big_ivf_{N}"
    walls = []
    for _ in range(2):  # warm + measured
        t0 = time.time()
        cents, lists = build_ivf_index(emb, N, centroid_mod=1024)
        cents.write.mode("overwrite").parquet(idx + "/cents")
        lists.repartition("list_id").write.mode("overwrite").partitionBy(
            "list_id"
        ).parquet(idx + "/lists")
        walls.append(time.time() - t0)
    results["ann_ivf_build_persist"] = {
        "sec": round(walls[-1], 2), "rows": N,
        "walls": [round(w, 2) for w in walls],
    }
    print(f"| ann_ivf_build_persist | {walls[-1]:.1f}s | {N:,} | "
          f"{N / walls[-1]:,.0f} |", flush=True)

    cents_r = spark.read.parquet(idx + "/cents")
    lists_r = spark.read.parquet(idx + "/lists")
    walls, rows = [], 0
    for _ in range(3):
        t0 = time.time()
        rows = ann_ivf_probe(
            cents_r, lists_r, emb, queries_max_id=200, k=5, n_probe=8
        ).count()
        walls.append(time.time() - t0)
    best = min(walls[1:])
    results["ann_ivf_probe_only"] = {"sec": round(best, 2), "rows": rows,
                                     "walls": [round(w, 2) for w in walls]}
    print(f"| ann_ivf_probe_only | {best:.1f}s | {rows:,} | {N / best:,.0f} |",
          flush=True)
    print(json.dumps({
        "n_docs": N, "cpus": CPUS, "dim": DIM,
        "loadavg": os.getloadavg(), "results": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
