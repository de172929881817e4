"""ANN recall measurement (VERDICT r01 #9): recall@k of the LSH-bucketed
ANN path (`ann_lsh_topk`) and of the bucketed near-dup path
(`cosine_neardup_pairs`) against exact brute-force ground truth, at
sf0.1, for several n_planes settings (fewer planes = bigger buckets =
higher recall, more compares).

Prints a markdown table to stdout; paste/commit into BENCH.md.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/bench_recall.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 5
N_QUERIES = 200


def main() -> None:
    from pyspark.sql import functions as F

    from lyrics_crawler_spark.operators.similarity import (
        ann_lsh_topk,
        brute_force_topk,
        cosine_neardup_pairs,
    )
    from lyrics_crawler_spark.session import get_spark

    spark = get_spark("recall", master="local[16]", shuffle_partitions=32)
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    n_corpus = emb.count()
    corpus_max = int(emb.agg(F.max("vec_id")).first()[0]) + 1

    truth = brute_force_topk(emb, N_QUERIES, corpus_max, k=K).select(
        "query_id", "neighbor_id"
    )
    truth.cache()
    n_truth = truth.count()

    print(f"corpus={n_corpus} queries={N_QUERIES} k={K} (sf dir {SF})\n")
    print("| n_planes | recall@5 | candidate pairs | wall |")
    print("|---|---|---|---|")
    rows = []
    for n_planes in (4, 6, 8, 10):
        t0 = time.time()
        approx = ann_lsh_topk(
            emb, N_QUERIES, corpus_max, k=K, n_planes=n_planes
        ).select("query_id", "neighbor_id")
        hit = truth.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        # candidate volume = same-bucket corpus pairs the rerank scored
        from lyrics_crawler_spark.operators.similarity import lsh_ann_buckets

        bk = lsh_ann_buckets(emb.where(F.col("vec_id") < corpus_max), n_planes)
        cand = (
            bk.groupBy("bucket")
            .count()
            .agg(F.sum(F.col("count") * (F.col("count") - 1)).alias("p"))
            .first()["p"]
        )
        dt = time.time() - t0
        recall = hit / n_truth
        rows.append((n_planes, recall))
        print(f"| {n_planes} | {recall:.3f} | {cand:,} | {dt:.1f}s |")

    # near-dup recall: bucketed pairs vs exact all-pairs at threshold
    exact_pairs = cosine_neardup_pairs(
        emb, max_id=corpus_max, threshold_m=800, exact=True
    ).select("id_a", "id_b")
    n_exact = exact_pairs.count()
    print(f"\nnear-dup ground truth pairs (cos>=0.8, exact all-pairs): {n_exact}")
    print("| n_planes | near-dup pair recall |")
    print("|---|---|")
    for n_planes in (4, 6, 8):
        got = cosine_neardup_pairs(emb, threshold_m=800, n_planes=n_planes).select(
            "id_a", "id_b"
        )
        hit = exact_pairs.join(got, ["id_a", "id_b"], "left_semi").count()
        print(f"| {n_planes} | {hit / max(n_exact, 1):.3f} |")
    spark.stop()


if __name__ == "__main__":
    main()
