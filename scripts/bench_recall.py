"""ANN recall measurement (VERDICT r02 #3): recall@k of the LSH-bucketed
ANN path (`ann_lsh_topk`) and pair recall of `cosine_neardup_pairs`
against exact brute-force ground truth at sf0.1, over the
(n_planes, n_tables) grid — single-table recall is bounded by s^b (s =
1 - θ/π), multi-table lifts it to 1-(1-s^b)^L.

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
        lsh_ann_buckets,
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
    all_pairs = n_corpus * (n_corpus - 1)

    print(f"corpus={n_corpus} queries={N_QUERIES} k={K} (sf dir {SF})")
    print(f"brute-force candidate volume (ordered pairs): {all_pairs:,}\n")
    print("| n_planes | n_tables | recall@5 | candidates vs brute | wall |")
    print("|---|---|---|---|---|")
    for n_planes, n_tables in [
        (8, 1), (6, 1), (4, 1),
        (8, 4), (6, 4), (4, 4),
        (8, 8), (6, 8), (4, 8), (3, 8), (4, 12), (4, 16),
    ]:
        t0 = time.time()
        approx = ann_lsh_topk(
            emb, N_QUERIES, corpus_max, k=K,
            n_planes=n_planes, n_tables=n_tables,
        ).select("query_id", "neighbor_id")
        hit = truth.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        # candidate volume = deduped same-bucket corpus pairs across tables
        cand = None
        for t in range(n_tables):
            bk = lsh_ann_buckets(
                emb.where(F.col("vec_id") < corpus_max), n_planes, table=t
            )
            p = (
                bk.selectExpr("vec_id as a", "bucket")
                .join(bk.selectExpr("vec_id as b", "bucket"), "bucket")
                .where("a <> b")
                .select("a", "b")
            )
            cand = p if cand is None else cand.unionByName(p)
        n_cand = cand.distinct().count()
        dt = time.time() - t0
        print(
            f"| {n_planes} | {n_tables} | {hit / n_truth:.3f} "
            f"| {n_cand:,} ({n_cand / all_pairs:.1%}) | {dt:.1f}s |"
        )

    # IVF-flat variant (T18): hash-sampled centroids, nearest-centroid
    # inverted lists, n_probe lists per query (BENCH.md §ANN recall)
    from lyrics_crawler_spark.operators.similarity import ann_ivf_topk

    print("\n| centroid_mod | n_probe | IVF recall@5 | wall |")
    print("|---|---|---|---|")
    # (16, 4) is the ann_ivf entry query's own operating point — the
    # shipped configuration must appear in the reproducible grid
    # (ADVICE r03).
    for mod, probe in [(16, 4), (16, 8), (32, 4), (32, 8), (64, 8), (64, 16)]:
        t0 = time.time()
        approx = ann_ivf_topk(
            emb, N_QUERIES, corpus_max, k=K, centroid_mod=mod, n_probe=probe
        ).select("query_id", "neighbor_id")
        hit = truth.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        print(f"| {mod} | {probe} | {hit / n_truth:.3f} | {time.time() - t0:.1f}s |")

    # near-dup recall at the entry query's threshold (cos >= 0.4 — this
    # synthetic corpus has no pairs above ~0.6, see BENCH.md)
    exact_pairs = cosine_neardup_pairs(
        emb, max_id=corpus_max, threshold_m=400, exact=True
    ).select("id_a", "id_b")
    exact_pairs.cache()
    n_exact = exact_pairs.count()
    print(f"\nnear-dup ground truth pairs (cos>=0.4, exact all-pairs): {n_exact}")
    print("| n_planes | n_tables | near-dup pair recall |")
    print("|---|---|---|")
    for n_planes, n_tables in [(8, 1), (4, 4), (4, 8), (3, 8), (4, 16), (2, 8)]:
        got = cosine_neardup_pairs(
            emb, threshold_m=400, n_planes=n_planes, n_tables=n_tables
        ).select("id_a", "id_b")
        hit = exact_pairs.join(got, ["id_a", "id_b"], "left_semi").count()
        print(f"| {n_planes} | {n_tables} | {hit / max(n_exact, 1):.3f} |")
    spark.stop()


if __name__ == "__main__":
    main()
