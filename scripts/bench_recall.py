"""ANN recall measurement (VERDICT r02 #3, r03 #4): recall@k of the
LSH-bucketed ANN path (`ann_lsh_topk`) and the IVF-flat path
(`ann_ivf_topk`), plus pair recall of `cosine_neardup_pairs`, against
exact brute-force ground truth — in BOTH corpus regimes:

- isotropic: the driver testdata embeddings (near-isotropic gaussian,
  ANN's documented worst case — neighbors at cos 0.3-0.5);
- clustered: sitegen.embeddings.clustered_embeddings (mixture of
  gaussians, intra-cluster cos ~= 0.8 — the regime real embedding
  corpora live in and partitioning ANN is designed for).

Single-table LSH recall is bounded by s^b (s = 1 - theta/pi);
multi-table lifts it to 1-(1-s^b)^L. IVF recall in the clustered regime
is what justifies the shipped `ann_ivf` defaults.

Prints markdown tables to stdout; paste/commit into BENCH.md.

Usage:
  python scripts/bench_recall.py              # both regimes
  python scripts/bench_recall.py isotropic    # testdata corpus only
  python scripts/bench_recall.py clustered    # clustered corpus only
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 5
N_QUERIES = 200
N_CLUSTERED = 2000
DIM = 64
N_CLUSTERS = 50


def run_grids(spark, emb, tag: str, neardup_thresholds: list[int]) -> None:
    from pyspark.sql import functions as F

    from lyrics_crawler_spark.operators.similarity import (
        ann_ivf_topk,
        ann_lsh_topk,
        brute_force_topk,
        cosine_neardup_pairs,
        lsh_ann_buckets,
    )

    n_corpus = emb.count()
    corpus_max = int(emb.agg(F.max("vec_id")).first()[0]) + 1

    truth = brute_force_topk(emb, N_QUERIES, corpus_max, k=K).select(
        "query_id", "neighbor_id"
    )
    truth.cache()
    n_truth = truth.count()
    all_pairs = n_corpus * (n_corpus - 1)

    print(f"\n## {tag}: corpus={n_corpus} queries={N_QUERIES} k={K}")
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
            n_planes=n_planes, n_tables=n_tables, dim=DIM,
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
    # inverted lists, n_probe lists per query (BENCH.md "ANN recall").
    # Candidate volume per query ~= n_corpus * n_probe / n_lists.
    print("\n| centroid_mod | n_probe | IVF recall@5 | wall |")
    print("|---|---|---|---|")
    for mod, probe in [
        (16, 4), (16, 8), (32, 2), (32, 4), (32, 8), (64, 8), (64, 16),
    ]:
        t0 = time.time()
        approx = ann_ivf_topk(
            emb, N_QUERIES, corpus_max, k=K, centroid_mod=mod, n_probe=probe
        ).select("query_id", "neighbor_id")
        hit = truth.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        print(f"| {mod} | {probe} | {hit / n_truth:.3f} | {time.time() - t0:.1f}s |")
    truth.unpersist()

    # near-dup pair recall at each regime's relevant threshold(s):
    # isotropic has no pairs above cos ~0.6 (entry query probes 0.4);
    # clustered is T12's DESIGN POINT — cos>=0.8 intra-cluster pairs
    # exist, so the shipped (6,12) default finally gets a measured
    # number instead of an analytic estimate.
    for thr_m in neardup_thresholds:
        exact_pairs = cosine_neardup_pairs(
            emb, max_id=corpus_max, threshold_m=thr_m, exact=True
        ).select("id_a", "id_b")
        exact_pairs.cache()
        n_exact = exact_pairs.count()
        print(
            f"\nnear-dup ground truth pairs (cos>={thr_m / 1000}, exact): {n_exact}"
        )
        print("| n_planes | n_tables | near-dup pair recall |")
        print("|---|---|---|")
        for n_planes, n_tables in [
            (8, 1), (4, 4), (4, 8), (3, 8), (4, 16), (2, 8), (6, 12),
        ]:
            got = cosine_neardup_pairs(
                emb, threshold_m=thr_m, n_planes=n_planes,
                n_tables=n_tables, dim=DIM,
            ).select("id_a", "id_b")
            hit = exact_pairs.join(got, ["id_a", "id_b"], "left_semi").count()
            print(f"| {n_planes} | {n_tables} | {hit / max(n_exact, 1):.3f} |")
        exact_pairs.unpersist()


def main() -> None:
    from lyrics_crawler_spark.session import get_spark
    from lyrics_crawler_spark.sitegen.embeddings import (
        clustered_embeddings,
        corpus_geometry,
    )

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    spark = get_spark("recall", master="local[16]", shuffle_partitions=32)

    if which in ("both", "isotropic"):
        emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        run_grids(spark, emb, f"isotropic (testdata {SF})", [400])

    if which in ("both", "clustered"):
        emb = clustered_embeddings(
            spark, N_CLUSTERED, dim=DIM, n_clusters=N_CLUSTERS, intra_cos=0.8
        )
        # materialize once so every grid point reads parquet, same as the
        # isotropic corpus (generation cost out of the measured walls)
        path = "/tmp/lcs_clustered_emb"
        emb.write.mode("overwrite").parquet(path)
        emb = spark.read.parquet(path)
        geo = corpus_geometry(emb, N_CLUSTERS)
        print(
            f"\nclustered corpus: n={N_CLUSTERED} dim={DIM} "
            f"clusters={N_CLUSTERS}; measured mean intra-cluster cos "
            f"{geo['intra_cos']:.3f}, inter {geo['inter_cos']:.3f}"
        )
        run_grids(spark, emb, "clustered (mixture-of-gaussians)", [800])

    spark.stop()


if __name__ == "__main__":
    main()
