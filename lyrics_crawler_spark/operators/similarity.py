"""Embedding similarity search (ANN) over an ``array<float>`` column.

Two paths:
- brute-force top-k — the correctness baseline. Embeddings are quantized
  to integers (round(x·1000)) so the dot product is *exact integer*
  arithmetic: order-independent, identical in Spark and DuckDB (float
  sums are not associative and would break value-hash parity).
- LSH-bucketed variant (random-hyperplane signs over the quantized
  vector) — the scale path: candidates come from an equi-join on the
  bucket key, turning O(n²) into O(n·bucket); ``ann_lsh_topk`` reranks
  exactly inside buckets, ``cosine_neardup_pairs`` thresholds cosine
  for embedding-level near-duplicate detection.

Dot products use ``F.zip_with`` + ``F.aggregate`` — pure Catalyst,
no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1000


def quantized(df: DataFrame, vec_col: str = "embedding", key_col: str = "vec_id") -> DataFrame:
    return df.select(
        key_col,
        # cast to double BEFORE the multiply: float32 arithmetic would
        # differ from DuckDB's promotion rules
        F.expr(
            f"transform({vec_col}, x -> cast(round(cast(x as double) * {QUANT}.0) as bigint))"
        ).alias("q"),
    ).withColumn(
        "norm2", F.expr("aggregate(q, cast(0 as bigint), (acc, x) -> acc + x * x)")
    )


def brute_force_topk(
    df: DataFrame, queries_max_id: int, corpus_max_id: int, k: int = 5,
    vec_col: str = "embedding", key_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine over quantized vectors. Score is the integer
    dot; cosine (rounded to 6 dp from exact ints) is also returned."""
    q = quantized(df.where(F.col(key_col) < queries_max_id), vec_col, key_col)
    c = quantized(df.where(F.col(key_col) < corpus_max_id), vec_col, key_col)
    qa = q.select(
        F.col(key_col).alias("query_id"), F.col("q").alias("qv"), F.col("norm2").alias("qn")
    )
    ca = c.select(
        F.col(key_col).alias("neighbor_id"), F.col("q").alias("cv"), F.col("norm2").alias("cn")
    )
    pairs = qa.crossJoin(F.broadcast(ca)).where(F.col("query_id") != F.col("neighbor_id"))
    # score ~ cosine ordering, engine-portable: qn is constant per query,
    # so cos_a > cos_b ⇔ dot_a·|dot_a|/cn_a > dot_b·|dot_b|/cn_b. The
    # numerator is exact int64 (|dot| ≤ dim·10^6 → square < 2^63); one
    # IEEE double division gives bit-identical doubles on any engine.
    scored = pairs.withColumn(
        "dot",
        F.expr("aggregate(zip_with(qv, cv, (a, b) -> a * b), cast(0 as bigint), (acc, x) -> acc + x)"),
    ).withColumn(
        "score", (F.col("dot") * F.abs(F.col("dot"))).cast("double") / F.col("cn")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot")
    )


def cosine_neardup_pairs(
    df: DataFrame, max_id: int | None = None, threshold_m: int = 800,
    vec_col: str = "embedding", key_col: str = "vec_id",
    exact: bool = False, n_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup: unordered pairs with cosine ≥
    threshold_m/1000. cos_m = floor(1000·dot/sqrt(na2·nb2)) is
    engine-portable: the integer inputs are exact as doubles
    (dot < 2^53, na2·nb2 < 2^53) and sqrt/division are correctly
    rounded IEEE in both Spark and DuckDB.

    The DEFAULT path is LSH-bucketed (the 100 TB scale path): both sides
    route through :func:`lsh_ann_buckets` and only same-bucket pairs are
    compared — a shuffled equi-join, never a cross join, so the work is
    O(n · bucket) instead of O(n²). Each vector has exactly one bucket,
    so pairs emerge once (no dedup pass needed). Recall is tuned by
    ``n_planes`` (fewer planes → bigger buckets → higher recall).

    ``exact=True`` is the all-pairs correctness mode for oracle-capped
    runs: it REQUIRES ``max_id`` (refuses to run unbounded — a broadcast
    nested-loop over n²/2 pairs must never reach a production path)."""
    scope = df if max_id is None else df.where(F.col(key_col) < max_id)
    z = quantized(scope, vec_col, key_col)
    if exact:
        if max_id is None:
            raise ValueError("exact=True requires max_id (all-pairs mode is oracle-only)")
        a = z.select(
            F.col(key_col).alias("id_a"), F.col("q").alias("qa"), F.col("norm2").alias("na2")
        )
        b = z.select(
            F.col(key_col).alias("id_b"), F.col("q").alias("qb"), F.col("norm2").alias("nb2")
        )
        pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    else:
        zb = z.join(lsh_ann_buckets(scope, n_planes, vec_col, key_col), key_col)
        a = zb.select(
            F.col(key_col).alias("id_a"), F.col("q").alias("qa"),
            F.col("norm2").alias("na2"), "bucket",
        )
        b = zb.select(
            F.col(key_col).alias("id_b"), F.col("q").alias("qb"),
            F.col("norm2").alias("nb2"), "bucket",
        )
        pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs
        .withColumn(
            "dot",
            F.expr(
                "aggregate(zip_with(qa, qb, (x, y) -> x * y), "
                "cast(0 as bigint), (acc, x) -> acc + x)"
            ),
        )
        .withColumn(
            "cos_m",
            F.floor(
                F.lit(1000.0) * F.col("dot").cast("double")
                / F.sqrt((F.col("na2") * F.col("nb2")).cast("double"))
            ).cast("bigint"),
        )
        .where(F.col("cos_m") >= threshold_m)
        .select("id_a", "id_b", "dot", "cos_m")
    )


def ann_lsh_topk(
    df: DataFrame, queries_max_id: int, corpus_max_id: int, k: int = 5,
    n_planes: int = 8, vec_col: str = "embedding", key_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket (equi-join), then
    exact integer rerank inside the bucket. At 100 TB the bucket join
    replaces brute-force's crossJoin; recall is tuned by n_planes (and by
    multi-probe / repeated tables — out of scope here)."""
    scope = df.where(F.col(key_col) < corpus_max_id)
    z = quantized(scope, vec_col, key_col)
    bk = lsh_ann_buckets(scope, n_planes, vec_col, key_col)
    zb = z.join(bk, key_col)
    qa = zb.where(F.col(key_col) < queries_max_id).select(
        F.col(key_col).alias("query_id"), F.col("q").alias("qv"), "bucket"
    )
    ca = zb.select(
        F.col(key_col).alias("neighbor_id"), F.col("q").alias("cv"),
        F.col("norm2").alias("cn"), "bucket",
    )
    pairs = qa.join(ca, "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "dot",
        F.expr(
            "aggregate(zip_with(qv, cv, (a, b) -> a * b), "
            "cast(0 as bigint), (acc, x) -> acc + x)"
        ),
    ).withColumn(
        "score", (F.col("dot") * F.abs(F.col("dot"))).cast("double") / F.col("cn")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot")
    )


def lsh_ann_buckets(
    df: DataFrame, n_planes: int = 8, vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Sign-random-projection buckets: plane p weights dims with ±1 by a
    deterministic parity of (p, dim); bucket = the sign bit-string. ANN
    candidates = equal buckets (equi-join — the scale path)."""
    q = quantized(df, vec_col, key_col)
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))
    return q.select(
        key_col,
        F.expr(
            f"""
            concat_ws('', transform(sequence(0, {n_planes - 1}), p ->
              case when aggregate(
                zip_with(q, sequence(0, size(q) - 1),
                         (x, i) -> case when (i * 2654435761 + p * 40503) % 4 < 2
                                   then x else -x end),
                cast(0 as bigint), (acc, x) -> acc + x) >= 0
              then '1' else '0' end))
            """
        ).alias("bucket"),
    )
