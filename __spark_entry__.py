"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator inventory (SURVEY.md §2) as
(spark, sf_dir) callables over the driver-provided parquet tables, each
paired with a DuckDB-equivalent ``oracle_sql()`` statement. Every
computed column is integer-exact or hash-portable (md5) so value-hash
comparison is engine-independent. Crawl-engine queries (the wave loop
itself is not SQL-expressible) are checked against materialized dumps of
the pure-Python reference replay (``oracle_dumps/*.parquet``, regenerated
by ``scripts/dump_crawl_oracle.py``); their exact golden verification
additionally lives in tests/ (`python -m pytest -x -q`).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lyrics_crawler_spark.functions.hashing import duckdb_hash64
from lyrics_crawler_spark.functions.textanalysis import (
    EN_STOPWORDS,
    fingerprint,
    repetition_ratio,
    text_features,
)
from lyrics_crawler_spark.operators.clusters import dedup_clusters as cluster_assign
from lyrics_crawler_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    brute_force_topk,
    cosine_neardup_pairs,
)
from lyrics_crawler_spark.operators.textdedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    tokens_expr,
)

# ---------------------------------------------------------------------------
# helpers


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_CRAWL_CACHE: dict[str, object] = {}


def _crawl_engine(spark: SparkSession):
    """Memoized tiny end-to-end crawl (all five dialects, robots, dups,
    errors) used by the rows-only crawl queries."""
    if "engine" not in _CRAWL_CACHE:
        from lyrics_crawler_spark.engine import CrawlEngine
        from lyrics_crawler_spark.sitegen.graph import default_specs

        d = tempfile.mkdtemp(prefix="lcs_entry_")
        eng = CrawlEngine(spark, default_specs(seed=123), d)
        eng.run(max_waves=200)
        _CRAWL_CACHE["engine"] = eng
    return _CRAWL_CACHE["engine"]


# ---------------------------------------------------------------------------
# flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the training-data document pipeline at sf0.001 —
    features + language guess + quality + fingerprint + exact-dedup keep
    flag, one row per document."""
    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    feats = text_features(docs)
    fp = fingerprint(docs)
    keep = exact_dedup(docs).select(
        F.col("keep_id").alias("doc_id"), F.lit(True).alias("is_canonical")
    )
    return (
        docs.select("doc_id", "lang", "source")
        .join(feats, "doc_id")
        .join(fp, "doc_id")
        .join(keep, "doc_id", "left")
        .withColumn("is_canonical", F.coalesce("is_canonical", F.lit(False)))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- frontier / scheduling operators (R1, F1, F6, politeness) ---

    def topk_per_type(spark, sf):  # politeness top-k per host (R2/§2.9)
        ev = _t(spark, sf, "events")
        w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
        return (
            ev.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 3)
            .select("event_type", "event_id", "value", "rk")
        )

    q["topk_per_type"] = topk_per_type

    def lifo_order(spark, sf):  # F1/R1 LIFO wave selection
        o = _t(spark, sf, "orders")
        # distributed top-k (TakeOrdered — per-partition heaps, no
        # single-partition window shuffle); the rank window then runs
        # over just the k surviving rows.
        top = o.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey")).limit(20)
        w = Window.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        return top.withColumn("seq", F.row_number().over(w)).select(
            "o_orderkey", "seq"
        )

    q["lifo_order"] = lifo_order

    def retry_budget(spark, sf):  # F6 error-budget filter + counts
        li = _t(spark, sf, "lineitem")
        return (
            li.where(F.col("l_linenumber") < 4)
            .groupBy(F.col("l_returnflag").alias("flag"))
            .agg(F.count("*").alias("n_ok"))
        )

    q["retry_budget"] = retry_budget

    # --- dedup / membership (D1, D2, A1) ---

    def anti_join_unseen(spark, sf):  # D1 left_anti dedup
        # The seen side is restricted to status-'P' orders so the result
        # is non-vacuous at every sf (the full orders table covers every
        # customer at sf>=0.001, which made this check pass on 0 == 0
        # rows — the vacuous-oracle gotcha in the verify skill). Mirrors
        # D1's real shape anyway: the URL-seen anti-join probes the
        # SETTLED partition of the log, not every row ever staged.
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders").where(F.col("o_orderstatus") == "P")
        return c.join(
            o, c["c_custkey"] == o["o_custkey"], "left_anti"
        ).select("c_custkey", "c_name")

    q["anti_join_unseen"] = anti_join_unseen

    def group_counts(spark, sf):  # A1 per-movie counts analog
        o = _t(spark, sf, "orders")
        return o.groupBy(F.col("o_custkey").alias("cust")).agg(
            F.count("*").alias("n_orders")
        )

    q["group_counts"] = group_counts

    def no_new_skip(spark, sf):  # D2 count-equality skip predicate
        o = _t(spark, sf, "orders")
        return (
            o.groupBy(F.col("o_custkey").alias("cust"))
            .agg(F.count("*").alias("n_orders"))
            .where(F.col("n_orders") == 1)
        )

    q["no_new_skip"] = no_new_skip

    def first_seen(spark, sf):  # seen-set first visit
        ev = _t(spark, sf, "events")
        return ev.groupBy("user_id").agg(
            F.min(F.unix_timestamp("ts")).alias("first_ts_s"),
            F.count("*").alias("n_events"),
        )

    q["first_seen"] = first_seen

    def upsert_last_wins(spark, sf):  # O1 MERGE last-writer-wins
        ev = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        return (
            ev.withColumn("rk", F.row_number().over(w))
            .where("rk = 1")
            .select(
                "user_id",
                F.col("event_id").alias("last_event_id"),
                F.unix_timestamp("ts").alias("last_ts_s"),
            )
        )

    q["upsert_last_wins"] = upsert_last_wins

    # --- fan-out (X1-X6) ---

    def explode_tokens(spark, sf):
        d = _t(spark, sf, "documents")
        counts = (
            d.select(F.explode(F.expr(tokens_expr("text"))).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias("n"))
        )
        # distributed top-k first (TakeOrdered), then rank the k rows —
        # never a global window over the full token vocabulary.
        top = counts.orderBy(F.desc("n"), F.asc("token")).limit(100)
        w = Window.orderBy(F.desc("n"), F.asc("token"))
        return top.withColumn("rk", F.row_number().over(w))

    q["explode_tokens"] = explode_tokens

    # --- training-data dedup family ---

    def dedup_exact(spark, sf):
        return exact_dedup(_t(spark, sf, "documents"))

    q["dedup_exact"] = dedup_exact

    def dedup_minhash(spark, sf):
        d = _t(spark, sf, "documents").where("doc_id < 100")
        return minhash_signatures(d)

    q["dedup_minhash"] = dedup_minhash

    def dedup_simhash(spark, sf):
        d = _t(spark, sf, "documents").where("doc_id < 100")
        return simhash(d)

    q["dedup_simhash"] = dedup_simhash

    def dedup_lsh_pairs(spark, sf):  # MinHash+LSH band-bucket join
        d = _t(spark, sf, "documents")
        return lsh_candidate_pairs(d, max_id=200)

    q["dedup_lsh_pairs"] = dedup_lsh_pairs

    def dedup_jaccard(spark, sf):
        d = _t(spark, sf, "documents")
        # max_id=500 covers the whole documents table at sf<=0.01: 28
        # pairs at sf0.001 / 25 at sf0.01 (was 7/1 at max_id=150 — a
        # one-row value-hash proves little). Verified flat-cost at
        # sf0.1 (~1 s warm; the id bound keeps the shingle join small).
        return ngram_jaccard_pairs(d, threshold=0.3, max_id=500)

    q["dedup_jaccard"] = dedup_jaccard

    def dedup_lsh_verified(spark, sf):  # LSH candidates → exact Jaccard verify
        d = _t(spark, sf, "documents")
        cands = lsh_candidate_pairs(d, max_id=200)
        return ngram_jaccard_pairs(
            d, threshold=0.3, max_id=200, candidates=cands
        )

    q["dedup_lsh_verified"] = dedup_lsh_verified

    def dedup_clusters(spark, sf):  # pairs → connected components → keeper
        d = _t(spark, sf, "documents")
        return cluster_assign(lsh_candidate_pairs(d, max_id=200))

    q["dedup_clusters"] = dedup_clusters

    def repetition(spark, sf):  # Gopher-style duplicate-shingle fraction
        return repetition_ratio(_t(spark, sf, "documents"))

    q["repetition"] = repetition

    def fingerprints(spark, sf):
        return fingerprint(_t(spark, sf, "documents").where("doc_id < 200"))

    q["fingerprints"] = fingerprints

    # --- similarity search ---

    def cosine_topk(spark, sf):
        e = _t(spark, sf, "embeddings")
        return brute_force_topk(e, queries_max_id=10, corpus_max_id=300, k=5)

    q["cosine_topk"] = cosine_topk

    def ann_lsh(spark, sf):  # LSH-bucketed ANN: the scale path
        # defaults (n_planes=4, n_tables=16): measured recall@5 = 0.926
        # on the isotropic testdata corpus, 1.000 on the clustered
        # corpus (BENCH.md §ANN recall, both regimes)
        e = _t(spark, sf, "embeddings")
        return ann_lsh_topk(e, queries_max_id=10, corpus_max_id=300, k=5, dim=64)

    q["ann_lsh"] = ann_lsh

    def ann_ivf(spark, sf):  # IVF-flat ANN: the partition-pruning scale path
        # (centroid_mod=16, n_probe=4): measured recall@5 = 0.949 on the
        # clustered corpus IVF is designed for (~3% of brute-force
        # candidate volume); 0.245 on the near-isotropic testdata worst
        # case (BENCH.md §ANN recall, both regimes).
        e = _t(spark, sf, "embeddings")
        return ann_ivf_topk(
            e, queries_max_id=10, corpus_max_id=300, k=5,
            centroid_mod=16, n_probe=4,
        )

    q["ann_ivf"] = ann_ivf

    def embedding_neardup(spark, sf):  # cosine near-dup pairs (exact, capped)
        e = _t(spark, sf, "embeddings")
        return cosine_neardup_pairs(e, max_id=300, threshold_m=400, exact=True)

    q["embedding_neardup"] = embedding_neardup

    def embedding_neardup_lsh(spark, sf):  # LSH-bucketed near-dup: scale path
        # (n_planes=2, n_tables=8) tuned for this query's loose cos>=0.4
        # threshold: measured pair recall 0.988 at sf0.1 (BENCH.md)
        e = _t(spark, sf, "embeddings")
        return cosine_neardup_pairs(
            e, max_id=300, threshold_m=400, n_planes=2, n_tables=8, dim=64
        )

    q["embedding_neardup_lsh"] = embedding_neardup_lsh

    # --- text analysis ---

    def langid(spark, sf):
        d = _t(spark, sf, "documents")
        return text_features(d).select(
            "doc_id", "n_tokens", "n_stop", "stop_ratio_m", "lang_guess"
        )

    q["langid"] = langid

    def quality(spark, sf):
        d = _t(spark, sf, "documents")
        return text_features(d).select(
            "doc_id", "n_chars", "n_tokens", "n_punct", "tok_chars",
            "punct_ratio_m", "mean_tok_len_m", "quality_m",
        )

    q["quality"] = quality

    def token_stats(spark, sf):
        d = _t(spark, sf, "documents")
        return (
            d.selectExpr("source", f"size({tokens_expr('text')}) as n_tok")
            .groupBy("source")
            .agg(
                F.sum("n_tok").alias("total_tokens"),
                F.count("*").alias("n_docs"),
            )
        )

    q["token_stats"] = token_stats

    # --- crawl engine: checked against materialized reference-oracle
    # dumps (oracle_dumps/*.parquet, regenerated by
    # scripts/dump_crawl_oracle.py — a pure-Python LifoQueue replay of
    # the reference algorithm, no Spark). The driver's DuckDB side reads
    # the dump; the Spark side runs the live engine. Exact golden
    # verification ALSO runs in pytest; this closes the independent
    # driver loop (VERDICT r02 missing #4). ---

    def crawl_trace(spark, sf):
        return _crawl_engine(spark).trace().select(
            "site", "url", "task_type", "action", "n_errors", "seq"
        )

    q["crawl_trace"] = crawl_trace

    def crawl_documents_spans(spark, sf):
        eng = _crawl_engine(spark)
        return eng.documents().select(
            "start_url", "song_url",
            F.posexplode("spans").alias("pos", "span"),
        ).select(
            "start_url", "song_url", "pos",
            F.col("span.kind").alias("kind"),
            # nullable text/media_ref -> '' on both sides (dump does the
            # same) so value normalization can't diverge on None vs NaN
            F.coalesce(F.col("span.text"), F.lit("")).alias("text"),
            F.coalesce(F.col("span.media_ref"), F.lit("")).alias("media_ref"),
            F.col("span.offset").alias("offset"),
        )

    q["crawl_documents_spans"] = crawl_documents_spans

    def crawl_media_features(spark, sf):
        from lyrics_crawler_spark.operators.multimodal import (
            extract_features,
            fetch_payload,
            media_from_documents,
        )

        eng = _crawl_engine(spark)
        media = media_from_documents(eng.documents())
        feats = extract_features(fetch_payload(media))
        # exploded integer-ppm projection: the driver's canonicalizer
        # sorts every column, so the raw array<float> column (unhashable
        # in pandas) must not reach it. decode_features rounds to 6 dp,
        # so ppm values are exact integers.
        return feats.select(
            "media_ref", "kind", F.posexplode("feature").alias("bucket", "v")
        ).select(
            "media_ref", "kind", "bucket",
            F.round(F.col("v") * 1000000).cast("bigint").alias("value_ppm"),
        )

    q["crawl_media_features"] = crawl_media_features

    def crawl_media_decoded(spark, sf):
        """T13 decode proof: container metadata parsed out of the real
        BMP/WAV bytes, an md5 over the re-encoded nearest-neighbor
        resize (images) / the first real PCM frame slice (audio), and
        the decoded-duration frame count — all hash-checked against a
        pure-Python twin that shares only the per-payload codec
        functions (scripts/dump_crawl_oracle.py)."""
        from lyrics_crawler_spark.operators.multimodal import (
            fetch_payload,
            media_from_documents,
            resize_images,
            sample_frames,
        )

        eng = _crawl_engine(spark)
        payloads = fetch_payload(media_from_documents(eng.documents()))
        meta = payloads.select(
            "media_ref", "kind",
            F.coalesce("width", F.lit(-1)).alias("width"),
            F.coalesce("height", F.lit(-1)).alias("height"),
            F.coalesce("duration_ms", F.lit(-1)).alias("duration_ms"),
        )
        img_md5 = resize_images(payloads, target=24).select(
            "media_ref", F.md5("payload").alias("content_md5")
        )
        frames = sample_frames(payloads, every_ms=400, max_frames=6)
        n_frames = frames.groupBy("media_ref").agg(
            F.count("*").alias("n_frames")
        )
        aud_md5 = frames.where(F.col("frame_idx") == 0).select(
            "media_ref", F.md5("frame").alias("content_md5")
        )
        return (
            meta.join(img_md5.unionByName(aud_md5), "media_ref")
            .join(n_frames, "media_ref", "left")
            .withColumn("n_frames", F.coalesce("n_frames", F.lit(0)))
        )

    q["crawl_media_decoded"] = crawl_media_decoded

    def crawl_seen_set(spark, sf):
        return _crawl_engine(spark).seen().select(
            "start_url", "song_url", "doc_id"
        )

    q["crawl_seen_set"] = crawl_seen_set

    def crawl_dedup_clusters(spark, sf):
        """End-to-end training-data dedup over the CRAWL'S OWN output
        (VERDICT r03 task #7): documents() span text → MinHash+LSH
        candidates → exact n-gram Jaccard verify → connected components
        → keeper. Same operators as the parquet-fixture dedup queries,
        composed with the engine — proving the pipeline runs on crawl
        corpora, not just driver testdata. The verify threshold (40‰) is
        calibrated to this synthetic corpus: its two LSH candidate pairs
        sit at jaccard 32‰ and 48‰, so verify demonstrably FILTERS (one
        pair survives); the 300‰ default elsewhere targets real near-dup
        corpora. Doc key = start_url||song_url (full URL); doc text =
        the non-media, non-empty span texts in span order."""
        eng = _crawl_engine(spark)
        docs = eng.documents().select(
            F.concat("start_url", "song_url").alias("doc_id"),
            F.array_join(
                F.expr(
                    "transform(filter(spans, s -> s.kind <> 'media' "
                    "and coalesce(s.text, '') <> ''), s -> s.text)"
                ),
                " ",
            ).alias("text"),
        )
        cands = lsh_candidate_pairs(docs)
        verified = ngram_jaccard_pairs(docs, threshold=0.04, candidates=cands)
        return cluster_assign(verified)

    q["crawl_dedup_clusters"] = crawl_dedup_clusters

    return q


# ---------------------------------------------------------------------------
# DuckDB oracles


def _dd_buckets(n_planes: int, n_tables: int, dim: int = 64) -> list[str]:
    """DuckDB twins of lsh_ann_buckets: one bucket expression per LSH
    table, inlining the SAME ±1 plane literals the Spark operator uses
    (operators/similarity.py:plane_signs — single source of truth)."""
    from lyrics_crawler_spark.operators.similarity import plane_signs

    out = []
    for t in range(n_tables):
        bits = []
        for signs in plane_signs(n_planes, dim, t):
            lit = "[" + ",".join(str(s) for s in signs) + "]"
            bits.append(
                f"CASE WHEN list_sum(list_transform(range(1, {dim + 1}), "
                f"i -> q[i] * ({lit})[i])) >= 0 THEN '1' ELSE '0' END"
            )
        out.append("concat(" + ", ".join(bits) + ")")
    return out


def _dd_ann_lsh_sql(
    queries_max_id: int, corpus_max_id: int, k: int,
    n_planes: int, n_tables: int, dim: int = 64,
) -> str:
    buckets = _dd_buckets(n_planes, n_tables, dim)
    bcols = ",\n                 ".join(
        f"{b} AS b{t}" for t, b in enumerate(buckets)
    )
    cand = "\n              UNION\n".join(
        f"""              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
              FROM nz a JOIN nz b ON a.b{t} = b.b{t}
              WHERE a.vec_id < {queries_max_id} AND a.vec_id <> b.vec_id"""
        for t in range(n_tables)
    )
    return f"""
        WITH qz AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS q
          FROM embeddings WHERE vec_id < {corpus_max_id}
        ), nz AS (
          SELECT vec_id, q,
                 CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS norm2,
                 {bcols}
          FROM qz
        ), cand AS (
{cand}
        ), scored AS (
          SELECT c.query_id, c.neighbor_id,
                 CAST(list_sum(list_transform(range(1, {dim + 1}),
                      i -> qa.q[i] * qb.q[i])) AS BIGINT) AS dot,
                 qb.norm2 AS cn
          FROM cand c
          JOIN nz qa ON qa.vec_id = c.query_id
          JOIN nz qb ON qb.vec_id = c.neighbor_id
        ), ranked AS (
          SELECT query_id, neighbor_id, dot,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY CAST(dot * ABS(dot) AS DOUBLE) / cn DESC,
                            neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, neighbor_id, rank, dot FROM ranked WHERE rank <= {k}
    """


def _dd_neardup_lsh_sql(
    max_id: int, threshold_m: int, n_planes: int, n_tables: int, dim: int = 64,
) -> str:
    buckets = _dd_buckets(n_planes, n_tables, dim)
    bcols = ",\n                 ".join(
        f"{b} AS b{t}" for t, b in enumerate(buckets)
    )
    cand = "\n              UNION\n".join(
        f"""              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM nz a JOIN nz b ON a.b{t} = b.b{t} AND a.vec_id < b.vec_id"""
        for t in range(n_tables)
    )
    return f"""
        WITH qz AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS q
          FROM embeddings WHERE vec_id < {max_id}
        ), nz AS (
          SELECT vec_id, q,
                 CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS norm2,
                 {bcols}
          FROM qz
        ), cand AS (
{cand}
        ), scored AS (
          SELECT c.id_a, c.id_b,
                 CAST(list_sum(list_transform(range(1, {dim + 1}),
                      i -> a.q[i] * b.q[i])) AS BIGINT) AS dot,
                 a.norm2 AS na2, b.norm2 AS nb2
          FROM cand c
          JOIN nz a ON a.vec_id = c.id_a
          JOIN nz b ON b.vec_id = c.id_b
        )
        SELECT id_a, id_b, dot,
               CAST(FLOOR(1000.0 * CAST(dot AS DOUBLE)
                    / SQRT(CAST(na2 * nb2 AS DOUBLE))) AS BIGINT) AS cos_m
        FROM scored
        WHERE FLOOR(1000.0 * CAST(dot AS DOUBLE)
              / SQRT(CAST(na2 * nb2 AS DOUBLE))) >= {threshold_m}
    """


def _dd_ann_ivf_sql(
    queries_max_id: int, corpus_max_id: int, k: int,
    centroid_mod: int, n_probe: int, dim: int = 64,
) -> str:
    """DuckDB twin of ann_ivf_topk: identical hash-sampled centroid set,
    identical nearest-centroid assignment (same integer score + tie
    rule), identical probe + exact in-list rerank."""
    h = duckdb_hash64("cast(vec_id as varchar)")
    return f"""
        WITH qz AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS q
          FROM embeddings WHERE vec_id < {corpus_max_id}
        ), nz AS (
          SELECT vec_id, q,
                 CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS norm2
          FROM qz
        ), cents AS (
          SELECT vec_id AS centroid_id, q AS cvec, norm2 AS cn2
          FROM nz WHERE {h} % {centroid_mod} = 0
        ), nassign AS (
          SELECT n.vec_id, c.centroid_id,
                 CAST(list_sum(list_transform(range(1, {dim + 1}),
                      i -> n.q[i] * c.cvec[i])) AS BIGINT) AS cdot,
                 c.cn2
          FROM nz n, cents c
        ), nranked AS (
          SELECT vec_id, centroid_id,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY CAST(cdot * ABS(cdot) AS DOUBLE) / cn2 DESC,
                            centroid_id ASC) AS r
          FROM nassign
        ), lists AS (
          SELECT vec_id AS neighbor_id, centroid_id AS list_id
          FROM nranked WHERE r = 1
        ), probes AS (
          SELECT vec_id AS query_id, centroid_id AS list_id
          FROM nranked WHERE r <= {n_probe} AND vec_id < {queries_max_id}
        ), cand AS (
          SELECT p.query_id, l.neighbor_id
          FROM probes p JOIN lists l ON p.list_id = l.list_id
          WHERE p.query_id <> l.neighbor_id
        ), scored AS (
          SELECT c.query_id, c.neighbor_id,
                 CAST(list_sum(list_transform(range(1, {dim + 1}),
                      i -> a.q[i] * b.q[i])) AS BIGINT) AS dot,
                 b.norm2 AS cn
          FROM cand c
          JOIN nz a ON a.vec_id = c.query_id
          JOIN nz b ON b.vec_id = c.neighbor_id
        ), ranked AS (
          SELECT query_id, neighbor_id, dot,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY CAST(dot * ABS(dot) AS DOUBLE) / cn DESC,
                            neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, neighbor_id, rank, dot FROM ranked WHERE rank <= {k}
    """


def _dump(name: str) -> str:
    """Absolute path of a reference-oracle dump (committed parquet,
    regenerated by scripts/dump_crawl_oracle.py)."""
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "oracle_dumps",
        f"{name}.parquet",
    )


def _dd_tokens(col: str) -> str:
    return f"list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), x -> x <> '')"


def _dd_shingles_cte(where: str) -> str:
    toks = _dd_tokens("text")
    return f"""
    WITH t AS (
      SELECT doc_id, {toks} AS toks FROM documents {where}
    ), s AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 0 END + 1),
               i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shingle
      FROM t
    )"""


def oracle_sql() -> dict[str, str]:
    stops = ",".join(f"'{w}'" for w in EN_STOPWORDS)
    h = duckdb_hash64("shingle")
    htok = duckdb_hash64("tok")
    mh_terms = ",\n".join(
        f"CAST(MIN(({2 * i + 1} * h + {i * 12345 + 1}) % 2147483647) AS BIGINT) AS mh{i}"
        for i in range(8)
    )
    return {
        "topk_per_type": """
            SELECT event_type, event_id, value, rk FROM (
              SELECT event_type, event_id, value,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id ASC) AS rk
              FROM events) WHERE rk <= 3
        """,
        "lifo_order": """
            SELECT o_orderkey, seq FROM (
              SELECT o_orderkey,
                     ROW_NUMBER() OVER (ORDER BY o_orderdate DESC, o_orderkey DESC) AS seq
              FROM orders) WHERE seq <= 20
        """,
        "retry_budget": """
            SELECT l_returnflag AS flag, COUNT(*) AS n_ok
            FROM lineitem WHERE l_linenumber < 4 GROUP BY 1
        """,
        "anti_join_unseen": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
                (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        """,
        "group_counts": """
            SELECT o_custkey AS cust, COUNT(*) AS n_orders FROM orders GROUP BY 1
        """,
        "no_new_skip": """
            SELECT o_custkey AS cust, COUNT(*) AS n_orders FROM orders
            GROUP BY 1 HAVING COUNT(*) = 1
        """,
        "first_seen": """
            SELECT user_id,
                   CAST(MIN(FLOOR(epoch(ts))) AS BIGINT) AS first_ts_s,
                   COUNT(*) AS n_events
            FROM events GROUP BY user_id
        """,
        "upsert_last_wins": """
            SELECT user_id, event_id AS last_event_id,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) AS last_ts_s
            FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY ts DESC, event_id DESC) AS rk
              FROM events) WHERE rk = 1
        """,
        "explode_tokens": f"""
            SELECT token, n, rk FROM (
              SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rk
              FROM (
                SELECT token, COUNT(*) AS n FROM (
                  SELECT unnest({_dd_tokens('text')}) AS token FROM documents
                ) GROUP BY token
              )
            ) WHERE rk <= 100
        """,
        "dedup_exact": """
            SELECT MD5(LOWER(TRIM(text))) AS content_hash,
                   MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
            FROM documents GROUP BY 1
        """,
        "dedup_minhash": _dd_shingles_cte("WHERE doc_id < 100")
        + f""",
        hh AS (SELECT doc_id, {h} % 1073741824 AS h FROM s)
        SELECT doc_id, {mh_terms} FROM hh GROUP BY doc_id
        """,
        "dedup_simhash": f"""
            WITH t AS (
              SELECT doc_id,
                     unnest(list_distinct({_dd_tokens('text')})) AS tok
              FROM documents WHERE doc_id < 100
            ), hh AS (
              SELECT doc_id, {htok} AS h FROM t
            ), v AS (
              SELECT doc_id, b.bit,
                     SUM(CASE WHEN (h >> b.bit) % 2 = 1 THEN 1 ELSE -1 END) AS v
              FROM hh, (SELECT unnest(generate_series(0, 15)) AS bit) b
              GROUP BY doc_id, b.bit
            )
            SELECT doc_id,
                   CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)
                            ELSE 0 END) AS BIGINT) AS simhash
            FROM v GROUP BY doc_id
        """,
        "dedup_lsh_pairs": _dd_shingles_cte("WHERE doc_id < 200")
        + f""",
        hh AS (SELECT doc_id, {h} % 1073741824 AS h FROM s),
        sigs AS (SELECT doc_id, {mh_terms} FROM hh GROUP BY doc_id),
        bands AS (
          SELECT doc_id, 0 AS band,
                 CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR) AS sig FROM sigs
          UNION ALL SELECT doc_id, 1,
                 CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR) FROM sigs
          UNION ALL SELECT doc_id, 2,
                 CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR) FROM sigs
          UNION ALL SELECT doc_id, 3,
                 CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR) FROM sigs
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_bands
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        """,
        "dedup_jaccard": _dd_shingles_cte("WHERE doc_id < 500")
        + """,
        ds AS (SELECT DISTINCT doc_id, shingle FROM s),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ds GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
          FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
               CAST(FLOOR(1000 * n_inter / (sa.n_sh + sb.n_sh - n_inter)) AS BIGINT) AS jaccard_m
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE FLOOR(1000 * n_inter / (sa.n_sh + sb.n_sh - n_inter)) >= 300
        """,
        "dedup_lsh_verified": _dd_shingles_cte("WHERE doc_id < 200")
        + f""",
        hh AS (SELECT doc_id, {h} % 1073741824 AS h FROM s),
        sigs AS (SELECT doc_id, {mh_terms} FROM hh GROUP BY doc_id),
        bands AS (
          SELECT doc_id, 0 AS band,
                 CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR) AS sig FROM sigs
          UNION ALL SELECT doc_id, 1,
                 CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR) FROM sigs
          UNION ALL SELECT doc_id, 2,
                 CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR) FROM sigs
          UNION ALL SELECT doc_id, 3,
                 CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR) FROM sigs
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        ),
        ds AS (SELECT DISTINCT doc_id, shingle FROM s),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ds GROUP BY doc_id),
        inter AS (
          SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
          FROM cand c
          JOIN ds a ON a.doc_id = c.id_a
          JOIN ds b ON b.doc_id = c.id_b AND b.shingle = a.shingle
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
               CAST(FLOOR(1000 * n_inter / (sa.n_sh + sb.n_sh - n_inter)) AS BIGINT) AS jaccard_m
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE FLOOR(1000 * n_inter / (sa.n_sh + sb.n_sh - n_inter)) >= 300
        """,
        # LSH pairs → transitive closure (recursive CTE twin of the
        # Spark min-label propagation) → min-id component + keeper flag
        "dedup_clusters": _dd_shingles_cte("WHERE doc_id < 200").replace(
            "WITH t AS", "WITH RECURSIVE t AS", 1
        )
        + f""",
        hh AS (SELECT doc_id, {h} % 1073741824 AS h FROM s),
        sigs AS (SELECT doc_id, {mh_terms} FROM hh GROUP BY doc_id),
        bands AS (
          SELECT doc_id, 0 AS band,
                 CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR) AS sig FROM sigs
          UNION ALL SELECT doc_id, 1,
                 CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR) FROM sigs
          UNION ALL SELECT doc_id, 2,
                 CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR) FROM sigs
          UNION ALL SELECT doc_id, 3,
                 CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR) FROM sigs
        ),
        p AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        e AS (
          SELECT id_a AS src, id_b AS dst FROM p
          UNION
          SELECT id_b, id_a FROM p
        ),
        reach AS (
          SELECT src, dst FROM e
          UNION
          SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
        ),
        comp AS (
          SELECT src AS id, LEAST(src, MIN(dst)) AS component
          FROM reach GROUP BY src
        )
        SELECT c.id AS doc_id, c.component, s.n_members,
               CAST(c.id = c.component AS BIGINT) AS is_keeper
        FROM comp c
        JOIN (SELECT component, COUNT(*) AS n_members FROM comp GROUP BY 1) s
          ON s.component = c.component
        """,
        "repetition": f"""
            WITH t AS (
              SELECT doc_id, {_dd_tokens('text')} AS toks FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_transform(
                       range(1, CASE WHEN len(toks) >= 3
                                     THEN len(toks) - 2 ELSE 0 END + 1),
                       i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS shl
              FROM t
            )
            SELECT doc_id,
                   CAST(len(shl) AS BIGINT) AS n_shingles,
                   CAST(len(list_distinct(shl)) AS BIGINT) AS n_distinct,
                   CAST(FLOOR(1000 * (len(shl) - len(list_distinct(shl)))
                        / GREATEST(len(shl), 1)) AS BIGINT) AS rep_m
            FROM sh
        """,
        "fingerprints": """
            SELECT doc_id,
                   MD5(regexp_replace(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fingerprint
            FROM documents WHERE doc_id < 200
        """,
        "cosine_topk": """
            WITH qz AS (
              SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS q
              FROM embeddings
            ), nz AS (
              SELECT vec_id, q,
                     CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS norm2
              FROM qz
            ), pairs AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     CAST(list_sum(list_transform(range(1, len(a.q) + 1),
                          i -> a.q[i] * b.q[i])) AS BIGINT) AS dot,
                     b.norm2 AS cn
              FROM nz a, nz b
              WHERE a.vec_id < 10 AND b.vec_id < 300 AND a.vec_id <> b.vec_id
            ), ranked AS (
              SELECT query_id, neighbor_id, dot,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY CAST(dot * ABS(dot) AS DOUBLE) / cn DESC,
                                neighbor_id ASC) AS rank
              FROM pairs
            )
            SELECT query_id, neighbor_id, rank, dot FROM ranked WHERE rank <= 5
        """,
        "ann_lsh": _dd_ann_lsh_sql(10, 300, 5, n_planes=4, n_tables=16),
        "ann_ivf": _dd_ann_ivf_sql(10, 300, 5, centroid_mod=16, n_probe=4),
        "embedding_neardup": """
            WITH qz AS (
              SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS q
              FROM embeddings WHERE vec_id < 300
            ), nz AS (
              SELECT vec_id, q,
                     CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS norm2
              FROM qz
            ), pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     CAST(list_sum(list_transform(range(1, len(a.q) + 1),
                          i -> a.q[i] * b.q[i])) AS BIGINT) AS dot,
                     a.norm2 AS na2, b.norm2 AS nb2
              FROM nz a JOIN nz b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, dot,
                   CAST(FLOOR(1000.0 * CAST(dot AS DOUBLE)
                        / SQRT(CAST(na2 * nb2 AS DOUBLE))) AS BIGINT) AS cos_m
            FROM pairs
            WHERE FLOOR(1000.0 * CAST(dot AS DOUBLE)
                  / SQRT(CAST(na2 * nb2 AS DOUBLE))) >= 400
        """,
        "embedding_neardup_lsh": _dd_neardup_lsh_sql(
            300, 400, n_planes=2, n_tables=8
        ),
        "langid": f"""
            WITH t AS (
              SELECT doc_id, {_dd_tokens('text')} AS toks FROM documents
            ), c AS (
              SELECT doc_id,
                     CAST(len(toks) AS INT) AS n_tokens,
                     CAST(len(list_filter(toks, t -> list_contains([{stops}], t))) AS INT) AS n_stop
              FROM t
            )
            SELECT doc_id, n_tokens, n_stop,
                   CAST(FLOOR(1000 * n_stop / GREATEST(n_tokens, 1)) AS BIGINT) AS stop_ratio_m,
                   CASE WHEN FLOOR(1000 * n_stop / GREATEST(n_tokens, 1)) >= 150
                        THEN 'en' ELSE 'other' END AS lang_guess
            FROM c
        """,
        "quality": f"""
            WITH t AS (
              SELECT doc_id, text, {_dd_tokens('text')} AS toks FROM documents
            ), c AS (
              SELECT doc_id,
                     CAST(length(text) AS BIGINT) AS n_chars,
                     CAST(len(toks) AS INT) AS n_tokens,
                     CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
                     CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS tok_chars
              FROM t
            ), r AS (
              SELECT *,
                CAST(FLOOR(1000 * n_punct / GREATEST(n_chars, 1)) AS BIGINT) AS punct_ratio_m,
                CAST(FLOOR(1000 * tok_chars / GREATEST(n_tokens, 1)) AS BIGINT) AS mean_tok_len_m
              FROM c
            )
            SELECT doc_id, n_chars, n_tokens, n_punct, tok_chars,
                   punct_ratio_m, mean_tok_len_m,
                   CAST(GREATEST(0, LEAST(1000, n_tokens * 2) - punct_ratio_m
                        - CASE WHEN mean_tok_len_m < 2000 OR mean_tok_len_m > 12000
                               THEN 200 ELSE 0 END) AS BIGINT) AS quality_m
            FROM r
        """,
        "token_stats": f"""
            SELECT source,
                   CAST(SUM(len({_dd_tokens('text')})) AS BIGINT) AS total_tokens,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY source
        """,
        # --- crawl queries: the oracle is a materialized dump of the
        # pure-Python reference replay (scripts/dump_crawl_oracle.py),
        # independent of every Spark code path under test. The entry's
        # crawl is fixed (default_specs(seed=123), deterministic), so the
        # dump is valid at any sf. ---
        "crawl_trace": f"""
            SELECT site, url, task_type, action, n_errors, seq
            FROM read_parquet('{_dump('crawl_trace')}')
        """,
        "crawl_documents_spans": f"""
            SELECT start_url, song_url, pos, kind, text, media_ref,
                   "offset" AS offset
            FROM read_parquet('{_dump('crawl_documents_spans')}')
        """,
        "crawl_seen_set": f"""
            SELECT start_url, song_url, doc_id
            FROM read_parquet('{_dump('crawl_seen_set')}')
        """,
        "crawl_media_features": f"""
            SELECT media_ref, kind, bucket, value_ppm
            FROM read_parquet('{_dump('crawl_media_features')}')
        """,
        "crawl_media_decoded": f"""
            SELECT media_ref, kind, width, height, duration_ms,
                   content_md5, n_frames
            FROM read_parquet('{_dump('crawl_media_decoded')}')
        """,
        # end-to-end dedup over the crawl corpus: rebuild each document's
        # text from the REFERENCE-ORACLE span dump (crawl side is thereby
        # independently checked too), then the same LSH → jaccard-verify
        # (>= 40‰) → recursive-CTE closure → keeper as dedup_clusters.
        "crawl_dedup_clusters": f"""
        WITH RECURSIVE docs AS (
          SELECT start_url || song_url AS doc_id,
                 string_agg(text, ' ' ORDER BY pos)
                   FILTER (kind <> 'media' AND text <> '') AS text
          FROM read_parquet('{_dump('crawl_documents_spans')}')
          GROUP BY 1
        ), t AS (
          SELECT doc_id, {_dd_tokens('text')} AS toks FROM docs
        ), s AS (
          SELECT doc_id,
                 unnest(list_transform(
                   range(1, CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 0 END + 1),
                   i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shingle
          FROM t
        ),
        hh AS (SELECT doc_id, {h} % 1073741824 AS h FROM s),
        sigs AS (SELECT doc_id, {mh_terms} FROM hh GROUP BY doc_id),
        bands AS (
          SELECT doc_id, 0 AS band,
                 CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR) AS sig FROM sigs
          UNION ALL SELECT doc_id, 1,
                 CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR) FROM sigs
          UNION ALL SELECT doc_id, 2,
                 CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR) FROM sigs
          UNION ALL SELECT doc_id, 3,
                 CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR) FROM sigs
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        ),
        ds AS (SELECT DISTINCT doc_id, shingle FROM s),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ds GROUP BY doc_id),
        inter AS (
          SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
          FROM cand c
          JOIN ds a ON a.doc_id = c.id_a
          JOIN ds b ON b.doc_id = c.id_b AND b.shingle = a.shingle
          GROUP BY 1, 2
        ),
        p AS (
          SELECT id_a, id_b
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE FLOOR(1000 * n_inter / (sa.n_sh + sb.n_sh - n_inter)) >= 40
        ),
        e AS (
          SELECT id_a AS src, id_b AS dst FROM p
          UNION
          SELECT id_b, id_a FROM p
        ),
        reach AS (
          SELECT src, dst FROM e
          UNION
          SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
        ),
        comp AS (
          SELECT src AS id, LEAST(src, MIN(dst)) AS component
          FROM reach GROUP BY src
        )
        SELECT c.id AS doc_id, c.component, s.n_members,
               CAST(c.id = c.component AS BIGINT) AS is_keeper
        FROM comp c
        JOIN (SELECT component, COUNT(*) AS n_members FROM comp GROUP BY 1) s
          ON s.component = c.component
        """,
    }
