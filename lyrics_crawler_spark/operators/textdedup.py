"""Large-scale text deduplication operators (training-data pipeline).

These are the dedup primitives a 100 TB corpus pipeline needs on top of
the crawl engine's URL-level dedup: exact hashing, MinHash+LSH, SimHash,
and n-gram Jaccard. All pure Catalyst (no Python in the hot path), and
every hash is the *portable* md5-prefix hash (functions/hashing.py) so a
DuckDB oracle can verify results bit-for-bit.

Scale notes:
- exact dedup: one shuffle (groupBy hash); map-side partial agg applies.
- MinHash: shingles explode → per-doc per-permutation min — one shuffle
  keyed by doc; LSH banding turns pair-finding into an equi-join on
  (band, signature) buckets instead of an O(n²) cross join.
- SimHash: token explode → 16-bit majority vote — one shuffle.
- n-gram Jaccard is the *verifier* on LSH candidates, never run all-pairs
  at scale (the helper caps the id range for the oracle-checked query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lyrics_crawler_spark.functions.hashing import spark_hash64

TOKEN_RE = "[^a-z0-9]+"

# MinHash parameters (shared with the DuckDB oracle SQL in
# __spark_entry__.py — keep in sync!)
MINHASH_PERMS = 8
MINHASH_PRIME = 2147483647  # 2^31 - 1
MINHASH_MOD = 1 << 30
SIMHASH_BITS = 16


def tokens_expr(col: str) -> str:
    """Lowercased alpha-numeric tokens; empty strings filtered. Identical
    regex semantics in Spark (Java regex) and DuckDB (RE2)."""
    return f"filter(split(lower({col}), '{TOKEN_RE}'), t -> t <> '')"


def shingles_expr(col: str, n: int = 3) -> str:
    """Word n-gram shingles as space-joined strings. Guarded so short
    docs yield an empty array (Spark's sequence(1,0) would count DOWN)."""
    toks = tokens_expr(col)
    return (
        f"case when size({toks}) >= {n} then "
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
        f"else cast(array() as array<string>) end"
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: keep the minimum key per hash group
    (the crawl engine's D1 for content instead of URLs)."""
    return (
        docs.selectExpr(key_col, f"md5(lower(trim({text_col}))) as content_hash")
        .groupBy("content_hash")
        .agg(
            F.min(key_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", key_col: str = "doc_id",
    perms: int = MINHASH_PERMS,
) -> DataFrame:
    """MinHash signatures: perm i maps shingle hash h → (a_i·h + b_i) mod p
    with h reduced mod 2^30 so products stay < 2^62 (ANSI-overflow-safe,
    and identically computable in DuckDB integer arithmetic)."""
    sh = docs.selectExpr(
        key_col, f"explode({shingles_expr(text_col)}) as shingle"
    ).withColumn("h", F.expr(spark_hash64("shingle")) % MINHASH_MOD)
    mins = [
        F.min(
            ((F.lit(2 * i + 1) * F.col("h") + F.lit(i * 12345 + 1)) % MINHASH_PRIME)
        ).alias(f"mh{i}")
        for i in range(perms)
    ]
    return sh.groupBy(key_col).agg(*mins)


def lsh_buckets(
    signatures: DataFrame, key_col: str = "doc_id",
    bands: int = 4, rows_per_band: int = 2,
) -> DataFrame:
    """Band the signature: docs sharing any (band, band-signature) bucket
    are near-dup candidates; candidate pairs come from an equi-join on
    the bucket key — never a cross join."""
    cols = []
    for b in range(bands):
        parts = [
            F.col(f"mh{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        cols.append(
            F.struct(
                F.lit(b).alias("band"), F.concat_ws("_", *parts).alias("sig")
            )
        )
    return (
        signatures.select(key_col, F.explode(F.array(*cols)).alias("bk"))
        .select(key_col, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))
    )


def lsh_candidate_pairs(
    docs: DataFrame, text_col: str = "text", key_col: str = "doc_id",
    max_id: int | None = None, bands: int = 4, rows_per_band: int = 2,
) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle → minhash → band →
    bucket equi-join (the scale path — pair-finding never cross-joins).
    Returns distinct unordered pairs plus the number of bucket
    collisions (evidence strength)."""
    base = docs if max_id is None else docs.where(F.col(key_col) < max_id)
    bk = lsh_buckets(
        minhash_signatures(base, text_col, key_col),
        key_col, bands, rows_per_band,
    )
    a = bk.select(F.col(key_col).alias("id_a"), "band", "sig")
    b = bk.select(F.col(key_col).alias("id_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands"))
    )


def simhash(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash over distinct tokens: bit b set iff the majority of token
    hashes have bit b set (sum of ±1 votes > 0 — strict, deterministic)."""
    tok = docs.selectExpr(
        key_col, f"explode(array_distinct({tokens_expr(text_col)})) as tok"
    ).withColumn("h", F.expr(spark_hash64("tok")))
    votes = tok.select(
        key_col,
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
    ).withColumn(
        "vote",
        F.when(F.expr("shiftright(h, bit) % 2 = 1"), 1).otherwise(-1),
    )
    return (
        votes.groupBy(key_col, "bit")
        .agg(F.sum("vote").alias("v"))
        .withColumn(
            "bitval",
            F.when(F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(
                F.lit(0).cast("bigint")
            ),
        )
        .groupBy(key_col)
        .agg(F.sum("bitval").alias("simhash"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", key_col: str = "doc_id",
    n: int = 3, threshold: float = 0.5, max_id: int | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Jaccard similarity on word n-gram shingle *sets* — the exact
    verification stage after LSH.

    With ``candidates`` (a DataFrame of unordered ``(id_a, id_b)`` pairs,
    e.g. :func:`lsh_candidate_pairs` output) the intersection is computed
    by joining the candidate set to each side's shingles — work bounded
    by ``|candidates| · shingles_per_doc``, the 100 TB path. Without it,
    the shingle self-equi-join runs, which is quadratic on hot shingles:
    that mode REQUIRES ``max_id`` (oracle-capped runs only)."""
    base = docs
    if max_id is not None:
        base = docs.where(F.col(key_col) < max_id)
    sh = base.selectExpr(
        key_col,
        f"explode(array_distinct({shingles_expr(text_col, n)})) as shingle",
    )
    sizes = sh.groupBy(key_col).agg(F.count("*").alias("n_sh"))
    if candidates is not None:
        # candidate-bounded intersection: pair ⋈ a-shingles on id_a,
        # then ⋈ b-shingles on (id_b, shingle). Hot shingles cost
        # nothing extra — every join carries a doc id key.
        cand = candidates.select("id_a", "id_b")
        a = sh.select(F.col(key_col).alias("id_a"), "shingle")
        b = sh.select(F.col(key_col).alias("id_b"), "shingle")
        inter = (
            cand.join(a, "id_a")
            .join(b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_inter"))
        )
    else:
        if max_id is None:
            raise ValueError(
                "all-pairs shingle self-join requires max_id; pass candidates= "
                "for the scale path"
            )
        a = sh.withColumnRenamed(key_col, "id_a")
        b = sh.withColumnRenamed(key_col, "id_b")
        inter = (
            a.join(b, "shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_inter"))
        )
    sa = sizes.withColumnRenamed(key_col, "id_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed(key_col, "id_b").withColumnRenamed("n_sh", "n_b")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard_m",
            # integer-exact similarity in thousandths: portable across engines
            (F.lit(1000) * F.col("n_inter"))
            .cast("bigint")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .withColumn("jaccard_m", F.floor(F.col("jaccard_m")).cast("bigint"))
        .where(F.col("jaccard_m") >= int(threshold * 1000))
        .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard_m")
    )
