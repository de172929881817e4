"""Synthetic embedding corpora for ANN quality measurement.

The driver testdata's `embeddings` table is near-isotropic gaussian —
the documented WORST case for every partitioning ANN (BENCH.md "honesty
note": neighbors at cos 0.3-0.5, spread across lists/buckets). Real
embedding corpora cluster: near-dup training documents, paraphrases, and
per-topic manifolds put true neighbors at cos >= 0.8 inside a shared
region. VERDICT r03 task #4 asks for exactly this regime so the IVF/LSH
operators can ship defaults justified by a recall number where they are
designed to win.

Mixture-of-gaussians with controlled intra-cluster cosine:

    x_i = c_{i mod K} + sigma * g_i,   g_i ~ N(0, I_d),  |c_j| = 1

For two same-cluster points, E[cos] ~= 1 / (1 + sigma^2 * d) (cross
terms vanish in expectation, |x|^2 ~= 1 + sigma^2 d), so a target
intra-cluster cosine t gives sigma = sqrt((1/t - 1) / d). The generator
REPORTS the realized mean intra/inter cosine so the bench table carries
measured, not assumed, corpus geometry.

Determinism at scale: generation is distributed (mapInPandas over
spark.range — no driver materialization), and every row's randomness
comes from a counter-based Philox stream keyed by (seed, vec_id), so
the corpus is byte-identical under any partitioning or executor count.
Cluster centers use the (seed, K + j) streams.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def _row_normals(seed: int, stream: int, dim: int) -> np.ndarray:
    """dim standard normals from the (seed, stream) Philox stream."""
    gen = np.random.Generator(np.random.Philox(key=[seed, stream]))
    return gen.standard_normal(dim)


def _centers(seed: int, n_clusters: int, dim: int) -> np.ndarray:
    c = np.stack(
        [_row_normals(seed, (1 << 40) + j, dim) for j in range(n_clusters)]
    )
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def clustered_embeddings(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    n_clusters: int = 50,
    intra_cos: float = 0.8,
    seed: int = 7,
) -> DataFrame:
    """Clustered corpus as (vec_id: long, embedding: array<float>) —
    same shape as the driver testdata table, so every similarity
    operator and bench script reads it unchanged. Cluster of row i is
    ``i % n_clusters`` (balanced lists — skew is a separate axis)."""
    sigma = float(np.sqrt((1.0 / intra_cos - 1.0) / dim))
    centers = _centers(seed, n_clusters, dim)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), dim), dtype=np.float32)
            for r, i in enumerate(ids):
                g = _row_normals(seed, int(i), dim)
                out[r] = centers[int(i) % n_clusters] + sigma * g
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(out)}
            )

    return spark.range(n).mapInPandas(
        gen, schema="vec_id long, embedding array<float>"
    )


def corpus_geometry(
    emb: DataFrame, n_clusters: int, sample: int = 400
) -> dict:
    """Measured mean intra- vs inter-cluster cosine on a prefix sample
    (driver-side numpy — measurement utility, not a pipeline operator)."""
    rows = emb.where(emb.vec_id < sample).collect()
    v = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    cid = np.array([int(r.vec_id) % n_clusters for r in rows])
    cos = v @ v.T
    same = cid[:, None] == cid[None, :]
    off = ~np.eye(len(rows), dtype=bool)
    return {
        "intra_cos": float(cos[same & off].mean()),
        "inter_cos": float(cos[~same].mean()),
    }
