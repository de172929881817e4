"""Synthetic document corpus at dedup-bench scale.

The driver testdata tops out at sf0.1 (5,000 docs) — every dedup/ANN
headline timing there is job-overhead-dominated, so the shuffle behavior
the plans promise is never actually exercised (VERDICT r03 task #8).
This generator produces an arbitrarily large corpus with the SAME shape
as the testdata `documents` table (doc_id, text, lang, source, n_chars)
plus controlled near-duplicate structure, so `exact_dedup`,
`lsh_candidate_pairs`, and the ANN operators run unchanged against it.

Near-dup structure: a fraction ``dup_rate`` of docs are token-level
mutations of a base document (each token independently resampled with
probability ``mutate_p``), giving LSH a real signal to find — jaccard
of a mutated copy ≈ (1-p)^3 / (2 - (1-p)^3) per 3-gram shingle theory,
~0.66 at p=0.05. Exact duplicates: ``exact_rate`` of docs are verbatim
copies (dedup_exact's work).

Determinism at scale: distributed mapInPandas over spark.range; every
doc's tokens are a pure function of (seed, doc_id) via counter-based
Philox streams, so a mutated copy recomputes its base's tokens directly
(no join, no driver state) and the corpus is byte-identical under any
partitioning.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

_VOCAB = (
    "spark batch part line column order small sort fast value scan slow "
    "group agg filter join shuffle hash merge read write table row page "
    "block stage task wave url song movie artist album lyric verse tune "
    "echo light night rain river stone wind fire cloud dream heart road "
    "train stream buffer codec frame pixel token shard index probe list "
    "queue stack graph node edge label count total delta carry commit"
).split()

_SOURCES = ("web", "books", "wiki", "forum")


def _tokens_for(seed: int, doc_id: int, block: int, exact_per: int,
                dup_per: int, mutate_p: float) -> list[str]:
    """Tokens of doc ``doc_id`` — pure function of (seed, doc_id).

    Within each block of ``block`` docs: the first ``exact_per`` after
    the base are verbatim copies of the block base, the next ``dup_per``
    are mutated copies, the rest are independent."""
    base_id = doc_id - doc_id % block
    off = doc_id % block
    if off == 0 or off > exact_per + dup_per:
        gen = np.random.Generator(np.random.Philox(key=[seed, doc_id]))
        n = 40 + int(gen.integers(0, 40))
        return [_VOCAB[i] for i in gen.integers(0, len(_VOCAB), n)]
    base = _tokens_for(seed, base_id, block, exact_per, dup_per, mutate_p)
    if off <= exact_per:
        return base
    gen = np.random.Generator(np.random.Philox(key=[seed, doc_id]))
    out = list(base)
    flips = gen.random(len(out)) < mutate_p
    subs = gen.integers(0, len(_VOCAB), len(out))
    for j in range(len(out)):
        if flips[j]:
            out[j] = _VOCAB[subs[j]]
    return out


def synthetic_documents(
    spark: SparkSession,
    n: int,
    seed: int = 11,
    block: int = 100,
    exact_per: int = 2,
    dup_per: int = 3,
    mutate_p: float = 0.05,
) -> DataFrame:
    """Corpus of ``n`` docs: per 100-doc block, 2 exact copies + 3
    near-dup mutations of the block base (5% redundancy, the shape of a
    real crawl corpus)."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts, langs, srcs = [], [], []
            for i in ids:
                i = int(i)
                toks = _tokens_for(seed, i, block, exact_per, dup_per, mutate_p)
                texts.append(" ".join(toks))
                langs.append("en" if i % 17 else "other")
                srcs.append(_SOURCES[i % len(_SOURCES)])
            out = pd.DataFrame(
                {"doc_id": ids, "text": texts, "lang": langs, "source": srcs}
            )
            out["n_chars"] = out["text"].str.len().astype("int64")
            yield out

    return spark.range(n).mapInPandas(
        gen,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
