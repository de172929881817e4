"""Partitioned bloom-filter URL-seen structure (SURVEY.md §1.3).

The engine's ground-truth seen state is relational: the settlement
equi-join of the frontier against the fetch log on ``abs_url``
(engine.py ``_url_state``; reference semantics ``exists_song``,
db_operations.py:214-229). At a 10^10-URL frontier that join shuffles
every candidate URL every wave even though the overwhelming majority
have never been fetched. This module adds the north rule's scale path: a
**partitioned bloom filter** keyed by the 64-bit ``xxhash64`` of the
canonical URL that cheaply proves *definite non-membership*, so only the
small maybe-seen remainder pays the exact join (bloom false positives
are then resolved exactly — semantics never change).

Design:

- **partitioning**: key space is split by ``pmod(url_hash, P)``; each
  partition owns an independent ``m``-bit bitset. At 10^10 URLs and
  ~10 bits/key (k=4 → ~2% fp) the whole structure is ~12 GB — too big
  for one broadcast, which is why it is partitioned.
- **build**: per wave, the newly fetched URLs produce *delta* bitsets
  (one row per touched partition), vectorized numpy inside Arrow
  batches. Deltas merge with bitwise OR — associative and idempotent —
  so both an append-only delta log and a per-wave merged snapshot
  (:func:`bloom_merge`, what the engine keeps) read identically.
- **probe — JVM path (default)**: the merged bitsets are tiny at any
  sandbox-reachable scale (P × m/8 bytes = 4 MB at defaults), so the
  probe collects them once, re-exposes them as a broadcast
  ``(part, words array<long>)`` dimension, and tests the k bits with
  pure Catalyst shift/AND expressions — the candidates NEVER cross the
  Python boundary (the round-2 cogrouped-``applyInPandas`` probe
  shuffled every candidate into Python per wave and measured 2× slower
  than the exact join — VERDICT r02). Above ``max_broadcast_bytes`` the
  probe falls back to the cogrouped path automatically.
- **probe — cogrouped path (the >broadcast scale fallback)**: bitset
  partition p co-locates with candidate partition p via a cogrouped
  ``applyInPandas``, so candidates shuffle once on ONE int key and each
  executor holds only its slice of the 12 GB structure.
- **hashing**: double hashing ``pos_i = (h1 + i*h2) mod m`` (Kirsch &
  Mitzenmacher). Both h1 and h2 derive JVM-side — ``h1 = pmod(key, m)``,
  ``h2 = pmod(xxhash64(key), m) | 1`` (odd → full-cycle for power-of-two
  m) — so the numpy build and the Catalyst probe share integer-exact
  small-mod arithmetic (no 64-bit wraparound multiplies, which ANSI mode
  would reject in Catalyst).

A cuckoo filter (deletions, ~same space) is noted in PAPERS.md as the
alternative; the crawl never un-sees a URL, so bloom's no-delete
limitation costs nothing and its build is one vectorized pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_SCHEMA = "part int, bitset binary"

# above this merged-structure size the broadcast probe would strain the
# driver; the partitioned cogrouped path takes over (the 10^10 regime).
MAX_BROADCAST_BYTES = 256 << 20


def _attach_hashes(
    df: DataFrame, key_col: str, num_partitions: int, m_bits: int
) -> DataFrame:
    """JVM-side hash derivation shared by build and probe: the bloom
    partition and the two double-hashing bases, all reduced mod m so
    every later step is small-int arithmetic (identical in numpy and in
    Catalyst, ANSI-safe)."""
    h = F.col(key_col)
    return (
        df.withColumn("__bpart", F.pmod(h, F.lit(num_partitions)).cast("int"))
        .withColumn("__bh1", F.pmod(h, F.lit(m_bits)))
        .withColumn(
            "__bh2", F.pmod(F.xxhash64(h), F.lit(m_bits)).bitwiseOR(F.lit(1))
        )
    )


def _np_positions(h1: np.ndarray, h2: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) int64 bit positions from the pre-reduced hash bases."""
    i = np.arange(k, dtype=np.int64)[None, :]
    return (h1[:, None] + i * h2[:, None]) % m_bits


def _bitset_from_positions(pos: np.ndarray, m_bits: int) -> bytes:
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    flat = pos.ravel()
    np.bitwise_or.at(bits, flat >> 3, np.uint8(1) << (flat & 7).astype(np.uint8))
    return bits.tobytes()


def _test_positions(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(n,) bool — all k bits set."""
    byte_idx = pos >> 3
    bit_mask = (np.uint8(1) << (pos & 7).astype(np.uint8)).astype(np.uint8)
    return ((bits[byte_idx] & bit_mask) != 0).all(axis=1)


def bloom_build(
    keys: DataFrame,
    key_col: str = "url_hash",
    num_partitions: int = 32,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Delta bitsets for a batch of keys: one row per touched partition.
    ``keys`` may contain duplicates (idempotent inserts). One vectorized
    numpy pass per Arrow batch group."""
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["__bpart"].iloc[0])
        pos = _np_positions(
            pdf["__bh1"].to_numpy(np.int64), pdf["__bh2"].to_numpy(np.int64),
            m_bits, k,
        )
        return pd.DataFrame(
            {"part": [part], "bitset": [_bitset_from_positions(pos, m_bits)]}
        )

    keyed = _attach_hashes(keys.select(key_col), key_col, num_partitions, m_bits)
    return keyed.groupBy("__bpart").applyInPandas(build, BLOOM_SCHEMA)


def bloom_merge(bloom: DataFrame) -> DataFrame:
    """OR-merge delta bitset rows into one row per touched partition
    (associative + idempotent, so merging per wave — what the engine's
    replace-mode carry does — equals merging everything at read). P tiny
    groups; cost is O(deltas × m/8 bytes), independent of crawl size."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["part"].iloc[0])
        bits = np.bitwise_or.reduce(
            [np.frombuffer(b, dtype=np.uint8) for b in pdf["bitset"]]
        )
        return pd.DataFrame({"part": [part], "bitset": [bits.tobytes()]})

    return bloom.groupBy("part").applyInPandas(merge, BLOOM_SCHEMA)


def _bit_test_expr(i: int, m_bits: int) -> str:
    """SQL for 'bit (h1 + i*h2) mod m of the little-endian int64 word
    array is set'. Spark array indexing is 0-based; shiftright on the
    word is arithmetic but the & 1 mask discards the sign fill."""
    pos = f"pmod(__bh1 + {i} * __bh2, {m_bits})"
    return (
        f"(shiftright(__bwords[CAST(shiftright({pos}, 6) AS INT)], "
        f"CAST({pos} & 63 AS INT)) & 1) = 1"
    )


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str = "url_hash",
    num_partitions: int = 32,
    m_bits: int = 1 << 20,
    k: int = 4,
    max_broadcast_bytes: int = MAX_BROADCAST_BYTES,
) -> DataFrame:
    """Tag candidates with ``maybe_seen``: False is definitive (bloom
    guarantee), True must be confirmed by the exact join.

    Default = the JVM path: OR-merge the bitset rows at the driver
    (``bloom`` is at most P merged rows when fed from the engine's carry;
    raw delta logs are merged here the same way), broadcast them as an
    int64-word dimension, and evaluate the k bit tests as Catalyst
    expressions — zero Python stages over the candidates. Falls back to
    the cogrouped partition-local path when the merged structure exceeds
    ``max_broadcast_bytes``."""
    rows = bloom.collect()
    merged: dict[int, np.ndarray] = {}
    for r in rows:
        arr = np.frombuffer(r["bitset"], dtype=np.uint8)
        p = int(r["part"])
        merged[p] = (merged[p] | arr) if p in merged else arr
    total_bytes = sum(a.nbytes for a in merged.values())
    if total_bytes > max_broadcast_bytes:
        return bloom_probe_cogroup(
            candidates, bloom, key_col, num_partitions, m_bits, k
        )
    spark = candidates.sparkSession
    dim_rows = [(p, a.view("<i8").tolist()) for p, a in merged.items()]
    words_dim = spark.createDataFrame(dim_rows, "__bpart int, __bwords array<long>")
    keyed = _attach_hashes(candidates, key_col, num_partitions, m_bits)
    probed = keyed.join(F.broadcast(words_dim), "__bpart", "left")
    test = F.expr(" AND ".join(_bit_test_expr(i, m_bits) for i in range(k)))
    return probed.withColumn(
        "maybe_seen",
        F.when(F.col("__bwords").isNull(), F.lit(False)).otherwise(test),
    ).drop("__bpart", "__bh1", "__bh2", "__bwords")


def bloom_probe_cogroup(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str = "url_hash",
    num_partitions: int = 32,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Partition-co-located probe for structures too big to broadcast
    (the 10^10 regime): candidates shuffle once on the int partition key
    and meet only their own bitset slice inside a cogrouped
    applyInPandas; delta bitsets OR-merge per group."""
    keyed = _attach_hashes(candidates, key_col, num_partitions, m_bits)

    def probe(cand: pd.DataFrame, bits_pdf: pd.DataFrame) -> pd.DataFrame:
        out = cand.drop(columns=["__bpart", "__bh1", "__bh2"])
        if len(cand) == 0:
            return out.assign(maybe_seen=pd.Series([], dtype=bool))
        if len(bits_pdf) == 0:
            return out.assign(maybe_seen=False)
        bits = np.bitwise_or.reduce(
            [np.frombuffer(b, dtype=np.uint8) for b in bits_pdf["bitset"]]
        )
        pos = _np_positions(
            cand["__bh1"].to_numpy(np.int64), cand["__bh2"].to_numpy(np.int64),
            m_bits, k,
        )
        return out.assign(maybe_seen=_test_positions(bits, pos))

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in candidates.schema.fields
    ) + ", maybe_seen boolean"
    return (
        keyed.groupBy("__bpart")
        .cogroup(bloom.groupBy("part"))
        .applyInPandas(probe, out_schema)
    )


def seen_split(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str = "url_hash",
    **params,
) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) — the pre-filter contract: the first
    side skips the exact seen join entirely; the second side is small
    (true hits + fp rate) and goes through it."""
    probed = bloom_probe(candidates, bloom, key_col, **params)
    return (
        probed.where(~F.col("maybe_seen")).drop("maybe_seen"),
        probed.where(F.col("maybe_seen")).drop("maybe_seen"),
    )
