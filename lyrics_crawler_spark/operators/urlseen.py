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

Design (all vectorized numpy inside Arrow batches — no per-row Python):

- **partitioning**: key space is split by ``pmod(url_hash, P)``; each
  partition owns an independent ``m``-bit bitset. At 10^10 URLs and
  ~10 bits/key (k=4 → ~2% fp) the whole structure is ~12 GB — far too
  big for one node, which is exactly why it is partitioned: bitset p
  co-locates with candidate partition p via a cogrouped
  ``applyInPandas``, so the probe shuffles candidates by ONE integer
  key instead of joining two full tables on a string key.
- **build**: per wave, the newly fetched URLs produce *delta* bitsets
  (one row per touched partition). Deltas are unioned with bitwise OR at
  probe time — an associative, idempotent merge, so the bloom table is
  an append-only log exactly like every other engine table (O(wave)
  commit cost, crash-safe resume for free).
- **hashing**: double hashing ``pos_i = (h1 + i*h2) mod m`` (Kirsch &
  Mitzenmacher) from the single 64-bit key; h2 forced odd so the probe
  sequence cycles the full bitset.

A cuckoo filter (deletions, ~same space) is noted in PAPERS.md as the
alternative; the crawl never un-sees a URL, so bloom's no-delete
limitation costs nothing and its build is one vectorized pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_SCHEMA = "part int, bitset binary"


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) int64 bit positions via double hashing. ``keys`` is int64
    (xxhash64 output — may be negative; view as uint64)."""
    h = keys.astype(np.int64).view(np.uint64)
    h1 = h % np.uint64(m_bits)
    # mix for h2 (splitmix64 finalizer step), force odd
    z = h ^ (h >> np.uint64(33))
    z = z * np.uint64(0xFF51AFD7ED558CCD)
    z = z ^ (z >> np.uint64(33))
    h2 = (z | np.uint64(1)) % np.uint64(m_bits)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


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
        part = int(pdf["part"].iloc[0])
        pos = _positions(pdf[key_col].to_numpy(np.int64), m_bits, k)
        return pd.DataFrame(
            {"part": [part], "bitset": [_bitset_from_positions(pos, m_bits)]}
        )

    keyed = keys.select(
        F.pmod(F.col(key_col), F.lit(num_partitions)).cast("int").alias("part"),
        F.col(key_col),
    )
    return keyed.groupBy("part").applyInPandas(build, BLOOM_SCHEMA)


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str = "url_hash",
    num_partitions: int = 32,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Tag candidates with ``maybe_seen``: False is definitive (bloom
    guarantee), True must be confirmed by the exact join. Implemented as
    a cogrouped applyInPandas on the bloom partition id — candidates
    shuffle once on an int key; delta bitsets are OR-merged per group
    (associative union of per-wave appends)."""
    cols = candidates.columns

    def probe(cand: pd.DataFrame, bits_pdf: pd.DataFrame) -> pd.DataFrame:
        out = cand.drop(columns=["__bloom_part"])
        if len(cand) == 0:
            return out.assign(maybe_seen=pd.Series([], dtype=bool))
        if len(bits_pdf) == 0:
            return out.assign(maybe_seen=False)
        bits = np.bitwise_or.reduce(
            [np.frombuffer(b, dtype=np.uint8) for b in bits_pdf["bitset"]]
        )
        pos = _positions(cand[key_col].to_numpy(np.int64), m_bits, k)
        return out.assign(maybe_seen=_test_positions(bits, pos))

    keyed = candidates.withColumn(
        "__bloom_part", F.pmod(F.col(key_col), F.lit(num_partitions)).cast("int")
    )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in candidates.schema.fields
    ) + ", maybe_seen boolean"
    return (
        keyed.groupBy("__bloom_part")
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
