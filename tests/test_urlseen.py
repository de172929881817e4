"""Partitioned bloom URL-seen structure (operators/urlseen.py).

Contract: NO false negatives ever (a fetched URL always probes
maybe_seen=True), bounded false-positive rate, associative delta
merging (per-wave appends OR together), and — when enabled inside the
engine — bit-identical crawl results vs the exact-join path.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lyrics_crawler_spark.operators.urlseen import (
    _np_positions,
    bloom_build,
    bloom_probe,
    bloom_probe_cogroup,
    seen_split,
)
from lyrics_crawler_spark.sitegen.graph import SiteSpec
from tests.conftest import assert_golden

PARAMS = {"num_partitions": 8, "m_bits": 1 << 16, "k": 4}


def test_positions_deterministic_and_in_range():
    m = 1 << 16
    h1 = np.arange(1000, dtype=np.int64) * 7919 % m
    h2 = (np.arange(1000, dtype=np.int64) * 104729 % m) | 1
    p1 = _np_positions(h1, h2, m, 4)
    p2 = _np_positions(h1, h2, m, 4)
    assert (p1 == p2).all()
    assert p1.shape == (1000, 4)
    assert p1.min() >= 0 and p1.max() < m


def test_jvm_and_cogroup_probes_agree(spark):
    """The broadcast Catalyst probe and the partitioned cogrouped probe
    are the same filter at two scales — per-key verdicts must be
    bit-identical (same hash derivation on both sides)."""
    keys = spark.range(3000).select(
        F.xxhash64(F.concat(F.lit("k-"), F.col("id"))).alias("url_hash")
    )
    bloom = bloom_build(keys.where("url_hash % 3 = 0"), **PARAMS)
    cand = keys
    jvm = {
        r.url_hash: r.maybe_seen
        for r in bloom_probe(cand, bloom, **PARAMS).collect()
    }
    cg = {
        r.url_hash: r.maybe_seen
        for r in bloom_probe_cogroup(cand, bloom, **PARAMS).collect()
    }
    assert jvm == cg


def test_no_false_negatives_and_fp_bound(spark):
    n = 4000
    inserted = spark.range(n).select(
        F.xxhash64(F.concat(F.lit("seen-"), F.col("id"))).alias("url_hash")
    )
    bloom = bloom_build(inserted, **PARAMS)

    probed_in = bloom_probe(inserted, bloom, **PARAMS)
    assert probed_in.where(~F.col("maybe_seen")).count() == 0  # no false neg

    others = spark.range(n).select(
        F.xxhash64(F.concat(F.lit("unseen-"), F.col("id"))).alias("url_hash")
    )
    fp = bloom_probe(others, bloom, **PARAMS).where("maybe_seen").count()
    # 8 parts × 64 Kib, 4k keys → ~0.6 bits set per 8; fp ≈ (k*n/m)^k ≪ 1%
    assert fp / n < 0.01, fp


def test_delta_merge_is_union(spark):
    a = spark.range(100).select(
        F.xxhash64(F.concat(F.lit("a-"), F.col("id"))).alias("url_hash")
    )
    b = spark.range(100).select(
        F.xxhash64(F.concat(F.lit("b-"), F.col("id"))).alias("url_hash")
    )
    # two independent delta builds (per-wave appends), unioned as rows —
    # probe must see the OR of both
    deltas = bloom_build(a, **PARAMS).unionByName(bloom_build(b, **PARAMS))
    both = a.unionByName(b)
    assert bloom_probe(both, deltas, **PARAMS).where(~F.col("maybe_seen")).count() == 0


def test_seen_split_partitions_candidates(spark):
    seen = spark.range(500).select(
        F.xxhash64(F.concat(F.lit("s-"), F.col("id"))).alias("url_hash")
    )
    bloom = bloom_build(seen, **PARAMS)
    cand = seen.unionByName(
        spark.range(500).select(
            F.xxhash64(F.concat(F.lit("new-"), F.col("id"))).alias("url_hash")
        )
    )
    new_side, maybe_side = seen_split(cand, bloom, **PARAMS)
    n_new, n_maybe = new_side.count(), maybe_side.count()
    assert n_new + n_maybe == 1000
    assert n_maybe >= 500  # every true member lands on the maybe side
    assert n_maybe <= 510  # fp keeps the exact-join side small


@pytest.mark.parametrize("dialect", ["hindilyrics", "metrolyrics"])
def test_engine_bloom_golden_parity(spark, tmp_store, dialect):
    """bloom_seen=True must leave the golden contract untouched —
    same visit order, seen set, and span sequences (fp are resolved by
    the exact join; misses skip it)."""
    spec = SiteSpec(
        dialect,
        f"http://bl-{dialect}.example",
        seed=29,
        n_seeds=2,
        branch1=3,
        branch2=2,
        n_pages=2,
        songs_per_page=2,
        error_rate=0.2,
        dup_link_rate=0.4,
        max_err=3,
    )
    assert_golden(
        spark, [spec], tmp_store,
        bloom_seen=True, bloom_partitions=4, bloom_m_bits=1 << 14,
    )
