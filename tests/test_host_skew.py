"""Adversarial host skew (axis B; VERDICT r04 next-round #6).

A real crawl frontier is never host-balanced — one big site can be ~90%
of every wave. Two claims under test:

1. correctness: the golden trace/seen/span contract holds on a skewed
   graph with politeness budgets on (the per-host top-k window and the
   LIFO order interact on exactly one dominant host);
2. no straggler stage: the fetch stage spreads by (site_id, url) HASH,
   not by host, so a 90%-host wave still lands balanced across fetch
   partitions — measured from the per-row partition_id the fetch log
   records, wave by wave.
"""

import pytest
from pyspark.sql import functions as F

from lyrics_crawler_spark.engine import CrawlEngine
from lyrics_crawler_spark.sitegen.graph import SiteSpec

from tests.conftest import assert_golden


def _skew_specs(scale_big: int = 60, seed: int = 909, **kw):
    """One dominant host (~90% of URLs) + two minor hosts."""
    return [
        SiteSpec("hindilyrics", "http://big.example", seed=seed,
                 n_seeds=4, branch1=scale_big, branch2=6, **kw),
        SiteSpec("smriti", "http://tiny-a.example", seed=seed + 1,
                 n_seeds=1, branch1=4, branch2=3, **kw),
        SiteSpec("metrolyrics", "http://tiny-b.example", seed=seed + 2,
                 n_seeds=1, branch1=3, n_pages=2, songs_per_page=2, **kw),
    ]


def test_host_skew_golden_with_politeness(spark, tmp_store):
    """Exact reference-order replay on a 90%-one-host graph with a
    politeness budget throttling the dominant host."""
    specs = _skew_specs(scale_big=8, politeness_budget=5,
                        delay_request=True, dup_link_rate=0.1,
                        error_rate=0.1)
    assert_golden(spark, specs, tmp_store)


def test_host_skew_no_straggler_partitions(spark, tmp_store):
    """On the dominant host's widest waves, fetch work must spread
    across partitions: max per-partition row count bounded by a small
    multiple of the mean (URL-hash spread; a host-keyed spread would put
    ~90% of the wave in one partition and the bound would fail)."""
    eng = CrawlEngine(spark, _skew_specs(scale_big=60), tmp_store)
    eng.run(max_waves=10)
    log = eng.fetch_log()
    share = (
        log.groupBy("site_id")
        .count()
        .orderBy(F.desc("count"))
        .collect()
    )
    total = sum(r["count"] for r in share)
    assert share[0]["count"] / total > 0.85, (
        f"fixture lost its skew: {share}"
    )
    per_part = (
        log.groupBy("wave", "partition_id")
        .agg(F.count("*").alias("n"))
        .groupBy("wave")
        .agg(
            F.max("n").alias("mx"),
            F.avg("n").alias("mean"),
            F.sum("n").alias("wave_n"),
            F.count("*").alias("parts"),
        )
        .collect()
    )
    wide = [r for r in per_part if r["wave_n"] >= 200]
    assert wide, "no wide wave in the skew fixture"
    for r in wide:
        assert r["parts"] >= 8, f"wave {r['wave']} used {r['parts']} partitions"
        assert r["mx"] <= 3.0 * r["mean"], (
            f"straggler partition on wave {r['wave']}: max {r['mx']} vs "
            f"mean {r['mean']:.1f}"
        )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
