"""Checkpoint/resume and politeness-budget behavior (SURVEY.md §5 items 3
and §2.8 R2/R3)."""

from pyspark.sql import functions as F

from lyrics_crawler_spark.engine import CrawlEngine
from lyrics_crawler_spark.sitegen.graph import SiteSpec
from tests.conftest import assert_golden


def _collect_state(eng):
    docs = sorted(
        (r.start_url, r.song_url, str(r.spans))
        for r in eng.documents().collect()
    )
    trace = [
        (r.site, r.seq, r.url, r.action, r.n_errors)
        for r in eng.trace().orderBy("site", "seq").collect()
    ]
    return docs, trace


def test_kill_resume_byte_identical(spark, tmp_store):
    """Kill after wave k, resume in a new engine instance, final state
    identical to an uninterrupted run (north rule: 'a killed job resumes
    byte-identically')."""
    spec = SiteSpec("hindilyrics", "http://h.example", seed=21, n_seeds=2,
                    branch1=3, branch2=2, error_rate=0.2, dup_link_rate=0.4,
                    empty_movie_rate=0.2, max_err=3)
    full_dir = tmp_store + "/full"
    part_dir = tmp_store + "/part"

    eng_full = CrawlEngine(spark, [spec], full_dir)
    eng_full.run()

    eng_part = CrawlEngine(spark, [spec], part_dir)
    eng_part.run(max_waves=3)  # "killed" mid-crawl
    assert eng_part.store.last_wave() >= 2
    # a brand-new engine instance resumes from the committed manifest
    eng_resumed = CrawlEngine(spark, [spec], part_dir)
    eng_resumed.run()

    assert _collect_state(eng_full) == _collect_state(eng_resumed)


def test_kill_resume_pipelined_commits(spark, tmp_store):
    """Same kill/resume contract with pipeline_commits=True: the
    inflight wave's commit is published by run()'s finally, so a
    max_waves 'kill' leaves a fully committed manifest; a fresh serial
    engine resuming that store converges to the uninterrupted state
    (overlay writes are invisible orphans unless committed)."""
    spec = SiteSpec("hindilyrics", "http://h.example", seed=21, n_seeds=2,
                    branch1=3, branch2=2, error_rate=0.2, dup_link_rate=0.4,
                    empty_movie_rate=0.2, max_err=3)
    eng_full = CrawlEngine(spark, [spec], tmp_store + "/full")
    eng_full.run()

    part_dir = tmp_store + "/part"
    eng_part = CrawlEngine(spark, [spec], part_dir, pipeline_commits=True)
    eng_part.run(max_waves=3)
    assert eng_part.store.last_wave() >= 2
    # resume with the serial default — modes must interoperate on the
    # same store (the manifest is the only contract between them)
    eng_resumed = CrawlEngine(spark, [spec], part_dir)
    eng_resumed.run()

    assert _collect_state(eng_full) == _collect_state(eng_resumed)


def test_politeness_budget_caps_wave_fetches(spark, tmp_store):
    """A politeness budget of 2 never fetches more than 2 URLs of that
    host per wave, and the crawl still completes with an identical golden
    trace (politeness affects throughput, never order)."""
    spec = SiteSpec("smriti", "http://sm.example", seed=5, n_seeds=3,
                    branch1=2, branch2=2, delay_request=True,
                    politeness_budget=2)
    oracles, eng = assert_golden(spark, [spec], tmp_store)
    per_wave = (
        eng.fetch_log()
        .join(eng.site_dim.select("site_id", "host"), "site_id")
        .groupBy("wave", "host")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert per_wave, "no fetch waves recorded"
    assert all(r.n <= 2 for r in per_wave)
    # virtual politeness time is accounted in metrics
    vt = eng.metrics().agg(F.sum("vtime_s")).collect()[0][0]
    assert vt and vt > 0


def test_metrics_lineage(spark, tmp_store):
    spec = SiteSpec("lyricsmasti", "http://lm.example", seed=9, n_seeds=2,
                    branch1=2, branch2=2, error_rate=0.3, max_err=2)
    _, eng = assert_golden(spark, [spec], tmp_store)
    m = eng.metrics()
    cols = set(m.columns)
    assert {"wave", "host", "partition_id", "urls_fetched", "errors",
            "bytes", "vtime_s", "snapshot_id"} <= cols
    total_attempts = m.agg(F.sum("urls_attempted")).collect()[0][0]
    assert total_attempts == eng.fetch_log().count()
    # every metrics row points at a committed snapshot file
    import os
    for r in m.select("snapshot_id").distinct().collect():
        assert os.path.exists(r.snapshot_id)
