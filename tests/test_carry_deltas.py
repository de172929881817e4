"""Delta-mode worklist carries (VERDICT r02 missing #3 / next #5).

``carry_deltas=K`` commits per-wave carry *deltas* (changed rows +
tombstones, last-writer-wins at read) instead of rewriting the full
pending/unresolved/leaf_unsaved worklists, compacting every K waves.
Must be observationally identical to replace mode: same golden trace,
same documents, resume-safe at any kill point.
"""

from pyspark.sql import functions as F

from lyrics_crawler_spark.engine import CrawlEngine
from lyrics_crawler_spark.sitegen.graph import SiteSpec, default_specs
from tests.conftest import assert_golden

# mirrors test_golden_engine's errors+dups spec (seed chosen so the
# crawl both loses URLs to the budget AND saves documents)
SPEC = dict(seed=7, n_seeds=3, branch1=3, branch2=3, error_rate=0.2,
            dup_link_rate=0.5, empty_movie_rate=0.3, max_err=3)


def test_delta_mode_golden(spark, tmp_store):
    """Golden trace/seen/spans equality with deltas + mid-crawl
    compaction (K=3 on a >3-wave crawl exercises both commit kinds)."""
    spec = SiteSpec("hindilyrics", "http://hd.example", **SPEC)
    assert_golden(spark, [spec], tmp_store, carry_deltas=3)


def test_delta_mode_commits_deltas_not_state(spark, tmp_store):
    """Between compactions the pending carry accumulates appended delta
    snapshots (manifest path list grows) and a delta commit is smaller
    than the live worklist it replaces."""
    spec = SiteSpec("smriti", "http://sd.example", seed=11, n_seeds=3,
                    branch1=4, branch2=3, politeness_budget=2,
                    delay_request=True)
    eng = CrawlEngine(spark, [spec], tmp_store + "/store", carry_deltas=100)
    eng.run(max_waves=6)
    paths = eng.store.read_manifest()["tables"]["pending"]
    assert len(paths) > 1, "delta mode never appended a delta snapshot"
    # the politeness budget caps per-wave work at 2 URLs while the
    # frontier keeps growing: the resolved live worklist must exceed any
    # single delta's row count by construction
    import pyspark.sql.functions as F  # noqa: F811

    from lyrics_crawler_spark.engine import PENDING_SCHEMA

    last_delta = spark.read.schema(
        PENDING_SCHEMA + ", w int, live boolean"
    ).parquet(paths[-1])
    live = eng._read_worklist("pending", PENDING_SCHEMA)
    assert last_delta.count() < live.count()


def test_delta_mode_politeness_golden(spark, tmp_store):
    """Politeness budget + delta carries combined: the |wave| ≪ |state|
    regime delta mode is DESIGNED for (each wave fetches ≤ budget URLs
    while pending holds the whole discovered frontier — the bench.py
    LCS_BENCH_POLITENESS A/B shape). Golden trace/seen/spans equality
    with mid-crawl compaction."""
    spec = SiteSpec(
        "hindilyrics", "http://pd.example", politeness_budget=2, **SPEC
    )
    assert_golden(spark, [spec], tmp_store, carry_deltas=3)


def test_delta_mode_pipelined_golden(spark, tmp_store):
    """pipeline_commits=True combined with carry_deltas=2: the
    delta-append branch of _carry_paths (the inflight wave's carry
    snapshot overlaid as an APPEND on the committed paths, resolved by
    last-writer-wins) and the mid-flight compaction decision (reading
    the committed manifest while the previous wave is still inflight)
    were untested in isolation golden runs (ADVICE r03). K=2 on a
    >4-wave crawl alternates delta and compact commits while every wave
    reads the previous one's uncommitted carries through the overlay."""
    spec = SiteSpec("hindilyrics", "http://hp.example", **SPEC)
    assert_golden(
        spark, [spec], tmp_store, carry_deltas=2, pipeline_commits=True
    )


def test_delta_mode_pipelined_kill_resume(spark, tmp_store):
    """Kill a pipelined delta-mode run mid-crawl (the inflight wave's
    manifest is published by run()'s finally); resume must converge to
    the uninterrupted run's exact state."""
    spec = SiteSpec("smriti", "http://sp.example", **SPEC)
    full = CrawlEngine(
        spark, [spec], tmp_store + "/full", carry_deltas=2,
        pipeline_commits=True,
    )
    full.run()
    part = CrawlEngine(
        spark, [spec], tmp_store + "/part", carry_deltas=2,
        pipeline_commits=True,
    )
    part.run(max_waves=3)
    resumed = CrawlEngine(
        spark, [spec], tmp_store + "/part", carry_deltas=2,
        pipeline_commits=True,
    )
    resumed.run()

    def state(eng):
        docs = sorted(
            (r.start_url, r.song_url, str(r.spans))
            for r in eng.documents().collect()
        )
        trace = [
            (r.site, r.seq, r.url, r.action, r.n_errors)
            for r in eng.trace().orderBy("site", "seq").collect()
        ]
        return docs, trace

    assert state(full) == state(resumed)


def test_delta_mode_kill_resume_identical(spark, tmp_store):
    """Kill between a compaction and the next one, resume, final state
    equals an uninterrupted delta-mode run AND a replace-mode run."""
    spec = SiteSpec("hindilyrics", "http://hr.example", **SPEC)

    def state(eng):
        docs = sorted(
            (r.start_url, r.song_url, str(r.spans))
            for r in eng.documents().collect()
        )
        trace = [
            (r.site, r.seq, r.url, r.action, r.n_errors)
            for r in eng.trace().orderBy("site", "seq").collect()
        ]
        return docs, trace

    full = CrawlEngine(spark, [spec], tmp_store + "/full", carry_deltas=3)
    full.run()
    replace = CrawlEngine(spark, [spec], tmp_store + "/replace")
    replace.run()

    part = CrawlEngine(spark, [spec], tmp_store + "/part", carry_deltas=3)
    part.run(max_waves=4)  # killed mid-delta-window
    resumed = CrawlEngine(spark, [spec], tmp_store + "/part", carry_deltas=3)
    resumed.run()

    assert state(full) == state(resumed) == state(replace)


def test_delta_mode_all_dialects_recrawl(spark, tmp_store):
    """All five dialects + robots + a second unchanged cycle under delta
    carries: the re-seed resets the carry bases; the second-cycle mass
    skip must still hold."""
    specs = default_specs(seed=77, scale=0.5)
    eng = CrawlEngine(spark, specs, tmp_store + "/s", carry_deltas=2)
    eng.run()
    docs1 = {
        (r.start_url, r.song_url) for r in eng.documents().collect()
    }
    eng.run_cycle()  # unchanged graphs: no new songs anywhere
    docs2 = {
        (r.start_url, r.song_url) for r in eng.documents().collect()
    }
    assert docs1 == docs2
    # cycle-2 touched only non-leaf pages (Type0/1); no Type0/1 leaf
    # re-fetch happened (exists_song skip held through delta carries)
    doc_keys = (
        eng.documents()
        .select("start_url", F.col("song_url").alias("url"), "topology")
        .join(
            eng.site_dim.select(
                "site_id", F.col("site").alias("start_url")
            ),
            "start_url",
        )
    )
    refetched = (
        eng.fetch_log()
        .where(F.col("cycle") == 1)
        .join(doc_keys, ["site_id", "url"])
        .where(F.col("topology").isin(0, 1))
        .count()
    )
    assert refetched == 0
