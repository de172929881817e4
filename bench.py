"""Benchmark harness. Prints ONE JSON line:

  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "crawl": {"urls": N, "sec": s, "urls_per_sec": r}}

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] width (default 32)
  LCS_BENCH_CRAWL_SCALE  crawl size knob (default 1.0)

The crawl benchmark is the BASELINE.json headline: URLs fetched+parsed
per second over the synthetic frontier (10^10-URL address space), wide
flat waves so the fetch stage dominates. Scaling evidence (local[8] vs
local[32]) is produced by scripts/bench_scaling.py → BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def crawl_specs(scale: float = 1.0, seed: int = 777, pad_kb: int = 16,
                politeness: int | None = None):
    """Wide, flat bench sites: 3 waves deep, fetch+parse-dominated.
    Pages carry `pad_kb` KB of boilerplate (real lyrics pages are
    20-100 KB) and ids live in the same 10^10-URL address space as the
    golden fixture. scale=1.0 ≈ 75k URLs.

    ``politeness`` (per-host per-wave fetch budget) flips the crawl into
    the |wave| ≪ |state| regime: each wave fetches ≤ 3·politeness URLs
    while the pending worklist holds everything already discovered —
    the deep-crawl shape (and the real politeness-bound crawl shape)
    that delta-mode carries are designed for (VERDICT r03 task #2). The
    default (None) keeps the broad-shallow shape where the frontier
    turns over wholly per wave."""
    from lyrics_crawler_spark.sitegen.graph import SiteSpec

    b1 = max(1, int(100 * scale))
    return [
        SiteSpec("hindilyrics", "http://bench-h.example", seed=seed,
                 n_seeds=8, branch1=b1, branch2=40, page_pad_kb=pad_kb,
                 error_rate=0.0, dup_link_rate=0.02, empty_movie_rate=0.02,
                 politeness_budget=politeness),
        SiteSpec("smriti", "http://bench-s.example", seed=seed + 1,
                 n_seeds=8, branch1=b1, branch2=40, page_pad_kb=pad_kb,
                 error_rate=0.0, dup_link_rate=0.02, empty_movie_rate=0.02,
                 politeness_budget=politeness),
        SiteSpec("metrolyrics", "http://bench-m.example", seed=seed + 2,
                 n_seeds=4, branch1=max(1, int(30 * scale)), n_pages=3,
                 songs_per_page=30, page_pad_kb=pad_kb,
                 error_rate=0.0, dup_link_rate=0.02,
                 politeness_budget=politeness),
    ]


def run_crawl_bench(spark, scale: float):
    from lyrics_crawler_spark.engine import CrawlEngine

    # LCS_BENCH_BLOOM=1 runs the crawl with the partitioned bloom
    # URL-seen probe on (the 10^10 design point); default keeps the
    # exact-join fallback so both paths stay measured.
    bloom = os.environ.get("LCS_BENCH_BLOOM", "") == "1"
    # LCS_BENCH_CARRY_DELTAS=K>0 commits per-wave carry deltas instead
    # of rewriting the full worklists (compaction every K waves).
    carry_k = int(os.environ.get("LCS_BENCH_CARRY_DELTAS", "0"))
    # LCS_BENCH_PIPELINE=1 enables cross-wave pipelined commits (wave
    # N's background writes draining behind wave N+1's foreground).
    # Default off: measured 25-58% SLOWER at sandbox scale (BENCH.md
    # "pipelined commits" negative result) — this box is DRAM-bound, so
    # overlap adds contention; the flag exists for real-cluster runs.
    pipeline = os.environ.get("LCS_BENCH_PIPELINE", "0") == "1"
    # LCS_BENCH_POLITENESS=B caps per-host fetches at B per wave — the
    # |wave| ≪ |state| regime where delta carries are designed to win
    # (see crawl_specs docstring). 0/unset keeps the broad-shallow shape.
    politeness = int(os.environ.get("LCS_BENCH_POLITENESS", "0")) or None
    # LCS_BENCH_DISABLE_AQE=1 turns AQE off inside the wave loop.
    # Measured: no effect beyond machine noise (BENCH.md ABBA protocol);
    # default keeps AQE on like every other Spark job.
    aqe_off = os.environ.get("LCS_BENCH_DISABLE_AQE", "0") == "1"
    d = tempfile.mkdtemp(prefix="lcs_bench_")
    try:
        eng = CrawlEngine(
            spark, crawl_specs(scale, politeness=politeness), d, bloom_seen=bloom,
            carry_deltas=carry_k, pipeline_commits=pipeline,
            disable_aqe=aqe_off,
        )
        t0 = time.time()
        # a politeness-budgeted crawl needs total_urls/budget waves, not 3
        eng.run(max_waves=60 if politeness is None else 2000)
        sec = time.time() - t0
        urls = eng.fetch_log().count()
        docs = eng.documents().count()
        return {
            "urls": urls,
            "docs": docs,
            "sec": round(sec, 2),
            "urls_per_sec": round(urls / sec, 1),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    crawl_scale = float(os.environ.get("LCS_BENCH_CRAWL_SCALE", "1.0"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # bench hygiene (VERDICT r02/r03): a loaded machine makes every
    # number noise (r02's driver series was uniformly ~2x slower from a
    # concurrent process; r03's capture shipped with `dirty: true`). A
    # guard that only STAMPS is half a guard — on a loaded start,
    # poll-wait for a quiet window (up to LCS_BENCH_WAIT_MIN minutes,
    # default 10); if none arrives, REFUSE (exit 3) rather than emit a
    # capture that becomes the round's committed evidence.
    # LCS_BENCH_FORCE=1 overrides for debugging (stamped dirty as before).
    wait_min = float(os.environ.get("LCS_BENCH_WAIT_MIN", "10"))
    force = os.environ.get("LCS_BENCH_FORCE", "") == "1"
    deadline = time.time() + wait_min * 60.0
    while os.getloadavg()[0] > 2.0 and time.time() < deadline and not force:
        print(
            f"# loadavg {os.getloadavg()[0]:.2f} > 2 — waiting for a quiet "
            f"window ({int(deadline - time.time())}s left)",
            file=sys.stderr,
        )
        time.sleep(15)
    load_before = tuple(round(x, 2) for x in os.getloadavg())
    dirty = load_before[0] > 2.0
    if dirty and not force:
        print(
            f"# REFUSED: 1-min loadavg {load_before[0]} stayed > 2 for "
            f"{wait_min} min — another process owns this machine; a capture "
            "now would be noise. Re-run when quiet (or LCS_BENCH_FORCE=1).",
            file=sys.stderr,
        )
        sys.exit(3)
    if dirty:
        print(
            f"# WARNING: 1-min loadavg {load_before[0]} > 2 at start "
            "(LCS_BENCH_FORCE) — capture flagged dirty",
            file=sys.stderr,
        )

    from lyrics_crawler_spark.session import get_spark

    spark = get_spark("lcs-bench", master=f"local[{cpus}]")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    headline = [
        "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_jaccard",
        "dedup_lsh_pairs", "dedup_clusters", "explode_tokens", "cosine_topk",
        "ann_lsh", "ann_ivf", "embedding_neardup", "langid", "quality",
        "repetition", "token_stats", "topk_per_type", "anti_join_unseen",
        "upsert_last_wins", "fingerprints",
    ]
    times = {}
    total = 0.0
    for name in headline:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s rows={n}", file=sys.stderr)

    crawl = run_crawl_bench(spark, crawl_scale)
    times["crawl_full_run"] = crawl["sec"]
    total += crawl["sec"]
    print(f"# crawl: {crawl}", file=sys.stderr)

    out = {
        "metric": (
            f"headline suite wall time ({len(headline)} relational/dedup/"
            "similarity queries at sf + full synthetic crawl to frontier "
            "exhaustion)"
        ),
        "value": round(total, 2),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "crawl": crawl,
        "cpus": cpus,
        "loadavg_before": list(load_before),
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        "dirty": dirty,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
