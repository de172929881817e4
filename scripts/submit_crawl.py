"""spark-submit entry point for the crawl engine (north-rule run mode).

On a cluster:

    zip -r lcs.zip lyrics_crawler_spark/
    spark-submit --py-files lcs.zip \\
        --master <cluster-master> \\
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \\
        scripts/submit_crawl.py \\
        --store hdfs:///crawls/run1 --sites sites.json --resume

Locally (the sandbox evidence protocol, N vs 4N cores):

    spark-submit --master local[8]  scripts/submit_crawl.py --store /tmp/c8  --scale 2
    spark-submit --master local[32] scripts/submit_crawl.py --store /tmp/c32 --scale 2

The session comes from ``SparkSession.builder.getOrCreate()`` so every
``--master``/``--conf`` passed to spark-submit is honored; the engine
itself is master-agnostic (same DataFrame plans at any executor count).
``--resume`` is the default behavior: the snapshot store restarts from
the last committed wave manifest, so re-submitting a killed job
continues byte-identically (tests/test_resume_politeness.py).

``--sites`` JSON: a list of SiteSpec field dicts, e.g.
``[{"dialect": "hindilyrics", "start_url": "http://h.example",
"seed": 7, "n_seeds": 4, "branch1": 50, "branch2": 20}]``.
Without it, ``--scale`` runs the synthetic bench sites (bench.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="run the wave-loop crawl engine")
    ap.add_argument("--store", required=True, help="snapshot store directory")
    ap.add_argument("--sites", help="JSON file of SiteSpec dicts")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="synthetic bench-site scale when --sites is absent")
    ap.add_argument("--max-waves", type=int, default=None)
    ap.add_argument("--fetch-partitions", type=int, default=None)
    ap.add_argument("--bloom-seen", action="store_true",
                    help="enable the partitioned bloom URL-seen pre-filter")
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="override spark.sql.shuffle.partitions")
    args = ap.parse_args(argv)

    # master="" → spark-submit's --master/--conf are honored, but the
    # engine's required configs (ParallelGC, autoBroadcastJoinThreshold
    # off, AQE, UTC, Arrow) still apply via the shared builder
    # (ADVICE r01: a bare SparkSession silently missed all of them).
    from lyrics_crawler_spark.session import get_spark

    spark = get_spark(
        "lcs-crawl",
        master="",
        shuffle_partitions=args.shuffle_partitions or 32,
    )

    from lyrics_crawler_spark.engine import CrawlEngine
    from lyrics_crawler_spark.sitegen.graph import SiteSpec

    if args.sites:
        with open(args.sites) as f:
            specs = [SiteSpec(**d) for d in json.load(f)]
    else:
        from bench import crawl_specs

        specs = crawl_specs(args.scale)

    eng = CrawlEngine(
        spark, specs, args.store,
        fetch_partitions=args.fetch_partitions,
        bloom_seen=args.bloom_seen,
    )
    t0 = time.time()
    final_wave = eng.run(max_waves=args.max_waves)
    sec = time.time() - t0
    urls = eng.fetch_log().count()
    docs = eng.documents().count() if eng.documents() is not None else 0
    print(json.dumps({
        "final_wave": final_wave,
        "urls_fetched": urls,
        "documents": docs,
        "sec": round(sec, 2),
        "urls_per_sec": round(urls / sec, 1) if sec > 0 else None,
        "store": args.store,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
