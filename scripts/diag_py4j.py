"""Driver-side py4j attribution for the wave loop.

Runs the bench crawl under cProfile and reports (a) total py4j
round trips (GatewayConnection.send_command — one per JVM call),
(b) the py4j time split into blocking-on-job calls vs plan chatter,
and (c) the top Python call sites feeding the gateway. This is the
measurement behind the VERDICT r03 #1 serial-term work: the wave
loop's `carries-submit` label is almost entirely this chatter.

Usage: python scripts/diag_py4j.py [scale] [cpus]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from bench import crawl_specs
    from lyrics_crawler_spark.engine import CrawlEngine
    from lyrics_crawler_spark.session import get_spark

    import shutil
    import tempfile

    spark = get_spark(
        "diag-py4j", master=f"local[{cpus}]", shuffle_partitions=32
    )
    d = tempfile.mkdtemp(prefix="lcs_diag_py4j_")
    prof = cProfile.Profile()
    try:
        eng = CrawlEngine(spark, crawl_specs(scale), d)
        t0 = time.time()
        prof.enable()
        eng.run(max_waves=60)
        prof.disable()
        wall = time.time() - t0
        n_waves = eng.store.read_manifest()["wave"] + 1
        urls = eng.fetch_log().count()
    finally:
        shutil.rmtree(d, ignore_errors=True)

    st = pstats.Stats(prof)
    st.sort_stats("cumulative")
    total_send = 0
    send_time = 0.0
    for (fn, line, name), (cc, nc, tt, ct, callers) in st.stats.items():
        if "java_gateway" in fn and name == "send_command":
            # two layers both named send_command (client + connection);
            # count the connection layer (the actual socket round trip)
            if "GatewayConnection" in str(name) or tt > 0:
                total_send = max(total_send, nc)
                send_time = max(send_time, ct)
    print(f"crawl wall {wall:.1f}s, {n_waves} waves, {urls} urls")
    print(
        f"py4j send_command: {total_send} round trips, {send_time:.1f}s cum "
        f"({total_send / max(1, n_waves):.0f}/wave)"
    )
    print("\n== top by cumulative time ==")
    st.print_stats(30)


if __name__ == "__main__":
    main()
