"""Shuffle/IO byte audit of the bench crawl (VERDICT r04 next-round #1
done-metric: "event-log bytes for the widest wave down >= 30%").

Runs the bench.py crawl (identical specs/seed) with the Spark event log
enabled, then sums task-metric byte counters per stage:

- shuffle_write / shuffle_read: bytes through the exchange (the DRAM/
  bandwidth term the 4N scaling gate is starved on),
- input / output: file-source reads + sink writes (parquet snapshots).

Bytes are DETERMINISTIC for a fixed crawl (unlike walls, which drift
±10-25% per window — BENCH.md measurement protocol), so a before/after
pair of this script is a clean A/B for row-width work.

Usage: python scripts/bench_bytes.py [scale] [cpus]   # default 8 32
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main() -> None:
    from parse_eventlog import _iter_lines  # scripts/ sibling

    from bench import crawl_specs
    from lyrics_crawler_spark.engine import CrawlEngine
    from lyrics_crawler_spark.session import get_spark

    evdir = tempfile.mkdtemp(prefix="lcs_ev_")
    store = tempfile.mkdtemp(prefix="lcs_bytes_store_")
    spark = get_spark(
        "bytes-audit",
        master=f"local[{CPUS}]",
        shuffle_partitions=32,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            **json.loads(os.environ.get("LCS_BYTES_CONF", "{}")),
        },
    )
    try:
        eng = CrawlEngine(spark, crawl_specs(SCALE), store)
        t0 = time.time()
        eng.run(max_waves=60)
        wall = time.time() - t0
        urls = eng.fetch_log().count()
    finally:
        spark.stop()  # flushes the event log

    sw = sr = inp = out = 0
    stage_sw: dict[int, int] = {}
    stage_scope: dict[int, str] = {}
    for app in os.listdir(evdir):
        for line in _iter_lines(os.path.join(evdir, app)):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                scopes = []
                for rr in si.get("RDD Info", []):
                    try:
                        nm = json.loads(rr.get("Scope", "{}")).get("name")
                    except json.JSONDecodeError:
                        nm = None
                    if nm and nm not in scopes:
                        scopes.append(nm)
                stage_scope[si["Stage ID"]] = "|".join(scopes[:6])[:90]
                continue
            if e != "SparkListenerTaskEnd":
                continue
            tm = ev.get("Task Metrics") or {}
            w = (tm.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Bytes Written", 0
            )
            r = tm.get("Shuffle Read Metrics") or {}
            sw += w
            sr += r.get("Remote Bytes Read", 0) + r.get("Local Bytes Read", 0)
            inp += (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
            out += (tm.get("Output Metrics") or {}).get("Bytes Written", 0)
            sid = ev["Stage ID"]
            stage_sw[sid] = stage_sw.get(sid, 0) + w
    shutil.rmtree(evdir, ignore_errors=True)
    shutil.rmtree(store, ignore_errors=True)
    for sid, b in sorted(stage_sw.items(), key=lambda kv: -kv[1])[:6]:
        print(f"# stage {sid}: {b/1e6:.1f} MB shuffle-write  "
              f"[{stage_scope.get(sid, '?')}]", file=sys.stderr)
    widest = max(stage_sw.values(), default=0)
    print(json.dumps({
        "scale": SCALE, "cpus": CPUS, "urls": urls,
        "wall_s": round(wall, 1),
        "shuffle_write_mb": round(sw / 1e6, 1),
        "shuffle_read_mb": round(sr / 1e6, 1),
        "input_mb": round(inp / 1e6, 1),
        "output_mb": round(out / 1e6, 1),
        "widest_stage_shuffle_write_mb": round(widest / 1e6, 1),
        "loadavg": os.getloadavg(),
    }))


if __name__ == "__main__":
    main()
