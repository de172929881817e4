"""Attribute crawl wall time from a Spark event log: per-stage wall,
task-time sum, scheduling gaps, and the serial (non-overlapped) driver
time between stages. Run a job with
  spark.eventLog.enabled=true spark.eventLog.dir=file:///tmp/lcs_events
then:  python scripts/parse_eventlog.py /tmp/lcs_events/<app-id>

Prints stages sorted by wall descending plus totals:
- stage_wall: completion - submission per stage
- task_sum:   sum of task run times (scalable work)
- gap_total:  app time covered by NO running stage (driver-side serial
  time: AQE planning, job submit, py4j, manifest commits) — the fixed
  term that caps scaling efficiency.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def _iter_lines(path: str):
    """Yield event-log lines from a file or a rolling event-log dir
    (Spark 4 writes events_N_<app>.zstd parts; decompress via pyarrow)."""
    if os.path.isdir(path):
        sub = [f for f in os.listdir(path) if f.startswith("events_")]
        # events_<idx>_<appid>[.codec] — replay in index order
        files = sorted(sub, key=lambda f: int(f.split("_")[1]))
        for f in files:
            yield from _iter_lines(os.path.join(path, f))
        return
    if path.endswith(".zstd"):
        import io

        import pyarrow as pa

        with open(path, "rb") as raw, pa.CompressedInputStream(raw, "zstd") as z:
            yield from io.TextIOWrapper(z, encoding="utf-8")
        return
    with open(path) as f:
        yield from f


def main(path: str) -> None:
    stages = {}
    task_sum = defaultdict(float)
    task_n = defaultdict(int)
    gc_sum = defaultdict(float)
    cpu_sum = defaultdict(float)
    py_sum = defaultdict(float)
    io_sum = defaultdict(float)
    app_start = app_end = None
    if True:
        for line in _iter_lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub and comp:
                    scopes = []
                    for r in si.get("RDD Info", []):
                        try:
                            nm = json.loads(r.get("Scope", "{}")).get("name")
                        except json.JSONDecodeError:
                            nm = None
                        if nm and nm not in scopes:
                            scopes.append(nm)
                    stages[sid] = (sub, comp, "|".join(scopes[:8])[:120],
                                   si.get("Number of Tasks", 0))
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {})
                tm = ev.get("Task Metrics") or {}
                task_sum[sid] += (ti.get("Finish Time", 0) - ti.get("Launch Time", 0))
                task_n[sid] += 1
                gc_sum[sid] += tm.get("JVM GC Time", 0)
                cpu_sum[sid] += tm.get("Executor CPU Time", 0) / 1e6  # ns→ms
                pyt = tm.get("Python Duration", 0)
                py_sum[sid] += pyt if isinstance(pyt, (int, float)) else 0
                inp = tm.get("Input Metrics") or {}
                out = tm.get("Output Metrics") or {}
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                io_sum[sid] += (
                    inp.get("Bytes Read", 0) + out.get("Bytes Written", 0)
                    + sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                    + sw.get("Shuffle Bytes Written", 0)
                )

    ordered = sorted(stages.items(), key=lambda kv: task_sum[kv[0]], reverse=True)
    print(f"{'stage':>6} {'wall_s':>8} {'tasksum_s':>10} {'cpu_s':>8} {'gc_s':>7} "
          f"{'io_MB':>8} {'ntask':>6}  scopes")
    for sid, (sub, comp, name, _nt) in ordered[:30]:
        print(
            f"{sid:>6} {(comp - sub) / 1e3:>8.2f} {task_sum[sid] / 1e3:>10.2f} "
            f"{cpu_sum[sid] / 1e3:>8.1f} {gc_sum[sid] / 1e3:>7.1f} "
            f"{io_sum[sid] / 1e6:>8.1f} {task_n[sid]:>6}  {name}"
        )
    print(f"\nTOTALS: tasksum {sum(task_sum.values())/1e3:.1f}s  "
          f"cpu {sum(cpu_sum.values())/1e3:.1f}s  gc {sum(gc_sum.values())/1e3:.1f}s  "
          f"io {sum(io_sum.values())/1e9:.2f}GB")
    # coverage: merge stage intervals, find gaps
    ivals = sorted((s, c) for s, c, _, _ in stages.values())
    covered = 0
    gap = 0
    cur_s = cur_e = None
    for s, c in ivals:
        if cur_e is None:
            cur_s, cur_e = s, c
        elif s <= cur_e:
            cur_e = max(cur_e, c)
        else:
            covered += cur_e - cur_s
            gap += s - cur_e
            cur_s, cur_e = s, c
    if cur_e is not None:
        covered += cur_e - cur_s
    total_wall = (app_end - app_start) if (app_start and app_end) else None
    print(f"\nstages: {len(stages)}  stage-covered: {covered / 1e3:.1f}s  "
          f"inter-stage gap: {gap / 1e3:.1f}s")
    print(f"task time sum (all stages): {sum(task_sum.values()) / 1e3:.1f}s")
    if total_wall:
        print(f"app wall: {total_wall / 1e3:.1f}s  "
              f"uncovered (incl. gaps): {(total_wall - covered) / 1e3:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1])
