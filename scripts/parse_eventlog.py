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


def main(path: str) -> None:
    if os.path.isdir(path):
        files = [os.path.join(path, f) for f in os.listdir(path)]
        path = max(files, key=os.path.getmtime)
    stages = {}
    task_sum = defaultdict(float)
    task_n = defaultdict(int)
    app_start = app_end = None
    with open(path) as f:
        for line in f:
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
                    stages[sid] = (sub, comp, si.get("Stage Name", "?")[:80],
                                   si.get("Number of Tasks", 0))
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {})
                task_sum[sid] += (ti.get("Finish Time", 0) - ti.get("Launch Time", 0))
                task_n[sid] += 1

    ordered = sorted(stages.items(), key=lambda kv: kv[1][1] - kv[1][0], reverse=True)
    print(f"{'stage':>6} {'wall_s':>8} {'tasksum_s':>10} {'ntask':>6}  name")
    for sid, (sub, comp, name, _nt) in ordered[:25]:
        print(
            f"{sid:>6} {(comp - sub) / 1e3:>8.2f} {task_sum[sid] / 1e3:>10.2f} "
            f"{task_n[sid]:>6}  {name}"
        )
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
