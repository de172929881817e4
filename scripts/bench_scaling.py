"""Scaling-efficiency evidence (BASELINE.json): the identical crawl job on
identical input at local[8] and local[32] (N vs 4N cores).

Protocol details:
- the measured input is LARGE (default scale 20 ≈ 1.5M URLs) so the run
  sits in the compute-dominated regime a 10^10-URL frontier lives in —
  per-wave driver latency (~constant in input size) is amortized exactly
  as it would be on a real cluster's giant waves;
- each JVM first runs a small scale-1 crawl to warm JIT/codegen caches
  (a long-lived cluster never pays cold-JIT costs), then the measured run;
- BOTH levels use the same shuffle partitioning (32) — the job is
  byte-identical; only the executor thread count differs, which is what
  "N vs 4N executors" means on a cluster.

Usage: python scripts/bench_scaling.py [scale]   # writes BENCH.md
"""
import json
import os
import subprocess
import sys

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0

RUNNER = r"""
import os, json, sys
os.environ["SPARK_DRIVER_MEMORY"] = "24g"
from lyrics_crawler_spark.session import get_spark
from bench import run_crawl_bench
cpus = int(sys.argv[1]); scale = float(sys.argv[2])
spark = get_spark(f"scal{cpus}", master=f"local[{cpus}]", shuffle_partitions=32)
warmup = run_crawl_bench(spark, 1.0)
measured = run_crawl_bench(spark, scale)
print("RESULT " + json.dumps({"cpus": cpus, "warmup": warmup, "measured": measured}))
spark.stop()
"""


def run_level(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cpus), str(SCALE)],
        capture_output=True, text=True,
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
        "metric": "crawl throughput scaling, local[8] vs local[32] (N vs 4N)",
        "scale": SCALE,
        "urls": m8["urls"],
        "measured8": m8, "measured32": m32,
        "throughput_8": thru8, "throughput_32": thru32,
        "scaling_efficiency": eff,
    }
    print(json.dumps(result))
    with open("BENCH.md", "w") as f:
        f.write(f"""# BENCH — crawl throughput & scaling evidence

Protocol (BASELINE.md "sandbox evidence protocol"): the identical crawl
job on the identical synthetic input (seeded five-dialect site graph,
ids drawn from the 10^10-URL address space, 16 KB realistic page weight,
{m8["urls"]:,} URLs) run at two parallelism levels with identical shuffle
partitioning (32) — only the executor thread count differs, which is what
N vs 4N executors means on a cluster. Each JVM runs a small scale-1 crawl
first to warm JIT/codegen caches (a long-lived cluster never pays cold-JIT
costs); the measured run follows.

| level | wall | URLs/s |
|---|---|---|
| local[8]  (N)  | {m8["sec"]}s | {thru8} |
| local[32] (4N) | {m32["sec"]}s | {thru32} |

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
