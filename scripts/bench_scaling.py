"""Scaling-efficiency evidence (BASELINE.json): the identical crawl job on
identical input at local[8] and local[32]. Two runs per JVM — the first
warms JIT/codegen caches, the second is the steady-state measurement a
long-lived cluster would see. Writes BENCH.md and prints one JSON line.

Usage: python scripts/bench_scaling.py [scale]
"""
import json
import os
import subprocess
import sys

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0

RUNNER = r"""
import os, json, sys
os.environ["SPARK_DRIVER_MEMORY"] = "24g"
from lyrics_crawler_spark.session import get_spark
from bench import run_crawl_bench
cpus = int(sys.argv[1]); scale = float(sys.argv[2])
spark = get_spark(f"scal{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
runs = [run_crawl_bench(spark, scale) for _ in range(2)]
print("RESULT " + json.dumps({"cpus": cpus, "runs": runs}))
spark.stop()
"""


def run_level(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cpus), str(SCALE)],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no result from local[{cpus}]: {out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    r8 = run_level(8)
    r32 = run_level(32)
    warm8, warm32 = r8["runs"][-1], r32["runs"][-1]
    thru8, thru32 = warm8["urls_per_sec"], warm32["urls_per_sec"]
    eff = round((thru32 / thru8) / 4.0, 3)
    result = {
        "metric": "crawl throughput scaling, local[8] vs local[32] (N vs 4N)",
        "scale": SCALE,
        "urls": warm8["urls"],
        "cold8": r8["runs"][0], "warm8": warm8,
        "cold32": r32["runs"][0], "warm32": warm32,
        "throughput_8": thru8, "throughput_32": thru32,
        "scaling_efficiency": eff,
    }
    print(json.dumps(result))
    with open("BENCH.md", "w") as f:
        f.write(f"""# BENCH — crawl throughput & scaling evidence

Protocol (BASELINE.md "sandbox evidence protocol"): the identical crawl
job on the identical synthetic input (seeded five-dialect site graph,
ids drawn from the 10^10-URL address space, 16 KB realistic page weight)
run at two parallelism levels. Two runs per JVM; the warm run is the
steady-state number (a long-lived cluster never pays cold JIT costs).

| level | cold run | warm run | warm URLs/s |
|---|---|---|---|
| local[8]  | {r8["runs"][0]["sec"]}s | {warm8["sec"]}s | {thru8} |
| local[32] | {r32["runs"][0]["sec"]}s | {warm32["sec"]}s | {thru32} |

- URLs fetched+parsed per run: **{warm8["urls"]}** (documents merged: {warm8["docs"]})
- scaling efficiency (thru32 / thru8) / 4 = **{eff}**

Per-round relational/dedup/similarity timings: BENCH_r{{N}}.json
(driver-run `bench.py`).
""")


if __name__ == "__main__":
    main()
