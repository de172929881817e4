"""Diagnostic: is the crawl's scaling cap shared-disk I/O or per-stage
barrier latency? Runs the identical pinned crawl at 8 and 32 cores with
the snapshot store + spark.local.dir on /tmp (disk) vs /dev/shm (RAM).

If RAM-backed efficiency >> disk-backed efficiency, the shared 733 MB/s
disk is an Amdahl term and the fix is fewer bytes; if both are ~equal,
the cap is stage-count barrier latency and the fix is fewer jobs/stages.

Usage: python scripts/diag_disk.py [scale]
"""
import json
import os
import subprocess
import sys

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0

RUNNER = r"""
import os, json, sys, tempfile
os.environ["SPARK_DRIVER_MEMORY"] = "32g"
base = sys.argv[3]
os.environ["TMPDIR"] = base
tempfile.tempdir = base
from lyrics_crawler_spark.session import get_spark
from bench import run_crawl_bench
cpus = int(sys.argv[1]); scale = float(sys.argv[2])
spark = get_spark(f"diag{cpus}", master=f"local[{cpus}]", shuffle_partitions=32,
                  extra_conf={"spark.local.dir": base})
warmup = run_crawl_bench(spark, 1.0)
r = run_crawl_bench(spark, scale)
print("RESULT " + json.dumps({"cpus": cpus, "base": base, "run": r}))
spark.stop()
"""


def run(cpus: int, base: str) -> dict:
    os.makedirs(base, exist_ok=True)
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", RUNNER,
           str(cpus), str(SCALE), base]
    env = dict(os.environ, LCS_WAVE_TIMING="1")
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    result = None
    for line in out.stdout.splitlines():
        if line.startswith("    ["):  # per-phase wave timings
            print(f"#   {cpus}c {base} {line.strip()}", flush=True)
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    if result is None:
        raise RuntimeError(f"no result ({cpus},{base}): {out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    return result


def main():
    results = {}
    for base in ("/tmp/lcs_diag", "/dev/shm/lcs_diag"):
        for cpus in (8, 32):
            r = run(cpus, base)
            results[f"{base}:{cpus}"] = r["run"]
            print(f"# {base} cpus={cpus}: {r['run']}", flush=True)
        t8 = results[f"{base}:8"]["urls_per_sec"]
        t32 = results[f"{base}:32"]["urls_per_sec"]
        print(f"# {base} eff = {(t32 / t8) / 4:.3f}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
