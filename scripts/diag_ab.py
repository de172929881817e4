"""Quick A/B harness for crawl-scaling experiments: run the bench crawl
once (after a scale-1 warmup) at a given core count and scale, pinned
with taskset, with arbitrary Spark conf overrides; print wall + URLs/s.

Usage:
  python scripts/diag_ab.py SCALE CPUS [key=value ...]
e.g.
  python scripts/diag_ab.py 4 8 spark.sql.adaptive.enabled=false
  python scripts/diag_ab.py 4 32 base=/dev/shm/lcs_ab

Special key: base=<dir> — snapshot store + spark.local.dir location
(default /tmp/lcs_ab).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SCALE = float(sys.argv[1])
CPUS = int(sys.argv[2])
EXTRA = dict(kv.split("=", 1) for kv in sys.argv[3:])
BASE = EXTRA.pop("base", "/tmp/lcs_ab")

RUNNER = r"""
import os, json, sys, tempfile
os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
conf = json.loads(sys.argv[3])
base = conf.pop("__base__")
os.makedirs(base, exist_ok=True)
os.environ["TMPDIR"] = base
tempfile.tempdir = base
from lyrics_crawler_spark.session import get_spark
from bench import run_crawl_bench
cpus = int(sys.argv[1]); scale = float(sys.argv[2])
spark = get_spark(f"ab{cpus}", master=f"local[{cpus}]", shuffle_partitions=32,
                  extra_conf={"spark.local.dir": base, **conf})
# LCS_AB_WARM_SCALE overrides the JIT-warmup crawl's scale (default:
# min(1, scale)). Needed for slow-by-construction regimes (politeness-
# budgeted waves) where a full-scale warmup would double every arm of
# an A/B series; both arms must use the SAME value.
warm_scale = float(os.environ.get("LCS_AB_WARM_SCALE", str(min(1.0, scale))))
warmup = run_crawl_bench(spark, warm_scale)
r = run_crawl_bench(spark, scale)
print("RESULT " + json.dumps({"cpus": cpus, "conf": conf, "run": r}))
spark.stop()
"""


def main() -> None:
    conf = dict(EXTRA)
    conf["__base__"] = BASE
    # LCS_AB_PIN overrides the core set (default 0..CPUS-1) so several
    # independent runs can own disjoint sets (hardware-ceiling probes)
    pin = os.environ.get("LCS_AB_PIN", f"0-{CPUS - 1}")
    cmd = [
        "taskset", "-c", pin, sys.executable, "-c", RUNNER,
        str(CPUS), str(SCALE), json.dumps(conf),
    ]
    env = dict(os.environ, LCS_WAVE_TIMING=os.environ.get("LCS_WAVE_TIMING", "0"))
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    for line in out.stdout.splitlines():
        if line.startswith("    [") or line.startswith("RESULT "):
            print(line, flush=True)
    if "RESULT " not in out.stdout:
        print(out.stdout[-2000:])
        print(out.stderr[-2000:])
        sys.exit(1)


if __name__ == "__main__":
    main()
