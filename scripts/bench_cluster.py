"""Scaling evidence on a REAL multi-executor cluster: Spark standalone on
localhost, N vs 4N executors (1 worker × 7 cores vs 4 workers × 7 cores).

Why this instead of local[N] (scripts/bench_scaling.py keeps that as the
single-JVM variant): the north rule's unit of scaling is the *executor*.
``local[32]`` funnels 32 task threads through ONE JVM — one BlockManager,
one memory manager, one shuffle writer — a contention regime no real
cluster has (measured: tasks off-CPU 75% of their runtime at 32 threads,
vs ~1060 URLs/s/core at 8 threads). A standalone cluster on the same
machine gives every executor its own 7-thread JVM exactly like a
production deployment; executors exchange shuffle blocks over local TCP.

Honesty knobs:
- each worker's process tree (worker JVM → executor JVM → Arrow python
  workers) is pinned with ``taskset`` to its own 7-core set, so the 4N
  level really owns 28 cores and the N level really owns 7;
- **the driver + master are pinned to their own 4-core set at BOTH
  levels** — on a real cluster the driver runs on its own node; leaving
  it unpinned let it borrow the 24 idle cores at the N level while
  fighting the executors for CPU at the 4N level, which deflated the
  measured efficiency by construction (round-3 finding: the unpinned-
  driver protocol measured the 4N level's background writes SLOWER in
  absolute terms than the N level's);
- the application code ships to executors via a --py-files zip (the
  north rule's deployment mode), not via a shared PYTHONPATH;
- same input, same shuffle partitioning (32) at both levels; each level
  warms JIT with a scale-1 crawl, then runs the measured job twice and
  reports the better run (steady state).

Usage: python scripts/bench_cluster.py [scale]    # writes BENCH.md
"""

from __future__ import annotations

import json
import os
import shutil
import socket
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = "/opt/spark"
MASTER_URL = "spark://127.0.0.1:7077"
SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 40.0
WORK = "/tmp/lcs_cluster"
EXEC_CORES = 7          # per-executor task slots
DRIVER_PIN = "28-31"    # driver + master own these cores at BOTH levels
# Per-executor heap — IDENTICAL at both levels (a real cluster's nodes
# are homogeneous). 12g default: with Xms=Xmx + AlwaysPreTouch, the 4N
# level's 4 heaps go fully resident at launch; 4×20g + 16g driver left
# only ~30 GB for page cache on this 128 GB box and the second 4N run
# measured 429 s vs 109 s (reclaim stalls against run 1's dirty
# writeback). 4×12g + driver = 64 GB resident keeps steady headroom.
EXEC_MEM_GB = int(os.environ.get("LCS_CLUSTER_EXEC_MEM_GB", "12"))


def wait_workers(n: int, timeout: float = 90.0) -> None:
    """Poll the master's JSON endpoint until n workers are ALIVE — a
    fixed sleep can let the runner submit before every worker attaches,
    silently running on fewer executors (ADVICE r01)."""
    import urllib.request

    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with urllib.request.urlopen("http://127.0.0.1:42099/json", timeout=5) as r:
                d = json.load(r)
            alive = sum(1 for w in d.get("workers", []) if w.get("state") == "ALIVE")
            if alive >= n:
                return
        except Exception:
            pass
        time.sleep(0.5)
    raise RuntimeError(f"{n} workers never registered with the master")


def wait_port(port: int, timeout: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        with socket.socket() as s:
            if s.connect_ex(("127.0.0.1", port)) == 0:
                return
        time.sleep(0.5)
    raise RuntimeError(f"port {port} never opened")


def spark_class(cls: str, *args: str, pin: str | None = None,
                log: str = "/dev/null") -> subprocess.Popen:
    cmd = [f"{SPARK_HOME}/bin/spark-class", cls, *args]
    if pin:
        cmd = ["taskset", "-c", pin] + cmd
    env = dict(os.environ, SPARK_HOME=SPARK_HOME,
               SPARK_LOG_DIR=WORK, SPARK_NO_DAEMONIZE="1")
    return subprocess.Popen(cmd, stdout=open(log, "w"),
                            stderr=subprocess.STDOUT, env=env)


def build_pyfiles_zip() -> str:
    """The --py-files artifact: the whole package + bench module."""
    path = os.path.join(WORK, "lcs.zip")
    with zipfile.ZipFile(path, "w") as z:
        for root, _, files in os.walk(os.path.join(REPO, "lyrics_crawler_spark")):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
        z.write(os.path.join(REPO, "bench.py"), "bench.py")
    return path


RUNNER = r"""
import json, os, sys
sys.path.insert(0, sys.argv[4])  # driver-side import of the zip
from lyrics_crawler_spark.session import get_spark
from bench import run_crawl_bench
cores_max = int(sys.argv[1]); scale = float(sys.argv[2]); zip_path = sys.argv[4]
# LCS_CLUSTER_EXTRA_CONF="k=v;k=v" for protocol experiments (e.g. AQE)
extra = dict(
    kv.split("=", 1)
    for kv in os.environ.get("LCS_CLUSTER_EXTRA_CONF", "").split(";")
    if kv
)
spark = get_spark(
    f"lcs-cluster-{cores_max}",
    master=sys.argv[3],
    shuffle_partitions=32,
    extra_conf={
        "spark.cores.max": str(cores_max),
        "spark.executor.cores": "7",
        "spark.executor.memory": os.environ["LCS_EXEC_MEM"],
        # production-standard fixed pre-touched heaps (Xms=Xmx +
        # AlwaysPreTouch): every heap page is faulted once at executor
        # launch instead of continuously during the run. Measured on the
        # 4-way independent-process control: sys 12.4 -> 5.4 cores,
        # steal 5.8 -> 1.4 (BENCH.md "platform ceiling") — page-fault
        # churn on this VM's shared kernel is the dominant scaling tax.
        "spark.executor.extraJavaOptions":
            "-XX:+UseParallelGC -Xms%s -XX:+AlwaysPreTouch"
            % os.environ["LCS_EXEC_MEM"],
        "spark.submit.pyFiles": zip_path,   # --py-files equivalent
        "spark.pyspark.python": sys.executable,
        **extra,
    },
)
spark.sparkContext.addPyFile(zip_path)
# assert the app actually owns cores_max cores (all workers attached);
# a missing worker would deflate the scaling number silently. Poll the
# master's JSON endpoint for the app's granted cores — NOT
# defaultParallelism, which session.py pins to the shuffle width (32)
# regardless of executors.
import time, urllib.request
granted = -1
app_id = spark.sparkContext.applicationId
for _ in range(120):
    try:
        with urllib.request.urlopen("http://127.0.0.1:42099/json", timeout=5) as r:
            d = json.load(r)
        apps = [a for a in d.get("activeapps", []) if a.get("id") == app_id]
        granted = apps[0].get("cores", -1) if apps else -1
        if granted == cores_max:
            break
    except Exception:
        pass
    time.sleep(0.5)
assert granted == cores_max, f"granted cores {granted} != requested {cores_max}"
# warm on a smaller-but-real crawl; big measured inputs get ONE run
# (JIT is path-warm after the warmup; >=2 runs at huge scale would
# double an already-long protocol for a ~10% tighter number)
warmup = run_crawl_bench(spark, min(4.0, scale / 4.0))
n_runs = 1 if scale >= 100 else 2
runs = [run_crawl_bench(spark, scale) for _ in range(n_runs)]
best = min(runs, key=lambda r: r["sec"])
print("RESULT " + json.dumps({"cores": cores_max, "warmup": warmup,
                              "runs": runs, "measured": best}))
spark.stop()
"""


def run_level(n_workers: int, zip_path: str) -> dict:
    workers = []
    for i in range(n_workers):
        pin = f"{EXEC_CORES * i}-{EXEC_CORES * i + EXEC_CORES - 1}"
        workers.append(spark_class(
            "org.apache.spark.deploy.worker.Worker", MASTER_URL,
            "--cores", str(EXEC_CORES), "--memory", f"{EXEC_MEM_GB + 2}g",
            "--port", str(41000 + i), "--webui-port", str(42000 + i),
            "--work-dir", os.path.join(WORK, f"worker{i}"),
            pin=pin, log=os.path.join(WORK, f"worker{i}.log"),
        ))
    wait_workers(n_workers)
    try:
        env = dict(os.environ, SPARK_DRIVER_MEMORY="16g",
                   LCS_EXEC_MEM=f"{EXEC_MEM_GB}g")
        out = subprocess.run(
            ["taskset", "-c", DRIVER_PIN,
             sys.executable, "-c", RUNNER, str(EXEC_CORES * n_workers),
             str(SCALE), MASTER_URL, zip_path],
            capture_output=True, text=True, cwd=REPO, env=env,
        )
        # keep the runner's stdout (e.g. LCS_WAVE_TIMING labels) for
        # post-hoc serial-term attribution
        with open(os.path.join(WORK, f"runner_{n_workers}w.log"), "w") as f:
            f.write(out.stdout)
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        raise RuntimeError(
            f"no result ({n_workers} workers): {out.stdout[-3000:]}\n{out.stderr[-3000:]}"
        )
    finally:
        for w in workers:
            w.terminate()
        for w in workers:
            try:
                w.wait(timeout=10)
            except subprocess.TimeoutExpired:
                w.kill()


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    zip_path = build_pyfiles_zip()
    master = spark_class(
        "org.apache.spark.deploy.master.Master",
        "--host", "127.0.0.1", "--port", "7077", "--webui-port", "42099",
        pin=DRIVER_PIN, log=os.path.join(WORK, "master.log"),
    )
    # LCS_CLUSTER_LEVELS="1,2" runs a different executor-count pair —
    # used for the 2-way control (this box's 2-way independent-process
    # ceiling is 0.90 vs 0.33 at 4-way, BENCH.md "platform ceiling"; a
    # 1-vs-2-executor point separates engine coordination cost from the
    # box's 4-way DRAM collapse). BENCH.md's headline block is only
    # rewritten for the canonical (1, 4) north-rule pair.
    levels = os.environ.get("LCS_CLUSTER_LEVELS", "1,4").split(",")
    # validate BEFORE the 40+ min runs start: '0,4' used to die in the
    # efficiency division only after both full runs; '4,1' silently
    # produced a nonsense ratio; 3 values raised an opaque unpack error
    # (ADVICE r04).
    if len(levels) != 2:
        raise SystemExit(f"LCS_CLUSTER_LEVELS needs exactly 2 values, got {levels}")
    lo, hi = (int(x) for x in levels)
    if not 0 < lo < hi:
        raise SystemExit(
            f"LCS_CLUSTER_LEVELS must be 0 < lo < hi, got lo={lo} hi={hi}"
        )
    try:
        wait_port(7077)
        r1 = run_level(lo, zip_path)
        r4 = run_level(hi, zip_path)
    finally:
        master.terminate()
    m1, m4 = r1["measured"], r4["measured"]
    thru1, thru4 = m1["urls_per_sec"], m4["urls_per_sec"]
    eff = round((thru4 / thru1) / (hi / lo), 3)
    # keys derived from the actual levels so a 2-way control run can
    # never be read as a 4N claim (ADVICE r04)
    print(json.dumps({
        "metric": f"crawl throughput scaling, {lo} vs {hi} executors ({EXEC_CORES} cores each, pinned; driver isolated)",
        "scale": SCALE, "urls": m1["urls"], "levels": [lo, hi],
        f"runs_{lo}exec": r1["runs"], f"runs_{hi}exec": r4["runs"],
        f"throughput_{lo}exec": thru1, f"throughput_{hi}exec": thru4,
        "scaling_efficiency": eff,
    }))
    if (lo, hi) != (1, 4):
        return
    block = f"""<!-- BEGIN bench_cluster (auto-generated by scripts/bench_cluster.py) -->
Protocol (BASELINE.md "sandbox evidence protocol", north rule "N and 4N
executors"): the identical crawl job on identical synthetic input
(seeded five-dialect site graph, ids drawn from the 10^10-URL address
space, 16 KB realistic page weight, {m1["urls"]:,} URLs) on a **real
multi-executor Spark standalone cluster** on this machine — N = 1
executor × {EXEC_CORES} cores vs 4N = 4 executors × {EXEC_CORES} cores,
every worker's whole process tree (worker JVM → executor JVM → Arrow
python workers) pinned with `taskset` to its own {EXEC_CORES}-core set,
and the **driver + master pinned to their own 4-core set at both
levels** (a real cluster runs the driver on its own node; an unpinned
driver borrows idle cores at N and fights executors at 4N, deflating
the ratio by construction). Application code ships to executors via a
`--py-files` zip. Each level warms JIT on a smaller crawl first (a
long-lived cluster never pays cold-JIT costs). Shuffle partitioning
(32) and the per-executor heap ({EXEC_MEM_GB} GB fixed, pre-touched)
are identical at both levels.

| level | runs | best wall | URLs/s |
|---|---|---|---|
| 1 executor × {EXEC_CORES} cores (N) | {", ".join(str(r["sec"]) + "s" for r in r1["runs"])} | {m1["sec"]}s | {thru1} |
| 4 executors × {EXEC_CORES} cores (4N) | {", ".join(str(r["sec"]) + "s" for r in r4["runs"])} | {m4["sec"]}s | {thru4} |

- URLs fetched+parsed per run: **{m1["urls"]:,}** (documents merged: {m1["docs"]:,})
- scaling efficiency (thru@4N / thru@N) / 4 = **{eff}** (target ≥ 0.8)
- **single draw** — this box's 4N aggregate carries up to 1.66× same-night
  window variance while N draws stay within 7%; read this number only
  next to the "Efficiency vs scale" replicate table and the platform
  ceiling control below.
<!-- END bench_cluster -->"""
    path = os.path.join(REPO, "BENCH.md")
    begin, end = "<!-- BEGIN bench_cluster", "<!-- END bench_cluster -->"
    if os.path.exists(path):
        cur = open(path).read()
        if begin in cur and end in cur:
            pre = cur[: cur.index(begin)]
            post = cur[cur.index(end) + len(end):]
            out = pre + block + post
        else:
            out = cur.rstrip() + "\n\n## Cluster scaling (generated)\n\n" + block + "\n"
    else:
        out = "# BENCH — crawl throughput & scaling evidence\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(out)


if __name__ == "__main__":
    main()
