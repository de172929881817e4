"""SparkSession factory tuned for the crawl engine.

Local-mode defaults follow the public PySpark guidance: shuffle
partitions ≈ cores (not 200), AQE on for runtime re-planning and skew
handling, Arrow on for every pandas-UDF boundary, UTC session timezone
so DuckDB oracle comparisons are stable.

On a real cluster the same builder is used via ``spark-submit
--py-files``; only ``master`` and the memory knobs change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lyrics_crawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # master="" → don't set a master at all: spark-submit provides it
    # (scripts/submit_crawl.py). Any other None → local[cpus].
    if master is None:
        master = f"local[{cpus}]"
    # local[N] → match shuffle width to N; cluster → caller sets it.
    if shuffle_partitions is None:
        if master.startswith("local["):
            n = master[len("local[") : -1]
            shuffle_partitions = cpus if n == "*" else int(n)
        else:
            shuffle_partitions = 200

    builder = SparkSession.builder
    if master:
        builder = builder.master(master)
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # auto-broadcast OFF: parquet size stats under-estimate the parsed
        # page log (lyrics/children payloads), so Spark would build serial
        # driver-side broadcasts of fact tables. Dimension tables (sites,
        # robots) are broadcast explicitly with F.broadcast().
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # throughput-batch GC: G1 collapses under 32 allocation-heavy
        # task threads (Arrow batches are humongous allocations for G1's
        # default region size — measured 138s of GC in one stage);
        # ParallelGC cut the local[32] crawl wall 142s → 103s.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        # codec audit (round 5, scripts/bench_bytes.py at crawl scale 8):
        # zstd on shuffle + parquet cuts shuffle-write bytes 44.5%
        # (420.2 -> 233.1 MB), the widest-stage shuffle 46.6% and sink
        # output 33% at identical row counts, wall-neutral at N on this
        # box — and bytes through the one DRAM bus are exactly the 4N
        # starvation term (BENCH.md platform ceiling). Override via
        # LCS_IO_CODEC / LCS_PARQUET_CODEC.
        .config(
            "spark.io.compression.codec",
            os.environ.get("LCS_IO_CODEC", "zstd"),
        )
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("LCS_PARQUET_CODEC", "zstd"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
