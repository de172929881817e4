"""Structured Streaming over the engine's append-only tables.

The crawl itself is deliberately batch-incremental (SURVEY.md §2.9: exact
LIFO-order replay is provable with deterministic waves, not micro-batch
timing), but the engine's *outputs* are streams: every wave appends
immutable parquet snapshots, which is exactly Spark's file-stream source
contract. This module provides:

- :func:`metrics_stream` — tail the per-wave/per-host metrics table as a
  stream (operational dashboard feed);
- :func:`throughput_by_host` — windowed aggregation with a watermark on
  the ingestion time (late metric files from stragglers are handled);
- :func:`document_stream` — incremental consumer of newly merged
  documents (e.g. to feed a downstream training-data pipeline).

All run with ``trigger(availableNow=True)`` in tests (drain-and-stop),
and unmodified as continuous jobs on a cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "host string, partition_id int, urls_fetched long, errors long, "
    "bytes long, vtime_s double, urls_attempted long, wave int, "
    "snapshot_id string"
)

FETCH_LOG_STREAM_SCHEMA = (
    "site_id int, url string, wave int, attempt int, ok boolean, "
    "bytes long, partition_id int, ua_id int"
)


def metrics_stream(spark: SparkSession, store_dir: str) -> DataFrame:
    path = os.path.join(store_dir, "metrics")
    return (
        spark.readStream.schema(METRICS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(os.path.join(path, "snap-*"))
        .withColumn("ingest_ts", F.current_timestamp())
    )


def throughput_by_host(metrics: DataFrame, window: str = "1 minute") -> DataFrame:
    """Windowed per-host fetch/error rates with a watermark for late
    straggler commits."""
    return (
        metrics.withWatermark("ingest_ts", "2 minutes")
        .groupBy(F.window("ingest_ts", window), F.col("host"))
        .agg(
            F.sum("urls_fetched").alias("urls_fetched"),
            F.sum("errors").alias("errors"),
            F.sum("bytes").alias("bytes"),
            F.max("wave").alias("max_wave"),
        )
    )


def document_stream(spark: SparkSession, store_dir: str) -> DataFrame:
    """Incremental consumer of newly merged documents — the feed a
    downstream training-data pipeline would tail. Stream rows are the
    per-wave MERGE *deltas* (merge-on-read, engine._merge_documents): a
    (start_url, song_url) key may appear more than once across waves or
    re-crawl cycles; win-rule resolution (min/max dfs_key per topology)
    is the batch reader's job (engine.documents()). Downstream consumers
    that need resolved rows either keep per-key latest state themselves
    or periodically re-read the batch view; consumers that only append
    (feature extraction, indexing) take the deltas as-is."""
    from lyrics_crawler_spark.engine import DOCS_SCHEMA

    path = os.path.join(store_dir, "documents")
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(os.path.join(path, "snap-*"))
    )


def run_document_drain(spark: SparkSession, store_dir: str, out_dir: str) -> int:
    """Drain all available document delta snapshots into a parquet sink;
    returns rows processed (test/demo entry). At steady state this runs
    continuously and each wave's commit surfaces one more file batch."""
    from lyrics_crawler_spark.engine import DOCS_SCHEMA

    sink = os.path.join(out_dir, "docs_out")
    q = (
        document_stream(spark, store_dir)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt_docs"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(DOCS_SCHEMA).parquet(sink).count()


def run_metrics_drain(spark: SparkSession, store_dir: str, out_dir: str) -> int:
    """Drain all available metric snapshots through the windowed agg into
    a memory sink; returns rows processed (test/demo entry)."""
    # complete mode: an availableNow drain ends before the watermark can
    # pass the last window, so append mode would emit nothing; a live
    # dashboard run uses append + the watermark to finalize windows.
    q = (
        throughput_by_host(metrics_stream(spark, store_dir))
        .writeStream.format("memory")
        .queryName("host_throughput")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("host_throughput").count()
