"""O3: keep the SnapshotStore ↔ Iceberg mapping honest (VERDICT r02 #10).

The sandbox ships no Iceberg runtime jar, so tables/store.py implements
the same commit model (immutable snapshots + atomic manifest publish)
over bare parquet and documents its 1:1 Iceberg mapping in prose. This
module turns that prose into a runnable check: when an Iceberg
spark-runtime jar IS available, it builds a real Iceberg catalog and
verifies, against live Iceberg semantics, each claim the store makes:

- ``append`` / wave commit  → one Iceberg snapshot per commit, readable
  history (``table.snapshots``);
- read-at-manifest          → time travel (VERSION AS OF) sees exactly
  the committed prefix — later appends are invisible;
- replace-mode carry        → an ``overwritePartitions``/replace commit
  whose read equals the latest write only;
- documents merge-on-read   → MERGE INTO with the associative win rule
  (min (cycle, dfs_key) per key) converges to the same rows as the
  store's delta-log + win-rule-at-read resolution.

Run on a machine with the jar:

    LCS_ICEBERG_JAR=/path/to/iceberg-spark-runtime-4.0_2.13-<v>.jar \
        python -m pytest tests/test_iceberg_mapping.py -x -q

In this sandbox the module SKIPS (documented limitation, SURVEY.md §2
O3); it exists so the mapping claim is testable the day a jar is.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

ICEBERG_JAR = os.environ.get("LCS_ICEBERG_JAR", "")

pytestmark = pytest.mark.skipif(
    not (ICEBERG_JAR and os.path.exists(ICEBERG_JAR)),
    reason="no Iceberg runtime jar in this container "
    "(set LCS_ICEBERG_JAR=/path/to/iceberg-spark-runtime-*.jar)",
)


@pytest.fixture(scope="module")
def iceberg_spark():
    """A dedicated session with the Iceberg catalog wired in — the session
    fixture in conftest.py can't be reused (extensions must be set before
    the JVM starts)."""
    from pyspark.sql import SparkSession

    wh = tempfile.mkdtemp(prefix="lcs_iceberg_wh_")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("lcs-iceberg-smoke")
        .config("spark.jars", ICEBERG_JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.ice.type", "hadoop")
        .config("spark.sql.catalog.ice.warehouse", wh)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield spark
    spark.stop()
    shutil.rmtree(wh, ignore_errors=True)


def test_append_commits_one_snapshot_per_wave(iceberg_spark):
    """store.stage_append + commit_wave ↔ writeTo().append(): each wave is
    exactly one new snapshot, and history length equals committed waves."""
    s = iceberg_spark
    s.sql("DROP TABLE IF EXISTS ice.db.fetch_log")
    s.sql("CREATE TABLE ice.db.fetch_log (wave INT, abs_url STRING, ok BOOLEAN)")
    for wave in range(3):
        s.createDataFrame(
            [(wave, f"http://x/{wave}/{i}", i % 2 == 0) for i in range(4)],
            "wave int, abs_url string, ok boolean",
        ).writeTo("ice.db.fetch_log").append()
    snaps = s.sql("SELECT * FROM ice.db.fetch_log.snapshots").collect()
    assert len(snaps) == 3
    assert s.table("ice.db.fetch_log").count() == 12


def test_time_travel_is_read_at_manifest(iceberg_spark):
    """store.read() at an older manifest ↔ VERSION AS OF: post-commit
    appends are invisible to the older snapshot (crash-safe resume)."""
    s = iceberg_spark
    first = s.sql(
        "SELECT snapshot_id FROM ice.db.fetch_log.snapshots ORDER BY committed_at"
    ).first()["snapshot_id"]
    old = s.sql(f"SELECT * FROM ice.db.fetch_log VERSION AS OF {first}")
    assert old.count() == 4
    assert old.agg({"wave": "max"}).first()[0] == 0


def test_replace_carry_reads_latest_only(iceberg_spark):
    """store.stage_replace (pending/unresolved/leaf_unsaved carries) ↔ a
    replace commit: the read sees only the newest write."""
    s = iceberg_spark
    s.sql("DROP TABLE IF EXISTS ice.db.pending")
    s.sql("CREATE TABLE ice.db.pending (abs_url STRING, n_fail INT)")
    for wave in range(3):
        s.createDataFrame(
            [(f"http://x/{wave}/{i}", wave) for i in range(2 + wave)],
            "abs_url string, n_fail int",
        ).writeTo("ice.db.pending").overwritePartitions()
    rows = s.table("ice.db.pending").collect()
    assert len(rows) == 4 and all(r.n_fail == 2 for r in rows)


def test_merge_into_equals_win_rule_resolution(iceberg_spark):
    """documents MERGE ↔ Iceberg MERGE INTO: applying the win rule
    incrementally via MERGE INTO converges to the same state as the
    store's append-deltas + associative win-rule at read
    (engine._resolve_documents; min (cycle, dfs_key) per key here — the
    Type0/1 rule; Type2's max is the same algebra reversed)."""
    from pyspark.sql import functions as F

    s = iceberg_spark
    s.sql("DROP TABLE IF EXISTS ice.db.documents")
    s.sql(
        "CREATE TABLE ice.db.documents "
        "(start_url STRING, song_url STRING, cycle INT, dfs_key STRING, body STRING)"
    )
    waves = [
        [("a", "/s1", 0, "0002", "w0-s1"), ("a", "/s2", 0, "0005", "w0-s2")],
        [("a", "/s1", 0, "0001", "w1-s1"), ("a", "/s3", 0, "0003", "w1-s3")],
        [("a", "/s2", 1, "0000", "w2-s2")],
    ]
    schema = "start_url string, song_url string, cycle int, dfs_key string, body string"
    deltas = []
    for rows in waves:
        d = s.createDataFrame(rows, schema)
        deltas.append(d)
        d.createOrReplaceTempView("delta")
        s.sql(
            """
            MERGE INTO ice.db.documents t
            USING (SELECT * FROM delta) d
            ON t.start_url = d.start_url AND t.song_url = d.song_url
            WHEN MATCHED AND struct(d.cycle, d.dfs_key) < struct(t.cycle, t.dfs_key)
              THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
            """
        )
    merged = {
        (r.start_url, r.song_url): r.body for r in s.table("ice.db.documents").collect()
    }
    # store-style resolution: union of raw deltas + win rule at read
    log = deltas[0]
    for d in deltas[1:]:
        log = log.unionByName(d)
    winners = (
        log.groupBy("start_url", "song_url")
        .agg(F.min(F.struct("cycle", "dfs_key")).alias("w"))
        .select("start_url", "song_url", "w.cycle", "w.dfs_key")
    )
    resolved = {
        (r.start_url, r.song_url): r.body
        for r in log.join(
            winners, ["start_url", "song_url", "cycle", "dfs_key"], "left_semi"
        ).collect()
    }
    assert merged == resolved == {
        ("a", "/s1"): "w1-s1",
        ("a", "/s2"): "w0-s2",
        ("a", "/s3"): "w1-s3",
    }
