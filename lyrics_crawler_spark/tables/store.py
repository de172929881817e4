"""Snapshot-versioned parquet tables — the checkpoint/lineage substrate.

The design mirrors Apache Iceberg's commit model (manifest file named by an
atomic rename; snapshots are immutable; readers see only committed
snapshots), because this sandbox ships no Iceberg runtime jar. On a real
cluster every call here maps 1:1 onto Iceberg:

- ``append(table, df)``            → ``df.writeTo(table).append()``
- ``commit_wave(...)``             → the wave's Iceberg snapshot-id set
  (Iceberg gives one snapshot per commit; we record one manifest per wave)
- ``read(table)``                  → ``spark.read.table(table)`` at the
  last committed snapshot (time travel = reading an older manifest)
- resume                           → start from the last committed wave
  manifest; snapshot dirs written after it are invisible (crash-safe,
  exactly like Iceberg's orphaned data files before commit).

Tables are append-only logs (frontier enqueues, fetch attempts, parse
results, metrics) — the scale-friendly pattern: a wave never rewrites
history, so commit cost is O(wave), not O(state). Point-in-time state
(pending tasks, URL settlement) is derived relationally. Mutable-looking
sinks (``documents``) use per-wave MERGE implemented as an associative
win-rule (min/max DFS key), so incremental merges converge to the same
state as a single batch merge — which is what makes kill/resume
byte-identical.
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

# process-wide snapshot sequence: staged writes may run on concurrent
# background threads within a wave (engine._stage_append_bg), and a
# millisecond timestamp alone could collide for same-table appends.
_SNAP_SEQ = itertools.count()


class SnapshotStore:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    # ---------------- manifest plumbing ----------------

    def _manifest_path(self) -> str:
        return os.path.join(self.base_dir, "_run_manifest.json")

    def read_manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"wave": -1, "tables": {}, "history": []}
        with open(p) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path())  # atomic commit

    def set_config(self, key: str, value) -> None:
        """Record engine configuration that is part of the store's
        identity (e.g. bloom params) — checked at resume (Iceberg:
        table properties)."""
        m = self.read_manifest()
        m.setdefault("config", {})[key] = value
        self._write_manifest(m)

    def get_config(self, key: str):
        return self.read_manifest().get("config", {}).get(key)

    # ---------------- writes (staged until commit_wave) ----------------

    def alloc_entry(self, table: str, wave: int, mode: str = "append") -> dict:
        """Pre-allocate a snapshot path (so its id can be recorded as
        lineage before the write runs, e.g. on a background thread)."""
        snap_id = (
            f"{wave:05d}-{int(time.time() * 1000) % 100000:05d}-{next(_SNAP_SEQ):04d}"
        )
        path = os.path.join(self.base_dir, table, f"snap-{snap_id}")
        return {"table": table, "path": path, "wave": wave, "mode": mode}

    def write_entry(self, entry: dict, df: DataFrame) -> dict:
        df.write.mode("overwrite").parquet(entry["path"])
        return entry

    def stage_append(self, table: str, df: DataFrame, wave: int) -> dict:
        """Write an immutable snapshot dir for ``table``; it becomes
        visible only when commit_wave() publishes it in the manifest."""
        return self.write_entry(self.alloc_entry(table, wave), df)

    def stage_replace(self, table: str, df: DataFrame, wave: int) -> dict:
        """Full-replace snapshot (used by per-wave MERGE targets)."""
        entry = self.stage_append(table, df, wave)
        entry["mode"] = "replace"
        return entry

    def commit_wave(self, wave: int, staged: list[dict], meta: dict | None = None):
        manifest = self.read_manifest()
        tables = manifest["tables"]
        for entry in staged:
            t = entry["table"]
            if entry["mode"] == "replace":
                tables[t] = [entry["path"]]
            else:
                tables.setdefault(t, []).append(entry["path"])
        manifest["wave"] = wave
        manifest["history"].append(
            {"wave": wave, "paths": [e["path"] for e in staged], "meta": meta or {}}
        )
        self._write_manifest(manifest)

    # ---------------- reads (committed state only) ----------------

    def read(self, table: str) -> DataFrame | None:
        paths = self.read_manifest()["tables"].get(table, [])
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def last_wave(self) -> int:
        return self.read_manifest()["wave"]

    def compact(self, table: str, df: DataFrame, wave: int) -> None:
        """Rewrite a log table into one snapshot (Iceberg: rewrite_data_files)."""
        entry = self.stage_replace(table, df, wave)
        self.commit_wave(wave, [entry], {"compaction": table})

    def destroy(self) -> None:
        shutil.rmtree(self.base_dir, ignore_errors=True)
