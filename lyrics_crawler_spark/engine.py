"""The wave-loop crawl engine — Spark-native replacement for the
reference's thread/queue machinery (base_crawler.py:45-145 and twins).

Execution model (SURVEY.md §3.1 "Spark lifecycle equivalent"):

    while pending work:
        1. read the `pending` carry table (the frontier worklist: one
           pre-aggregated row per live URL) and pick this wave's fetch
           set: per-site minimum pending depth (BSP frontier expansion),
           per-host politeness budget top-k
        2. one Arrow-batched fetch+parse pass (mapInPandas) → fetch_log
        3. resolve non-leaf occurrences off the `unresolved` carry (F2
           dispatch + the movie count-equality skip D2), explode
           children with robots anti-join + LIFO rank keys
        4. background: metrics, bloom delta, resolved log, documents
           MERGE deltas, and the three carry-table updates
        5. commit one snapshot manifest (checkpoint; resume-safe)

Steps 1-3 are the only foreground jobs (TWO writes per wave); step 4
overlaps them on a thread pool. Every step touches O(|pending|+|wave|)
rows — the full history logs are read only by the kid URL-seen probe
(bloom-pruned when `bloom_seen`, one slim aggregate otherwise) and by
broadcast-filtered lookups for rare late-resolution rows.

Why waves reproduce the single-threaded LIFO trace exactly:

- Page content is a pure function of URL, so *who* fetches is free; the
  trace is a deterministic function of (occurrence keys, per-URL failure
  counts, skip rules), assembled relationally by :meth:`trace`.
- Expansion of non-leaf pages never depends on crawl state in the
  reference (no dedup for index/artist/page tasks) — except Type0's
  movie skip (base_crawler.py:160-172), which only *suppresses*
  duplicate movies; the engine defers exactly those duplicate-movie
  decisions until their songs' fates are settled — the same information
  the sequential oracle had when that duplicate popped (the expander's
  whole subtree precedes it in LIFO order).
- Leaf actions (fetched vs skipped_seen) depend only on which occurrence
  holds the minimum DFS key — a window function, not a sequential scan.
- A task dead-letters after max_err failed pops + one budget-check pop
  (base_crawler.py:55-62); failures are deterministic per URL, so each
  occurrence's retry ladder is reconstructed relationally.

Scale notes (the 10^10-frontier design):
- history tables are append-only logs (O(wave) commit, never O(state));
  the documents MERGE is merge-on-read deltas + an associative win rule
  (Iceberg: MERGE INTO with row deltas); the three carry tables
  (pending / unresolved / leaf_unsaved) are replace-mode snapshots
  sized O(live work), reconstructible from the logs (Iceberg: MERGE
  targets);
- the URL-seen structure is the partitioned bloom (operators/urlseen):
  new kid URLs that provably were never attempted skip history entirely;
  only the maybe-seen remainder pays a pre-filtered history scan;
- site/robots dimensions are broadcast joins; per-host politeness
  windows run only for capped hosts (uncapped hosts never shuffle);
- the fetch stage repartitions by URL hash (domain-salted spread,
  north-rule axis B) so one giant host cannot pin a partition.
"""

from __future__ import annotations

import os
import time

_TIMING = os.environ.get("LCS_WAVE_TIMING", "") == "1"


def _tick(label: str, t0: float) -> float:
    t = time.time()
    if _TIMING:
        print(f"    [{label}] {t - t0:.2f}s", flush=True)
    return t

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from lyrics_crawler_spark.functions.textops import unescape_arr_col, unescape_col
from lyrics_crawler_spark.operators.priority import (
    child_key, child_key_dec, hex_key_dec, seed_key, seed_key_dec,
)
from lyrics_crawler_spark.operators.spans_sql import spans_expr
from lyrics_crawler_spark.sitegen.graph import SiteGraph, SiteSpec
from lyrics_crawler_spark.sources.fetch_stage import (
    FETCH_SCHEMA, UA_POOL, make_fetch_parse,
)
from lyrics_crawler_spark.tables.store import SnapshotStore

# ---- bytes/row discipline (VERDICT r04 next-round #1) ----
# The universal row key through the wave loop is (site_id int, url) —
# site-RELATIVE url plus a 4-byte dictionary id into the broadcast site
# dim. abs_url (= concat(site, url)), the site string, the host string
# and the per-site delay are all pure functions of that key and are
# reconstructed ONLY at the string edges (trace / documents sink /
# seen) via a broadcast dim join. They used to ride every frontier /
# fetch-log / carry row (~85-100 redundant bytes on a ~150-190 byte
# row): at 4×8 bandwidth-starved cores the widest-wave foreground
# scaled 1.67-1.73× on 4× cores, and bytes moved per row is the lever.

FRONTIER_SCHEMA = (
    "dfs_key string, url string, site_id int, "
    "task_type int, depth int, movie string, movie_url string, artist string, "
    "album string, album_url string, song string, wave_enq int, cycle int, "
    "key_dec decimal(38,0)"
)

FETCH_LOG_SCHEMA = (
    "site_id int, url string, wave int, attempt int, ok boolean, bytes long, "
    "partition_id int, ua_id int, "
    "children array<struct<url:string,label:string,child_type:int,album:string>>, "
    "d_album string, d_lyrics string, d_singers array<string>, "
    "d_directors array<string>, d_lyricists array<string>, d_other array<string>, "
    "cycle int"
)

RESOLVED_SCHEMA = (
    "dfs_key string, site_id int, url string, action string, wave int, cycle int"
)

# politeness delay midpoint of randint(35, 60) (network_manager.py:44-46),
# applied as *virtual* time — the engine never sleeps.
DELAY_MIDPOINT_S = 47.5

DOCS_SCHEMA = (
    "start_url string, song_url string, doc_id string, host string, "
    "topology int, song string, movie string, movie_url string, "
    "artist string, dfs_key string, wave int, cycle int, fetched_at int, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)

# ---- carry tables (replace-mode snapshots; the O(wave) wave state) ----
# The wave loop never re-derives its work from the full history logs:
# each wave reads three pre-aggregated carry tables written by the
# previous wave and touches O(|pending| + |wave|) rows. The append-only
# logs (frontier, fetch_log, resolved, documents, metrics) remain the
# lineage/trace/golden substrate; the carries are pure acceleration
# state and are reconstructible from the logs. On Iceberg each carry is
# a MERGE target table; here it is a replace-mode snapshot per wave.

# one row per live URL: not yet fetched-ok, error budget not exhausted.
# min_key is the DECIMAL key twin (operators/priority.py): it exists only
# to be min-aggregated and ordered, and decimals keep those aggregates in
# HashAggregate (string buffers degrade to SortAggregate — BENCH.md).
PENDING_SCHEMA = (
    "site_id int, url string, task_type int, "
    "depth int, min_key decimal(38,0), n_fail long"
)

# one row per unresolved non-leaf OCCURRENCE. url_ok flips when the
# URL's parse lands; `children` is attached at flip (or at insert for
# dup occurrences of already-fetched URLs) so deferred dup-movie
# decisions never re-read page history. is_exp marks the expander
# occurrence (min dfs_key of the URL's first batch — the occurrence the
# sequential reference pops first).
UNRESOLVED_SCHEMA = (
    "dfs_key string, site_id int, url string, "
    "task_type int, depth int, movie string, artist string, "
    "is_exp boolean, url_ok boolean, n_prev long, "
    "children array<struct<url:string,label:string,child_type:int,album:string>>, "
    "key_dec decimal(38,0)"
)

# one row per leaf occurrence awaiting its URL's parse
LEAF_UNSAVED_SCHEMA = (
    "dfs_key string, site_id int, url string, "
    "task_type int, movie string, movie_url string, artist string, "
    "album string, album_url string, song string"
)

# delta-mode carry framing (carry_deltas > 0): every carry snapshot —
# base or per-wave delta — appends two columns; `w` is the writing wave
# and `live=false` is a delete tombstone. Resolution at read keeps the
# max-w row per carry key (an associative last-writer-wins rule, same
# algebra as the documents MERGE), so a wave commits O(changed) rows
# instead of rewriting the whole live worklist (VERDICT r02 missing #3).
_CARRY_FRAME = ", w int, live boolean"
_CARRY_KEYS = {
    "pending": ["site_id", "url"],
    "unresolved": ["dfs_key", "site_id", "url"],
    "leaf_unsaved": ["dfs_key", "site_id", "url"],
}


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        specs: list[SiteSpec],
        base_dir: str,
        fetch_partitions: int | None = None,
        bloom_seen: bool = False,
        bloom_partitions: int = 32,
        bloom_m_bits: int = 1 << 20,
        bloom_k: int = 4,
        carry_deltas: int = 0,
        pipeline_commits: bool = False,
        disable_aqe: bool = False,
    ):
        """``bloom_seen`` enables the partitioned bloom URL-seen
        pre-filter (operators/urlseen.py) on the kid probe: newly
        exploded URLs the bloom proves never-attempted skip the
        committed-history scan entirely; only the maybe-seen remainder
        (true dups + ~2% fp at k=4) pays a pre-filtered scan. Results
        are identical either way (fp resolved exactly). Off, the probe
        is one slim full-log aggregate per wave — the only O(state)
        shuffle left in the wave loop, which is exactly what the bloom
        removes at the 10^10-URL design point.

        ``carry_deltas=K>0`` switches the three worklist carries
        (pending / unresolved / leaf_unsaved) from full per-wave
        rewrites to per-wave *delta* appends (changed rows + delete
        tombstones, resolved at read by max-w-per-key), compacted back
        to a full base every K waves — O(wave) commit with O(state/K)
        amortized compaction, the Iceberg-MERGE-target shape. K=0
        (default) rewrites the full carry every wave: strictly less
        read-side work, the right trade at sandbox scale (BENCH.md).

        ``pipeline_commits`` lets wave N's background writes (documents
        deltas, metrics, resolved log, carry snapshots) drain WHILE wave
        N+1's foreground runs: the wave stays staged-but-uncommitted
        ("inflight") until the next wave's body ends, at which point it
        is gathered and its manifest committed — commits stay strictly
        wave-ordered, so the resume contract (replay from the last
        committed manifest; later snapshot dirs are invisible orphans)
        is unchanged. Wave N+1 reads N's uncommitted state through an
        explicit overlay: fetch_log/frontier snapshots staged
        synchronously in N's foreground, and each carry table by
        waiting on exactly its own write future at the point the table
        is first needed (pending at J1, unresolved at J2, leaf_unsaved
        at the leaf stage). Default OFF: measured at sandbox scale the
        overlap LOSES (scale 40 / 32 cores: 258.5s on vs 163.7s off;
        scale 8: +25% even under a FAIR scheduler) — this box is
        DRAM/allocation-bound (BENCH.md "platform ceiling"), so running
        two waves' work concurrently adds contention, not throughput,
        and the foreground fetch stage starves behind the previous
        wave's write jobs (FIFO) or halves its share (FAIR). The design
        point where it pays is a real cluster whose executors idle
        during the driver's per-wave serial phase — flip it there;
        results are bit-identical either way (golden-tested).

        ``disable_aqe`` turns adaptive query execution OFF for the
        duration of :meth:`run` (session conf toggled and restored, so
        relational queries sharing the session keep AQE). Hypothesis:
        the wave loop's plans are fully shaped by hand — every
        dimension join explicitly broadcast, shuffle width pinned — so
        AQE's re-planning contributes only per-stage barriers on the
        per-wave serial term. Measured verdict: NO effect
        distinguishable from machine noise (order-balanced ABBA at
        scale 40 / 32 cores: off 187.0/208.8 s vs on 208.7/200.1 s;
        two earlier single pairs "showed" ±40% in OPPOSITE directions —
        window drift, see BENCH.md "measurement protocol"). Default
        off (AQE stays on). The engine does not rely on AQE for
        correctness anywhere: the fetch stage pre-salts by URL hash,
        and golden tests pass with either setting."""
        self.spark = spark
        self.bloom_seen = bloom_seen
        self.carry_deltas = carry_deltas
        self.pipeline_commits = pipeline_commits
        self.disable_aqe = disable_aqe
        # the staged-but-uncommitted previous wave (pipeline_commits):
        # {"wave", "staged", "bg", "stats", "persisted", "carry_futures"}
        self._inflight: dict | None = None
        self._bloom_params = {
            "num_partitions": bloom_partitions,
            "m_bits": bloom_m_bits,
            "k": bloom_k,
        }
        self._set_specs(specs)
        self.store = SnapshotStore(spark, base_dir)
        # bloom config is part of the store's identity: resuming with a
        # different config would make already-fetched URLs probe as
        # definitely-new (missing/mismatched url_bloom deltas) and
        # re-fetch them — breaking the golden trace. Record at store
        # birth; fail fast on mismatch at resume (ADVICE r01).
        bloom_cfg = (
            # "hash" versions the position derivation (round 3 moved to
            # JVM-computable double hashing); a store built with older
            # bitsets must not resume under the new probe.
            {"bloom_seen": True, "hash": "xxh64-double-v4-siteid", **self._bloom_params}
            if bloom_seen
            else {"bloom_seen": False}
        )
        stored_cfg = self.store.get_config("bloom")
        if self.store.last_wave() >= 0:
            if stored_cfg != bloom_cfg and (
                bloom_seen or (stored_cfg or {}).get("bloom_seen")
            ):
                raise ValueError(
                    f"bloom config mismatch on resume: store has {stored_cfg}, "
                    f"engine given {bloom_cfg}; rebuild the store or match the flags"
                )
        else:
            self.store.set_config("bloom", bloom_cfg)
        # F4 re-crawl: the reference's `while True` re-seed loop
        # (base_crawler.py:116,:302,:529). Crawl state (frontier, fetch
        # log, resolution, retry ladders) is scoped to the CURRENT cycle
        # — a new cycle re-fetches every non-leaf page and resets error
        # budgets, exactly like the reference's fresh task dicts — while
        # the documents sink and its exists_song dedup span all cycles.
        self.cycle = int(self.store.get_config("cycle") or 0)
        self.fetch_partitions = fetch_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        self._pool = None  # lazy background-write thread pool

    def _bg_pool(self):
        from concurrent.futures import ThreadPoolExecutor

        if self._pool is None:
            # Spark job submission is thread-safe; per-wave side writes
            # (metrics, bloom delta, resolved log, documents deltas) run
            # here so only fetch-select and resolve+fan-out stay on the
            # wave's critical path (per-wave serial job latency is the
            # scaling-efficiency cap — BENCH.md).
            # sized for TWO waves of writes in flight (pipeline_commits
            # lets wave N's writes drain behind wave N+1's foreground,
            # which submits its own). A wave can submit up to NINE
            # background tasks — metrics, url_bloom, resolved, two
            # documents merges (normal + late path), the three carries,
            # and the J2 frontier write future — so two pipelined waves
            # need 18 workers; a queued carry write would serialize the
            # next wave's foreground, which blocks on exactly that future
            # (ADVICE r03). No bg task waits on another future (thunks
            # compose pre-read inputs only), so a saturated pool can
            # stall but never deadlock. Threads here only block on py4j,
            # so they cost nothing idle.
            self._pool = ThreadPoolExecutor(
                max_workers=20, thread_name_prefix="lcs-wave-bg"
            )
        return self._pool

    def _stage_append_bg(self, table: str, df, wave: int, futures: list):
        """Stage an append snapshot on a background thread. The future
        resolves to ``(manifest_entry_or_None, row_count)``; empty
        snapshots resolve to (None, 0) and are dropped from the commit.
        Uncommitted output of a failed wave is orphaned data, invisible
        to readers — the same crash-safety story as the foreground path.

        ``df`` may be a DataFrame or a zero-arg callable returning one:
        a callable defers PLAN CONSTRUCTION to the background thread.
        Every pyspark expression node is a py4j round trip (~0.9 ms);
        building the side-write plans on the wave's main thread was the
        bulk of its serial `carries-submit` term (~4,200 round trips per
        wave — scripts/diag_py4j.py). Thread-built plans are identical
        JVM objects; socket waits release the GIL, so N threads' chatter
        genuinely overlaps (VERDICT r03 task #1)."""

        def job():
            from pyspark.sql import Observation

            t0 = time.time()
            plan = df() if callable(df) else df
            obs = Observation()
            entry = self.store.stage_append(
                table, plan.observe(obs, F.count(F.lit(1)).alias("n")), wave
            )
            n = obs.get["n"]
            if _TIMING:
                print(f"    [bg:{table}] {time.time() - t0:.2f}s", flush=True)
            return (entry if n else None), n

        futures.append(self._bg_pool().submit(job))

    def _stage_replace_bg(self, table: str, df, wave: int, futures: list):
        """Stage a replace-mode carry snapshot on a background thread.
        Unlike appends, an EMPTY replace must still commit (the carry
        legitimately drains — e.g. pending at exhaustion); readers use
        :meth:`_read_carry` with an explicit schema so a footer-less
        empty snapshot round-trips. ``df`` may be a thunk (see
        :meth:`_stage_append_bg`)."""

        def job():
            t0 = time.time()
            plan = df() if callable(df) else df
            out = self.store.stage_replace(table, plan, wave), -1
            if _TIMING:
                print(f"    [bg:{table}] {time.time() - t0:.2f}s", flush=True)
            return out

        futures.append(self._bg_pool().submit(job))

    def _finalize_inflight(self) -> None:
        """Gather the inflight wave's background writes and publish its
        manifest commit (pipeline_commits). Runs at the end of the NEXT
        wave's body — the writes drained behind that wave's foreground —
        and from :meth:`run`'s ``finally`` so the store is fully
        committed whenever control returns to the caller. Commits stay
        strictly wave-ordered (the resume contract). A failed background
        write aborts the commit; its staged dirs are invisible orphans,
        exactly like a failed foreground wave."""
        fl, self._inflight = self._inflight, None
        if fl is None:
            return
        try:
            for f in fl["bg"]:
                entry, _n = f.result()
                if entry:
                    fl["staged"].append(entry)
            if fl["stats"].get("resolved") is None and "f_resolved" in fl:
                fl["stats"]["resolved"] = fl["f_resolved"].result()[1]
            self.store.commit_wave(fl["wave"], fl["staged"], fl["stats"])
        finally:
            for df in fl["persisted"]:
                df.unpersist()

    def _carry_paths(self, table: str) -> list[str]:
        """Snapshot paths for a carry table: committed manifest state
        overlaid with the inflight wave's staged write. Waits on exactly
        that table's write future — the carry IS this wave's input, but
        the other background writes keep draining."""
        paths = list(self.store.read_manifest()["tables"].get(table, []))
        fl = self._inflight
        if fl is not None:
            fut = fl["carry_futures"].get(table)
            if fut is not None:
                entry, _n = fut.result()
                if entry is not None:
                    if entry["mode"] == "replace":
                        paths = [entry["path"]]
                    else:
                        paths.append(entry["path"])
        return paths

    def _read_carry(self, table: str, schema: str) -> DataFrame:
        paths = self._carry_paths(table)
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*paths)

    # ---------------- worklist carries (replace vs delta mode) ----------

    def _stage_carry_bg(
        self, table: str, full_df: DataFrame, delta_df, wave: int, bg: list
    ) -> None:
        """Commit the next state of a worklist carry on a background
        thread. Replace mode (carry_deltas=0, default): write the full
        live worklist, single-snapshot read. Delta mode (K>0): append
        only this wave's changed rows (``delta_df`` carries a ``live``
        column; false = delete tombstone) and compact to a full base
        every K waves — O(wave) commit, O(state/K) amortized compaction,
        resolved at read by :meth:`_read_worklist` (Iceberg: the carry is
        a MERGE INTO target; deltas are the merge's row-level changes)."""
        K = self.carry_deltas
        compact = (not K) or wave % K == 0 or not self.store.read_manifest()[
            "tables"
        ].get(table)
        # full_df/delta_df may be thunks — only the CHOSEN side's plan is
        # ever built, and it is built on the background thread (the
        # unchosen side used to cost its full py4j chatter for nothing).
        if compact:
            def framed():
                plan = full_df() if callable(full_df) else full_df
                return plan.withColumn("w", F.lit(wave)).withColumn(
                    "live", F.lit(True)
                )

            self._stage_replace_bg(table, framed, wave, bg)
        else:
            def framed_delta():
                plan = delta_df() if callable(delta_df) else delta_df
                return plan.withColumn("w", F.lit(wave))

            self._stage_append_bg(table, framed_delta, wave, bg)

    def _read_worklist(self, table: str, schema: str) -> DataFrame:
        """Current state of a worklist carry: base + delta snapshots,
        last-writer-wins per carry key (max w — associative and
        idempotent, so any prefix of committed waves resolves to that
        prefix's exact state: the resume contract), tombstones dropped.
        Single-snapshot reads (replace mode / right after compaction)
        skip the resolve entirely."""
        paths = self._carry_paths(table)
        if not paths:
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.schema(schema + _CARRY_FRAME).parquet(*paths)
        if len(paths) > 1:
            wk = Window.partitionBy(*_CARRY_KEYS[table]).orderBy(F.desc("w"))
            df = (
                df.withColumn("_rn", F.row_number().over(wk))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        return df.where("live").drop("w", "live")

    def _tombstones(self, df: DataFrame, schema: str, keys: list[str]) -> DataFrame:
        """Delete markers for delta-mode carries: carry keys + nulls,
        live=false."""
        st = StructType.fromDDL(schema)
        return df.select(
            *[
                F.col(f.name) if f.name in keys
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in st.fields
            ]
        ).withColumn("live", F.lit(False))

    def _stage_and_read(
        self, table: str, df: DataFrame, wave: int, schema: str, staged: list
    ):
        """Stage an append snapshot; return a re-read of the written
        file. The plan is computed exactly once (the write); the row
        count rides on the SAME job via an Observation; downstream ops
        re-read the columnar file (cheap decode, no recompute). Measured
        against the persist-then-background-write alternative this is
        FASTER: caching re-encodes the payload into the block store and
        the parquet write then encodes it again, doubling the encode
        cost of the wave's biggest tables (v3 experiment: 246.8s vs
        186.7s at 32 cores, scale 8). Empty snapshots are dropped from
        the commit (a parquet dir with no part files can't be re-read
        without a schema)."""
        from pyspark.sql import Observation

        obs = Observation()
        entry = self.store.stage_append(
            table, df.observe(obs, F.count(F.lit(1)).alias("n")), wave
        )
        n = obs.get["n"]
        if n == 0:
            return None, 0, None
        staged.append(entry)
        out = self.spark.read.schema(schema).parquet(entry["path"])
        return out, n, entry

    def _set_specs(self, specs: list[SiteSpec]) -> None:
        """Install (or replace, between re-crawl cycles) the site specs
        and their derived dimension tables."""
        self.specs = specs
        self.specs_by_site = {s.start_url: s for s in specs}
        # site ids are positional in sorted(start_url) order: stable
        # across resume (the spec SET is the resume contract) and
        # independent of list order.
        ordered = sorted(specs, key=lambda s: s.start_url)
        self.site_ids = {s.start_url: i for i, s in enumerate(ordered)}
        self.specs_by_id = {i: s for i, s in enumerate(ordered)}
        # site dimension (broadcast): every per-site attribute lives
        # HERE and joins back by the 4-byte site_id — host / delay /
        # site string never ride frontier/fetch-log/carry rows.
        self.site_dim = self.spark.createDataFrame(
            [
                (
                    self.site_ids[s.start_url],
                    s.start_url,
                    s.host,
                    s.dialect,
                    s.topology,
                    s.max_err,
                    s.politeness_budget,
                    DELAY_MIDPOINT_S if s.delay_request else 0.0,
                )
                for s in specs
            ],
            "site_id int, site string, host string, dialect string, "
            "topology int, max_err int, budget int, delay_s double",
        )
        robots_rows = [
            (self.site_ids[s.start_url], p)
            for s in specs
            for p in s.robots_disallow
        ] or [(-1, "__never__")]
        self.robots = self.spark.createDataFrame(
            robots_rows, "site_id int, prefix string"
        )
        # static plan trims: when NO site declares a politeness budget /
        # robots rules, the per-host window / anti-join never changes the
        # result — skip those operators entirely (fewer AQE stages per
        # wave; per-wave serial latency is the scaling bottleneck).
        self._any_budget = any(s.politeness_budget is not None for s in specs)
        self._any_robots = any(s.robots_disallow for s in specs)

    # ---------------- table access ----------------

    def _read(self, table: str, schema: str) -> DataFrame:
        paths = list(self.store.read_manifest()["tables"].get(table, []))
        fl = self._inflight
        if fl is not None:
            # overlay the inflight wave's synchronously-staged append
            # snapshots (fetch_log / frontier — written in its
            # foreground, so no future wait): the next wave's history
            # reads (URL-seen probe, child settlement, parse lookups)
            # must see them exactly as they would after a commit.
            paths += [e["path"] for e in fl["staged"] if e["table"] == table]
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*paths)

    def _cycle_scope(self, df: DataFrame, current_cycle_only: bool) -> DataFrame:
        # crawl state (settlement, retries, parses) is per-cycle — the
        # reference's task dicts are recreated each `while True` pass;
        # only the documents sink spans cycles. The filter is a parquet
        # pushdown (partition-prunable at scale).
        return df.where(F.col("cycle") == self.cycle) if current_cycle_only else df

    def frontier(self, current_cycle_only: bool = False) -> DataFrame:
        return self._cycle_scope(
            self._read("frontier", FRONTIER_SCHEMA), current_cycle_only
        )

    def fetch_log(self, current_cycle_only: bool = False) -> DataFrame:
        return self._cycle_scope(
            self._read("fetch_log", FETCH_LOG_SCHEMA), current_cycle_only
        )

    def visits(self, current_cycle_only: bool = False) -> DataFrame:
        return self.fetch_log(current_cycle_only).select(
            "site_id", "url", "wave", "attempt", "ok", "cycle"
        )

    def parsed_view(self, log: DataFrame) -> DataFrame:
        return log.where("ok").select(
            "site_id", "url", "wave", "bytes", "children", "d_album", "d_lyrics",
            "d_singers", "d_directors", "d_lyricists", "d_other",
        )

    def resolved(self, current_cycle_only: bool = False) -> DataFrame:
        return self._cycle_scope(
            self._read("resolved", RESOLVED_SCHEMA), current_cycle_only
        )

    def documents(self) -> DataFrame | None:
        """Resolved documents view. Storage is an append-only per-wave
        delta log (O(wave) commit cost, like an Iceberg merge-on-read
        MERGE); the associative win-rule (min/max dfs_key, see
        :meth:`_merge_documents`) is applied at read. Idempotent, so it
        composes with end-of-run compaction."""
        log = self.store.read("documents")
        if log is None:
            return None
        return self._with_timestamps(self._resolve_documents(log))

    def abs_url_expr(self, site, url, topology, task_type):
        """P18 reconstruction at the string edges: the reference's naive
        concat with the CrawlerType1 artist-page '/' quirk
        (functions/urls.py:compose_url; base_crawler.py:423). The wave
        loop itself never materializes absolute URLs — (site_id, url)
        is the key everywhere."""
        return F.when(
            (topology == 1) & (task_type == 1), F.concat(site, F.lit("/"), url)
        ).otherwise(F.concat(site, url))

    def _with_timestamps(self, docs: DataFrame) -> DataFrame:
        """O2 metadata on a deterministic virtual clock (wave units —
        golden tests stay exact). Reference semantics:

        - ``save`` stamps last_updated = last_crawled = now on every
          insert/update (db_operations.py:58-63, :80-83) → both default
          to the winning save's wave;
        - the D2 no-new-songs skip calls ``update_last_crawl(start_url,
          movie_url)`` (db_operations.py:178-193, from
          base_crawler.py:162-164), bumping last_crawled on every song
          of that movie → greatest(save wave, latest skipped_no_new
          resolution wave of the movie's URL). A touch can only postdate
          the docs it matches (count equality ⟹ the songs already
          exist), so greatest() is exact."""
        touches = (
            self.resolved()
            .where(F.col("action") == "skipped_no_new")
            .groupBy(
                F.col("site_id").alias("t_sid"), F.col("url").alias("movie_rel")
            )
            .agg(F.max("wave").alias("touch_wave"))
        )
        sid = F.broadcast(
            self.site_dim.select(
                F.col("site").alias("start_url"), F.col("site_id").alias("d_sid")
            )
        )
        return (
            docs.withColumn("last_updated", F.col("wave"))
            .join(sid, "start_url", "left")
            .join(
                touches,
                (F.col("d_sid") == F.col("t_sid"))
                & (F.col("movie_url") == F.col("movie_rel")),
                "left",
            )
            .withColumn(
                "last_crawled",
                F.greatest(
                    F.col("last_updated"),
                    F.coalesce(F.col("touch_wave"), F.lit(-1)),
                ),
            )
            .drop("d_sid", "t_sid", "movie_rel", "touch_wave")
        )

    @staticmethod
    def _resolve_documents(merged_src: DataFrame) -> DataFrame:
        """MERGE resolution: min-dfs_key wins for Type0/1 (first pop
        saves; later pops skip via exists_song), max for Type2 (the D4
        missing-return quirk — every pop re-saves, last wins). Every row
        of a (start_url, song_url) group shares its topology, so
        first(topology) picks the rule exactly.

        Shape note: the winner is found on *slim* key-only aggregates,
        then kept via a left-semi join back. The obvious one-pass
        min_by/max_by over the full row struct allocates two span-array
        deep copies per input row in the agg buffers — measured 200s+
        of GC in one stage at 32 threads. And even the slim
        ``min(struct(cycle, dfs_key))`` spelling carries a var-width
        struct buffer, which silently degrades HashAggregate to
        SortAggregate (the exact trap operators/priority.py documents;
        VERDICT r04 wrong #1). So the lexicographic (cycle, dfs_key)
        winner is computed over the decimal key twin derived at read
        (:func:`hex_key_dec` — order-isomorphic, injective) in two
        purely-numeric-buffer HashAggregates:

        1. per (doc, cycle): min/max dfs_dec — topology rides as a
           GROUP KEY (functional on start_url);
        2. per doc: min/max cycle;

        then the winning cycle picks that cycle's min (Type0/1) or max
        (Type2) dec, and a semi-join on the 4-tuple keeps the row.
        ``tests/test_plans.py::test_documents_read_plan_hash_aggregates``
        pins the shape."""
        src = merged_src.withColumn("dfs_dec", hex_key_dec(F.col("dfs_key")))
        percyc = src.groupBy("start_url", "song_url", "topology", "cycle").agg(
            F.min("dfs_dec").alias("dmin"),
            F.max("dfs_dec").alias("dmax"),
        )
        cyc = percyc.groupBy("start_url", "song_url", "topology").agg(
            F.min("cycle").alias("cmin"),
            F.max("cycle").alias("cmax"),
        )
        winners = (
            percyc.join(cyc, ["start_url", "song_url", "topology"])
            .where(
                F.col("cycle")
                == F.when(F.col("topology") == 2, F.col("cmax")).otherwise(
                    F.col("cmin")
                )
            )
            .select(
                "start_url",
                "song_url",
                "cycle",
                F.when(F.col("topology") == 2, F.col("dmax"))
                .otherwise(F.col("dmin"))
                .alias("dfs_dec"),
            )
        )
        # (start_url, song_url, cycle, dfs_key) is unique in the log —
        # each occurrence is saved exactly once per cycle — so the
        # semi-join keeps exactly one row per document (dfs_dec is
        # injective in dfs_key). Ordering is lexicographic on
        # (cycle, dfs_key): Type0/1 keep the first-ever save, Type2 the
        # last re-save (latest cycle wins — re-crawls refresh Type2
        # content, db_operations.py:79-99 UPDATE path).
        return src.join(
            winners, ["start_url", "song_url", "cycle", "dfs_dec"], "left_semi"
        ).drop("dfs_dec")

    def load(self, doc_id: str) -> DataFrame:
        """S8 point lookup (db_operations.py:107-122 ``load(id)`` — dead
        code in the reference, exposed for §2 completeness): the resolved
        documents row for one doc_id. On Iceberg this hits the sink's
        partition/file pruning; here it's a filtered read of the
        merge-on-read view."""
        docs = self.documents()
        if docs is None:
            return self.spark.createDataFrame([], DOCS_SCHEMA)
        return docs.where(F.col("doc_id") == doc_id)

    def metrics(self) -> DataFrame | None:
        return self.store.read("metrics")

    def user_agents(self) -> DataFrame:
        """S7 view: the fetch log with its rotated UA string
        materialized from the pool index (the log stores the 4-byte
        index; the strings live in one broadcast-size dim)."""
        ua = self.spark.createDataFrame(
            list(enumerate(UA_POOL)), "ua_id int, user_agent string"
        )
        return self.fetch_log().join(F.broadcast(ua), "ua_id", "left")

    # ---------------- seeding (wave 0) ----------------

    def _seed_cycle(self, cycle: int, wave: int) -> None:
        # the seed commit must not publish ahead of an earlier wave's
        # (commits are strictly wave-ordered — the resume contract)
        self._finalize_inflight()
        rows = []
        for spec in self.specs:
            graph = SiteGraph(spec)
            # robots filter BEFORE rank: the reference filters at put()
            # time, so surviving seeds keep their relative LIFO order.
            allowed = [
                u
                for u in graph.seeds()
                if not any(u.startswith(p) for p in spec.robots_disallow)
            ]
            n = len(allowed)
            sid = self.site_ids[spec.start_url]
            for i, u in enumerate(allowed):
                rows.append(
                    (
                        seed_key(i, n), u, sid, 0, 0,
                        None, None, None, None, None, None, wave, cycle,
                        seed_key_dec(i, n),
                    )
                )
        df = self.spark.createDataFrame(rows, FRONTIER_SCHEMA)
        staged = [self.store.stage_append("frontier", df, wave)]
        # carry tables: seeds are the initial pending worklist and (all
        # being non-leaf index pages) the initial unresolved occurrences;
        # a fresh cycle resets all three carries.
        pend: dict[tuple, tuple] = {}
        for r in rows:
            key_dec, url, sid, tt, depth = r[13], r[1], r[2], r[3], r[4]
            old = pend.get((sid, url))
            if old is None or key_dec < old[4]:
                pend[(sid, url)] = (sid, url, tt, depth, key_dec, 0, wave, True)
        staged.append(
            self.store.stage_replace(
                "pending",
                self.spark.createDataFrame(
                    list(pend.values()), PENDING_SCHEMA + _CARRY_FRAME
                ),
                wave,
            )
        )
        unres = [
            (r[0], r[2], r[1], r[3], r[4], None, None, False, False,
             0, None, r[13], wave, True)
            for r in rows
        ]
        staged.append(
            self.store.stage_replace(
                "unresolved",
                self.spark.createDataFrame(unres, UNRESOLVED_SCHEMA + _CARRY_FRAME),
                wave,
            )
        )
        staged.append(
            self.store.stage_replace(
                "leaf_unsaved",
                self.spark.createDataFrame([], LEAF_UNSAVED_SCHEMA + _CARRY_FRAME),
                wave,
            )
        )
        self.store.commit_wave(wave, staged, {"seeds": len(rows), "cycle": cycle})

    # ---------------- predicates ----------------

    @staticmethod
    def _nonleaf(topo, tt):
        return (topo.isin(0, 1) & tt.isin(0, 1)) | ((topo == 2) & tt.isin(0, 1, 2))

    @staticmethod
    def _leaf(topo, tt):
        return (topo.isin(0, 1) & (tt == 2)) | ((topo == 2) & (tt == 3))

    @staticmethod
    def _url_state(V: DataFrame, by_cycle: bool = False) -> DataFrame:
        keys = (
            ["cycle", "site_id", "url"] if by_cycle else ["site_id", "url"]
        )
        return V.groupBy(*keys).agg(
            F.max("ok").alias("has_ok"),
            F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("n_fail"),
        )

    # ---------------- the wave loop ----------------

    def run(self, max_waves: int | None = None) -> int:
        """Run (or resume) the current cycle to frontier exhaustion.
        Returns final wave."""
        if self.store.last_wave() < 0:
            self._seed_cycle(0, 0)
        wave = self.store.last_wave()
        waves_done = 0
        # AQE off for the wave loop only (see __init__ docstring): the
        # conf is session-scoped and runtime-togglable, so restore it
        # for whatever relational work shares this session.
        aqe_key = "spark.sql.adaptive.enabled"
        aqe_prev = self.spark.conf.get(aqe_key, "true")
        if self.disable_aqe:
            self.spark.conf.set(aqe_key, "false")
        try:
            while max_waves is None or waves_done < max_waves:
                if not self._run_wave(wave + 1):
                    break
                wave += 1
                waves_done += 1
        finally:
            # publish the last inflight wave before control returns:
            # callers (accessors, resume, the next run()) see only
            # fully-committed store state.
            self._finalize_inflight()
            if self.disable_aqe:
                self.spark.conf.set(aqe_key, aqe_prev)
        return wave

    def run_cycle(
        self, specs: list[SiteSpec] | None = None, max_waves: int | None = None
    ) -> int:
        """F4: start the NEXT re-crawl cycle — one more iteration of the
        reference's ``while True`` re-seed loop (base_crawler.py:112-147,
        :296-325, :525-560) — and run it to exhaustion. ``specs``
        replaces the site specs first (the live site changed between
        cycles); per-URL failure determinism must be preserved (the spec
        seed stays fixed). Non-leaf pages are re-fetched with fresh error
        budgets; existing Type0/1 songs skip via the cross-cycle
        exists_song probe; changed movie song-counts re-expand (D2);
        Type2 leaves re-save (D4, latest cycle wins). Resume-safe: the
        cycle number is part of the store manifest, so a killed cycle-2
        run resumes inside cycle 2 via plain :meth:`run`."""
        if self.store.last_wave() < 0:
            raise RuntimeError("run_cycle() needs a completed first run(); seed first")
        if specs is not None:
            if {s.start_url for s in specs} != {s.start_url for s in self.specs}:
                raise ValueError("re-crawl cycle must keep the same site set")
            self._set_specs(specs)
        self.cycle += 1
        self.store.set_config("cycle", self.cycle)
        self._seed_cycle(self.cycle, self.store.last_wave() + 1)
        return self.run(max_waves=max_waves)

    def _run_wave(self, wave: int) -> bool:
        # try/finally so a failed stage write can't leak cached blocks
        # for the session lifetime (ADVICE r01).
        persisted: list[DataFrame] = []
        try:
            return self._wave_body(wave, persisted)
        finally:
            for df in persisted:
                df.unpersist()

    def _wave_body(self, wave: int, persisted: list[DataFrame]) -> bool:
        """One BSP wave, O(|pending| + |wave|) — never O(state).

        Foreground (the critical path) is ONE blocking write job plus
        plan construction:

          J1  politeness-selected fetch over the ``pending`` carry →
              fetch_log append (blocking — everything depends on it);
          J2  resolution + LIFO fan-out over the ``unresolved`` carry →
              frontier append (kids), submitted as a background FUTURE:
              the main thread overlaps J2's execution with the wave's
              kid-independent plan construction, then joins it.

        Everything else — metrics, bloom delta, resolved log, documents
        deltas, and the three carry-table updates — runs on background
        threads as THUNKS (the plan's py4j chatter happens on the worker
        thread too — VERDICT r03 #1 serial-term attack) and is gathered
        before the manifest commit. History logs are touched only by
        (a) the kid URL-seen probe (bloom-pruned to the maybe-side when
        ``bloom_seen``; a slim full-log aggregate otherwise) and
        (b) broadcast-filtered lookups for the rare late-resolution rows
        (dup occurrences of already-fetched URLs). All history/carry
        READS happen on this thread before the thunks are submitted —
        a thunk reading through ``_read``'s inflight overlay after the
        pipelined swap would see its own wave (or deadlock on its own
        carry future).
        """
        dim = F.broadcast(self.site_dim)
        staged: list[dict] = []
        bg: list = []
        carry_futures: dict = {}  # table -> its write future (overlay reads)
        t0 = time.time()
        _t = time.time()

        # -------- J1: fetch selection + fetch, ONE foreground job --------
        # `pending` IS the frontier worklist (north rule: "a partitioned
        # frontier table drives per-host politeness-bucketed fetch
        # waves"): one pre-aggregated row per live URL.
        pending = self._read_worklist("pending", PENDING_SCHEMA)
        pend_dim = pending.join(dim, "site_id")
        # per-site minimum pending depth: a window partitioned by site
        # would funnel every pending row of a site through ONE task (site
        # cardinality is tiny) — use a map-side-combinable groupBy and
        # broadcast the per-site minima back instead (scales linearly).
        site_min = pend_dim.groupBy("site_id").agg(
            F.min("depth").alias("site_min_depth")
        )
        at_depth = pend_dim.join(F.broadcast(site_min), "site_id").where(
            F.col("depth") == F.col("site_min_depth")
        )
        # politeness: per-host budget top-k by DFS key; uncapped hosts
        # bypass the window entirely (no shuffle for them). When no site
        # has a budget at all, the whole branch is statically elided.
        if self._any_budget:
            capped = at_depth.where(F.col("budget").isNotNull())
            uncapped = at_depth.where(F.col("budget").isNull())
            whost = Window.partitionBy("host").orderBy("min_key")
            capped_sel = (
                capped.withColumn("rn", F.row_number().over(whost))
                .where(F.col("rn") <= F.col("budget"))
                .drop("rn")
            )
            selected = uncapped.unionByName(capped_sel)
        else:
            selected = at_depth
        wave_urls = selected.select(
            "site_id", "url", "task_type",
            F.col("n_fail").cast("int").alias("attempt"),
        )
        # fetch+parse: repartition by (site_id, url) hash = domain-salted
        # spread (one hot host's URLs spread over every partition). Only
        # the 4-byte id + relative url + two ints cross into Arrow; the
        # absolute URL, host and delay are reconstructed/joined from the
        # broadcast dim where actually needed.
        fetched = wave_urls.repartition(
            self.fetch_partitions, "site_id", "url"
        ).mapInPandas(make_fetch_parse(self.specs_by_id), FETCH_SCHEMA)
        new_log_df = (
            fetched.withColumn("wave", F.lit(wave))
            .withColumn("cycle", F.lit(self.cycle))
            .selectExpr(
                "site_id", "url", "wave", "attempt", "ok", "bytes",
                "partition_id", "ua_id", "children", "d_album",
                "d_lyrics", "d_singers", "d_directors", "d_lyricists", "d_other",
                "cycle",
            )
        )
        new_log, n_fetched, log_entry = self._stage_and_read(
            "fetch_log", new_log_df, wave, FETCH_LOG_SCHEMA, staged
        )
        _t = _tick('fetch+stage', _t)

        # side writes depending only on this wave's (cached) fetch output
        # run on background threads, off the wave's critical path — as
        # THUNKS: their plan construction (py4j chatter) happens on the
        # background thread too, not on the wave's serial spine.
        if new_log is not None:
            snapshot_id = log_entry["path"]

            # per-wave, per-host, per-partition lineage metrics (O4).
            # host and delay no longer ride the log rows: aggregate on
            # the (site_id, partition) grain first, then map through the
            # broadcast dim and re-aggregate to the host grain (delay is
            # a per-site constant, so Σ delay_s ≡ attempted × delay_s).
            def met():
                return (
                    new_log.groupBy("site_id", "partition_id")
                    .agg(
                        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("uf"),
                        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("er"),
                        F.sum(F.when(F.col("ok"), F.col("bytes")).otherwise(0)).alias("by"),
                        F.count("*").alias("ua_n"),
                    )
                    .join(dim.select("site_id", "host", "delay_s"), "site_id")
                    .groupBy("host", "partition_id")
                    .agg(
                        F.sum("uf").alias("urls_fetched"),
                        F.sum("er").alias("errors"),
                        F.sum("by").alias("bytes"),
                        F.sum(F.col("ua_n") * F.col("delay_s")).alias("vtime_s"),
                        F.sum("ua_n").alias("urls_attempted"),
                    )
                    .withColumn("wave", F.lit(wave))
                    .withColumn("snapshot_id", F.lit(snapshot_id))
                )

            self._stage_append_bg("metrics", met, wave, bg)
            if self.bloom_seen:
                # bloom delta for every URL attempted this wave (ok and
                # failed — the probe must prove *attempted-ness*, not
                # success), OR-merged with the committed bitsets into a
                # replace-mode carry of ≤P rows (constant bytes per wave;
                # OR is associative+idempotent so the merged snapshot
                # reads identically to replaying every delta). Keeping it
                # pre-merged is what lets the probe collect+broadcast P
                # rows instead of O(waves × P) delta rows.
                from lyrics_crawler_spark.operators.urlseen import (
                    BLOOM_SCHEMA, bloom_build, bloom_merge,
                )

                # NB: the carry read happens HERE on the main thread —
                # a thunk running after the pipelined inflight swap
                # would overlay-read its own wave (and deadlock waiting
                # on its own future). Thunks never touch _read*/fetch_log;
                # they only compose plans over pre-read inputs.
                prev_bits = self._read_carry("url_bloom", BLOOM_SCHEMA)

                def bloom_next():
                    delta_bits = bloom_build(
                        new_log.select(
                            F.xxhash64("site_id", "url").alias("url_hash")
                        ),
                        **self._bloom_params,
                    )
                    return bloom_merge(prev_bits.unionByName(delta_bits))

                self._stage_replace_bg("url_bloom", bloom_next, wave, bg)
                carry_futures["url_bloom"] = bg[-1]
            _t = _tick('metrics-submit', _t)

        # cross-cycle documents state (exists_song / number_of_songs,
        # db_operations.py:195-229) — None in cycle 0, where every
        # cross-cycle operator below is statically elided.
        doc_log = self.store.read("documents") if self.cycle > 0 else None
        prev_docs = (
            doc_log.where(F.col("cycle") < self.cycle) if doc_log is not None else None
        )
        prev_keys = (
            prev_docs.select(
                F.col("start_url").alias("site"), F.col("song_url").alias("url")
            )
            .distinct()
            .join(dim.select("site_id", "site"), "site")
            .select("site_id", "url")
            if prev_docs is not None
            else None
        )

        # -------- J2: resolution + fan-out, ONE foreground job --------
        # NB: DFS keys are only unique *within* a site (every site's first
        # seed is 00000000) — all resolution joins key on
        # (dfs_key, site_id, url).
        unresolved = self._read_worklist("unresolved", UNRESOLVED_SCHEMA)
        U = unresolved.join(dim, "site_id")
        if new_log is not None:
            # flip url_ok for occurrences whose URL parsed THIS wave
            # (same-wave expand) and attach their children.
            new_parses = self.parsed_view(new_log).select(
                "site_id", "url", F.col("children").alias("new_children")
            )
            U = (
                U.join(new_parses, ["site_id", "url"], "left")
                .withColumn(
                    "url_ok", F.col("url_ok") | F.col("new_children").isNotNull()
                )
                .withColumn("children", F.coalesce("children", "new_children"))
                .drop("new_children")
            )
        live = U.where("url_ok")
        D2 = self._memo("d2_resolution", self._build_d2_exprs)
        is_movie = D2["is_movie"]
        res_cols = [
            "dfs_key", "site_id", "url", "task_type",
            "depth", "movie", "artist", "topology", "children", "action",
            "key_dec",
        ]
        # every live non-movie occurrence expands (F2 dispatch)
        res_others = live.where(~is_movie).withColumn(
            "action", F.lit("expanded")
        )

        # D2 movie machinery. The expander (is_exp, marked at insert) and
        # any occurrence whose count check already decides (empty movie,
        # cycle-2 no-new mass skip) resolve immediately at pop time
        # (base_crawler.py:158-172); other dup occurrences defer until
        # every distinct child is settled, then apply the same count
        # equality: number_of_songs = n_prev + newly-saved children.
        movies = live.where(is_movie).withColumn("L", F.size("children"))
        res_imm = movies.where(D2["imm_where"]).withColumn(
            "action", D2["imm_action"]
        )
        defer_check = movies.where(D2["defer_where"])
        song_urls = defer_check.select(*D2["song_urls_sel"])
        # child settlement probe: slim (site_id, url, ok) scan of the
        # cycle's attempt log, pre-filtered by the (small) deferred child
        # set via a broadcast semi-join — the log is never shuffled.
        # AQE's empty-relation propagation skips the scan entirely on
        # waves with no deferred dups.
        attempts = self.visits(True).select("site_id", "url", "ok")
        if new_log is not None:
            attempts = attempts.unionByName(
                new_log.select("site_id", "url", "ok")
            )
        child_keys = song_urls.select(
            "site_id", F.col("child_url").alias("url")
        ).distinct()
        cs = (
            attempts.join(
                F.broadcast(child_keys), ["site_id", "url"], "left_semi"
            )
            .groupBy("site_id", "url")
            .agg(*D2["cs_agg"])
            .withColumnRenamed("url", "child_url")
        )
        song_state = (
            song_urls.join(cs, ["site_id", "child_url"], "left")
            .withColumn("s_has_ok", F.coalesce("s_has_ok", F.lit(False)))
            .withColumn("s_n_fail", F.coalesce("s_n_fail", F.lit(0)))
        )
        if prev_docs is not None:
            child_prev = (
                prev_keys.withColumnRenamed("url", "child_url")
                .withColumn("prev_doc", F.lit(True))
            )
            song_state = song_state.join(
                child_prev, ["site_id", "child_url"], "left"
            ).withColumn("prev_doc", F.coalesce("prev_doc", F.lit(False)))
        else:
            song_state = song_state.withColumn("prev_doc", F.lit(False))
        song_state = song_state.withColumn(
            "settled", D2["settled"]
        ).withColumn("newly_saved", D2["newly_saved"])
        dup_decided = (
            song_state.groupBy("dfs_key", "site_id", "url", "L", "n_prev")
            .agg(*D2["dup_agg"])
            .where(F.col("all_settled") == 1)
            .withColumn("action", D2["dup_action"])
            .select("dfs_key", "site_id", "url", "action")
        )
        dup_full = defer_check.drop("action").join(
            dup_decided, ["dfs_key", "site_id", "url"]
        )
        res = (
            res_others.select(*res_cols)
            .unionByName(res_imm.select(*res_cols))
            .unionByName(dup_full.select(*res_cols))
            .persist()
        )
        persisted.append(res)
        # the resolved-log write rides a background thread; the kids job
        # below consumes the same cached resolution.
        self._stage_append_bg(
            "resolved",
            res.select(
                "dfs_key", "site_id", "url", "action",
                F.lit(wave).alias("wave"), F.lit(self.cycle).alias("cycle"),
            ),
            wave,
            bg,
        )
        f_resolved = bg[-1]
        _t = _tick('resolution-submit', _t)

        # -------- children fan-out (X1–X6 + robots + LIFO rank keys) ----
        # all expression trees are wave-invariant → built once (_memo)
        X = self._memo("kids_fanout", self._build_kids_exprs)
        kids_raw = (
            res.where(F.col("action") == "expanded")
            .select(*X["explode_sel"])
            .select(*X["child_sel"])
        )
        # robots Disallow: broadcast anti-join on (site_id, path
        # prefix); statically elided when no site declares rules. The
        # path is derived from the relative url + the P18 '/' quirk —
        # no absolute URL is ever materialized in the fan-out.
        if self._any_robots:
            kids_path = kids_raw.withColumn("c_path", X["c_path"])
            rb = F.broadcast(self.robots).withColumnRenamed("site_id", "r_sid")
            kids_ok = kids_path.join(
                rb,
                (kids_path["site_id"] == F.col("r_sid"))
                & kids_path["c_path"].startswith(F.col("prefix")),
                "left_anti",
            )
        else:
            kids_ok = kids_raw
        # LIFO rank AFTER the filter (survivors keep relative pop order)
        kids = (
            kids_ok.withColumn("rank", X["rank"])
            .withColumn("c_key", X["c_key"])
            .withColumn("c_key_dec", X["c_key_dec"])
        )
        new_frontier_df = kids.select(
            *X["frontier_sel"],
            F.lit(wave).alias("wave_enq"),
            F.lit(self.cycle).alias("cycle"),
            F.col("c_key_dec").alias("key_dec"),
        )
        # J2's write runs as a background future: the plan is complete
        # (it only consumes the cached `res`), so the main thread uses
        # J2's job time to build every kid-INDEPENDENT plan below —
        # driver py4j chatter that used to be serial after the write.
        # _stage_and_read appends the frontier entry to `staged` from
        # the worker thread; the only other staged append (fetch_log)
        # already happened, so the list order stays deterministic.
        fut_j2 = self._bg_pool().submit(
            self._stage_and_read,
            "frontier", new_frontier_df, wave, FRONTIER_SCHEMA, staged,
        )
        _t = _tick('kids-submit', _t)

        # ---- kid-independent fragments (overlap J2's execution) ----
        # history/carry READS stay on this thread (see the bloom note:
        # a thunk reading history after the pipelined inflight swap
        # would see its own wave's overlay); thunks below only compose
        # plans over these pre-read inputs.
        PM = self._memo("pending_merge", self._build_pending_merge_exprs)
        if new_log is not None:
            log_agg = new_log.groupBy("site_id", "url").agg(*PM["log_agg"])
            old_side = pending.join(
                log_agg, ["site_id", "url"], "left"
            ).select(*PM["old_side_logged"])
        else:
            old_side = pending.select(*PM["old_side_plain"])
        undecided = defer_check.join(
            dup_decided.select("dfs_key", "site_id", "url"),
            ["dfs_key", "site_id", "url"],
            "left_anti",
        )
        lu = self._read_worklist("leaf_unsaved", LEAF_UNSAVED_SCHEMA)
        if new_log is not None:
            new_details = (
                self.parsed_view(new_log)
                .drop("children", "bytes")
                .withColumnRenamed("wave", "fetched_at")
            )
            # documents MERGE, waiting-leaf path: depends only on this
            # wave's parses — submitted before J2 even finishes.
            self._merge_documents(
                lu.join(dim, "site_id").join(
                    new_details, ["site_id", "url"]
                ),
                wave,
                bg,
            )
        else:
            new_details = None
        # pre-read parse history for the late-dup lookups (kid thunks)
        parse_hist = self.parsed_view(self.fetch_log(True)).select(
            "site_id", "url", "children"
        )
        detail_hist = (
            self.parsed_view(self.fetch_log(True))
            .drop("children", "bytes")
            .withColumnRenamed("wave", "fetched_at")
        )
        if new_log is not None:
            parse_hist = parse_hist.unionByName(
                self.parsed_view(new_log).select("site_id", "url", "children")
            )
            detail_hist = detail_hist.unionByName(new_details)
        _t = _tick('prekids-submit', _t)

        new_kids, n_kids, _kids_entry = fut_j2.result()
        _t = _tick('kids+stage', _t)

        if n_fetched == 0:
            # a zero-fetch wave can still progress (deferred dups
            # resolving); only now is the resolved count worth a barrier.
            n_resolved = f_resolved.result()[1]
            if n_resolved == 0:
                # nothing progressed this wave (n_kids is necessarily 0 —
                # kids explode out of expanded resolutions): either the
                # crawl is done, or the engine is stuck (a bug). Join the
                # side writes (all empty) and decide with one final
                # count: only undecidable deferred occurrences (url_ok
                # rows) indicate a stuck engine; url_ok=false rows of
                # dead URLs are expected residue (their occurrences never
                # resolve — trace marks them dead).
                for f in bg:
                    f.result()
                if unresolved.where("url_ok").count() == 0:
                    return False
                raise RuntimeError(
                    "wave made no progress: nothing pending and nothing resolvable"
                )

        # ---- kid URL-seen probe (D1): per distinct kid URL, has it been
        # attempted before (ok / failing / dead)? Feeds the three carry
        # updates and the documents late path; all consumers are
        # background writes. bloom_seen prunes the committed-log scan to
        # the maybe-seen side (false positives resolved exactly); the
        # fallback is one slim full-log aggregate.
        if n_kids > 0:
            # task_type is a function of (site_id, url), so it rides as
            # a GROUP KEY (arbitrary-width keys are fine in a hash map)
            # and both buffers stay fixed-width numerics — this agg is a
            # map-side-combinable HashAggregate. The obvious
            # first()/min(dfs_key) spelling has string buffers, which
            # silently degrades to SortAggregate: one such stage burned
            # 300s+ of pure GC per scale-8 crawl at 32 threads (BENCH.md).
            kid_urls = new_kids.groupBy("site_id", "url", "task_type").agg(
                F.min("depth").alias("depth"),
                F.min("key_dec").alias("min_key"),
            )
            hist_attempts = self.visits(True).select("site_id", "url", "ok")
            if self.bloom_seen:
                from lyrics_crawler_spark.operators.urlseen import (
                    BLOOM_SCHEMA, seen_split,
                )

                bloom = self._read_carry("url_bloom", BLOOM_SCHEMA)
                hashed = kid_urls.withColumn(
                    "url_hash", F.xxhash64("site_id", "url")
                )
                _new_side, maybe_side = seen_split(hashed, bloom, **self._bloom_params)
                # definite bloom misses provably have no committed
                # attempts — only the maybe side pays the history scan.
                hist_attempts = hist_attempts.join(
                    F.broadcast(maybe_side.select("site_id", "url")),
                    ["site_id", "url"],
                    "left_semi",
                )
            if new_log is not None:
                # this wave's outcomes are not yet committed (nor in the
                # bloom): always union them in.
                hist_attempts = hist_attempts.unionByName(
                    new_log.select("site_id", "url", "ok")
                )
            kstate = hist_attempts.groupBy("site_id", "url").agg(
                F.max("ok").alias("k_has_ok"),
                F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("k_n_fail"),
            )
            kids_checked = (
                kid_urls.join(kstate, ["site_id", "url"], "left")
                .withColumn("k_has_ok", F.coalesce("k_has_ok", F.lit(False)))
                .withColumn("k_n_fail", F.coalesce("k_n_fail", F.lit(0)))
                .persist()
            )
            persisted.append(kids_checked)
        else:
            kids_checked = None

        # ---- pending' (background): one groupBy over the union of the
        # old worklist, this wave's outcomes, and the seen-checked kids.
        # src_new marks non-carry contributions: a merged row with ANY
        # such contribution is a row whose state may have changed this
        # wave — exactly the delta-mode commit set (rows with only old
        # contributions are byte-identical to the previous carry).
        # This wave's fetch outcomes fold onto the worklist by JOIN, not
        # by a null-attribute union side: every fetched URL was selected
        # FROM pending, so the left join loses nothing — and it lets the
        # merge aggregate below carry site/host/url/task_type as GROUP
        # KEYS (hash-map keys may be any width) with purely numeric
        # buffers, i.e. a HashAggregate. The old spelling aggregated
        # first(site, ignorenulls)/min(min_key-as-string), whose string
        # buffers degrade to SortAggregate — the single largest GC source
        # in the wave loop (BENCH.md round 3).
        # (`old_side` was built pre-J2, overlapping J2's write.)
        sides = [old_side]
        if kids_checked is not None:
            kid_side = kids_checked
            if prev_keys is not None:
                # cross-cycle exists_song (base_crawler.py:195-202,
                # :442-449): a Type0/1 song saved in an earlier cycle is
                # skipped without a fetch; Type2 leaves always re-fetch (D4).
                kd = kid_side.join(dim.select("site_id", "topology"), "site_id")
                is_leaf01 = self._leaf(
                    F.col("topology"), F.col("task_type")
                ) & F.col("topology").isin(0, 1)
                kid_side = (
                    kd.where(~is_leaf01)
                    .unionByName(
                        kd.where(is_leaf01).join(
                            prev_keys, ["site_id", "url"], "left_anti"
                        )
                    )
                    .drop("topology")
                )
            sides.append(kid_side.select(*PM["kid_side"]))
        allsides = sides[0]
        for s in sides[1:]:
            allsides = allsides.unionByName(s)
        merged = (
            allsides.groupBy("site_id", "url", "task_type")
            .agg(*PM["merge_agg"])
            .withColumn("n_fail", PM["n_fail"])
            .join(dim.select("site_id", "max_err"), "site_id")
            .persist()
        )
        persisted.append(merged)
        pend_cols = [
            "site_id", "url", "task_type", "depth",
            "min_key", "n_fail",
        ]
        pend_live = ~F.col("has_ok_any") & (F.col("n_fail") < F.col("max_err"))
        self._stage_carry_bg(
            "pending",
            lambda: merged.where(pend_live).select(*pend_cols),
            lambda: merged.where(F.col("touched") == 1).select(
                *pend_cols, pend_live.alias("live")
            ),
            wave,
            bg,
        )
        carry_futures["pending"] = bg[-1]
        # URLs whose error budget exhausted THIS wave: purge their
        # occurrences from the unresolved / leaf_unsaved carries (they
        # can never resolve or save; trace derives their dead actions
        # from the logs alone).
        newly_dead = merged.where(
            (F.col("dfail") > 0)
            & ~F.col("has_ok_any")
            & (F.col("n_fail") >= F.col("max_err"))
        ).select("site_id", "url")

        # ---- unresolved' (background thunk — `undecided` was built
        # pre-J2; kn and the unions are composed on the worker thread) --
        unres_cols = [
            "dfs_key", "site_id", "url", "task_type", "depth",
            "movie", "artist", "is_exp", "url_ok", "n_prev", "children",
            "key_dec",
        ]

        def build_kn() -> DataFrame:
            """New unresolved occurrences from this wave's kids. Only
            called when kids_checked is not None; shared by the replace
            and delta thunks (exactly one of which runs)."""
            kn = (
                new_kids.join(dim, "site_id")
                .where(self._nonleaf(F.col("topology"), F.col("task_type")))
                .join(
                    kids_checked.select(
                        "site_id", "url", "k_has_ok", "k_n_fail"
                    ),
                    ["site_id", "url"],
                )
                # dead-URL occurrences never resolve — don't insert them
                .where(F.col("k_has_ok") | (F.col("k_n_fail") < F.col("max_err")))
            )
            # expander marking (D2): the occurrence the sequential
            # reference pops first = min dfs_key of the URL's FIRST batch
            # (a URL with any prior attempt or an existing unresolved
            # occurrence is not fresh — its expander already exists).
            kid_is_movie = (F.col("topology") == 0) & (F.col("task_type") == 1)
            # min over the decimal key twin (fixed-width buffer →
            # HashAggregate; min(string dfs_key) would SortAggregate)
            batch_min = (
                kn.where(kid_is_movie)
                .groupBy("site_id", "url")
                .agg(F.min("key_dec").alias("batch_min"))
            )
            known_movies = U.where(is_movie).select("site_id", "url").distinct()
            kn = (
                kn.join(F.broadcast(batch_min), ["site_id", "url"], "left")
                .join(
                    known_movies.withColumn("known", F.lit(True)),
                    ["site_id", "url"],
                    "left",
                )
                .withColumn(
                    "is_exp",
                    kid_is_movie
                    & (F.col("key_dec") == F.col("batch_min"))
                    & ~F.col("k_has_ok")
                    & (F.col("k_n_fail") == 0)
                    & F.col("known").isNull(),
                )
            )
            # dup occurrences of already-fetched URLs arrive resolvable:
            # attach their children from page history now (rare rows —
            # broadcast-filtered lookup over the pre-read parse history;
            # the log is never shuffled).
            ok_urls = kn.where("k_has_ok").select("site_id", "url").distinct()
            kid_children = parse_hist.join(
                F.broadcast(ok_urls), ["site_id", "url"], "left_semi"
            )
            kn = kn.join(kid_children, ["site_id", "url"], "left").withColumn(
                "url_ok", F.col("k_has_ok")
            )
            if prev_docs is not None:
                # number_of_songs(start_url, movie_url) over previous
                # cycles (db_operations.py:196-211), attached at insert —
                # stable within a cycle.
                n_prev_df = (
                    prev_docs.where(F.col("topology") == 0)
                    .groupBy(
                        F.col("start_url").alias("site"),
                        F.col("movie_url").alias("url"),
                    )
                    .agg(F.countDistinct("song_url").alias("n_prev"))
                    .join(dim.select("site_id", "site"), "site")
                    .select("site_id", "url", "n_prev")
                )
                kn = kn.join(n_prev_df, ["site_id", "url"], "left").withColumn(
                    "n_prev", F.coalesce("n_prev", F.lit(0))
                )
            else:
                kn = kn.withColumn("n_prev", F.lit(0).cast("bigint"))
            return kn

        def unres_next() -> DataFrame:
            parts = [
                U.where(~F.col("url_ok"))
                .join(newly_dead, ["site_id", "url"], "left_anti")
                .select(*unres_cols),
                undecided.select(*unres_cols),
            ]
            if kids_checked is not None:
                parts.append(build_kn().select(*unres_cols))
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        def unres_delta() -> DataFrame:
            # delta = changed occurrences only: flipped-but-deferred dups
            # (url_ok/children changed), newly inserted kid occurrences,
            # and tombstones for everything that left the worklist this
            # wave (resolved occurrences; occurrences of newly dead URLs).
            d = undecided.select(*unres_cols).withColumn("live", F.lit(True))
            if kids_checked is not None:
                d = d.unionByName(
                    build_kn().select(*unres_cols).withColumn("live", F.lit(True))
                )
            return d.unionByName(
                self._tombstones(res, UNRESOLVED_SCHEMA, _CARRY_KEYS["unresolved"])
            ).unionByName(
                self._tombstones(
                    U.where(~F.col("url_ok")).join(
                        newly_dead, ["site_id", "url"], "left_semi"
                    ),
                    UNRESOLVED_SCHEMA,
                    _CARRY_KEYS["unresolved"],
                )
            )

        self._stage_carry_bg("unresolved", unres_next, unres_delta, wave, bg)
        carry_futures["unresolved"] = bg[-1]

        # ---- documents MERGE late path (O1) + leaf_unsaved' (background)
        # delta = leaf occurrences saved exactly once: waiting occurrences
        # whose URL parsed THIS wave (submitted pre-J2, above) ∪ leaf kids
        # enqueued this wave whose URL is already parsed (late dup
        # expansions). The parse wave rides along as `fetched_at` (O2
        # virtual clock).
        if kids_checked is not None:
            kl = (
                new_kids.join(dim, "site_id")
                .where(self._leaf(F.col("topology"), F.col("task_type")))
                .join(
                    kids_checked.select(
                        "site_id", "url", "k_has_ok", "k_n_fail"
                    ),
                    ["site_id", "url"],
                )
            )
            if prev_keys is not None:
                is_leaf01 = F.col("topology").isin(0, 1)
                kl = kl.where(~is_leaf01).unionByName(
                    kl.where(is_leaf01).join(
                        prev_keys, ["site_id", "url"], "left_anti"
                    )
                )
            # late path: leaf kid of an already-parsed URL saves now with
            # the historical parse (broadcast-filtered lookup over the
            # pre-read detail history)
            late = kl.where("k_has_ok")

            def late_delta():
                late_details = detail_hist.join(
                    F.broadcast(late.select("site_id", "url").distinct()),
                    ["site_id", "url"],
                    "left_semi",
                )
                return late.join(late_details, ["site_id", "url"])

            self._merge_documents(late_delta, wave, bg)
        else:
            kl = None
        lu_cols = [
            "dfs_key", "site_id", "url", "task_type",
            "movie", "movie_url", "artist", "album", "album_url", "song",
        ]
        kl_live = ~F.col("k_has_ok") & (F.col("k_n_fail") < F.col("max_err"))

        def lu_base() -> DataFrame:
            if new_log is not None:
                return lu.join(
                    new_details.select("site_id", "url"),
                    ["site_id", "url"],
                    "left_anti",
                ).join(newly_dead, ["site_id", "url"], "left_anti")
            return lu.join(newly_dead, ["site_id", "url"], "left_anti")

        def lu_next() -> DataFrame:
            out = lu_base().select(*lu_cols)
            if kl is not None:
                out = out.unionByName(kl.where(kl_live).select(*lu_cols))
            return out

        def lu_delta() -> DataFrame:
            # delta = new waiting leaf occurrences + tombstones for rows
            # whose URL saved this wave or died this wave.
            tomb_src = lu.join(newly_dead, ["site_id", "url"], "left_semi")
            if new_log is not None:
                tomb_src = tomb_src.unionByName(
                    lu.join(
                        new_details.select("site_id", "url"),
                        ["site_id", "url"],
                        "left_semi",
                    )
                )
            d = self._tombstones(
                tomb_src, LEAF_UNSAVED_SCHEMA, _CARRY_KEYS["leaf_unsaved"]
            )
            if kl is not None:
                d = d.unionByName(
                    kl.where(kl_live).select(*lu_cols).withColumn(
                        "live", F.lit(True)
                    )
                )
            return d

        self._stage_carry_bg("leaf_unsaved", lu_next, lu_delta, wave, bg)
        carry_futures["leaf_unsaved"] = bg[-1]
        _t = _tick('carries-submit', _t)

        # `resolved` (the f_resolved count) is filled at gather time —
        # blocking on the resolved-log write mid-wave was a pointless
        # foreground barrier whenever n_fetched > 0 (progress is already
        # proven).
        stats = {
            "fetched": n_fetched,
            "resolved": None,
            "kids": n_kids,
            "wall_s": round(time.time() - t0, 3),
        }
        if self.pipeline_commits:
            # drain + commit the PREVIOUS wave (its background writes
            # overlapped this whole wave's foreground), then leave this
            # wave inflight; the next wave (or run()'s finally) commits
            # it. Ownership of the persisted blocks moves to the
            # inflight record so they survive until its writes finish.
            self._finalize_inflight()
            _t = _tick('prev-gather', _t)
            self._inflight = {
                "wave": wave,
                "staged": staged,
                "bg": bg,
                "stats": stats,
                "f_resolved": f_resolved,
                "persisted": list(persisted),
                "carry_futures": carry_futures,
            }
            persisted.clear()
        else:
            for f in bg:
                entry, _n = f.result()
                if entry:
                    staged.append(entry)
            stats["resolved"] = f_resolved.result()[1]
            _t = _tick('bg-gather', _t)
            self.store.commit_wave(wave, staged, stats)
        return True

    # ---------------- documents sink ----------------

    def _memo(self, key: str, build):
        """Cache wave-invariant Column expression trees. Every pyspark
        expression node is a py4j round trip (~0.9 ms); the wave loop
        used to rebuild ~9,300 of them per wave (cProfile: 46,700 round
        trips over a 5-wave crawl — BENCH.md round 3). Columns are
        immutable unresolved trees, so one JVM-side instance serves
        every wave."""
        d = self.__dict__.setdefault("_expr_memo", {})
        if key not in d:
            d[key] = build()
        return d[key]

    def _docs_sink_exprs(self):
        def build():
            withcols = [
                (
                    "movie_val",
                    F.when(F.col("topology") == 0, F.col("movie"))
                    .when(F.col("topology") == 1, F.col("album"))
                    .otherwise(F.col("d_album")),
                ),
                (
                    "movie_url_val",
                    F.when(F.col("topology") == 0, F.col("movie_url"))
                    .when(F.col("topology") == 1, F.col("album_url"))
                    # Type2 quirk (base_crawler.py:732)
                    .otherwise(F.col("url")),
                ),
                (
                    "singers_val",
                    F.when(F.col("topology") == 0, F.col("d_singers"))
                    .when(F.col("topology") == 1, F.array(F.col("artist")))
                    .otherwise(
                        F.concat(
                            F.coalesce(
                                F.col("d_other"), F.array().cast("array<string>")
                            ),
                            F.array(F.col("artist")),
                        )
                    ),
                ),
                (
                    "directors_val",
                    F.when(F.col("topology") == 0, F.col("d_directors")).otherwise(
                        F.array(F.col("artist"))
                    ),
                ),
                (
                    "lyricists_val",
                    F.when(F.col("topology") == 1, F.array(F.col("artist")))
                    .otherwise(F.col("d_lyricists")),
                ),
                # P17 unescape — once, at the sink (db_operations.py:37-42).
                # unescape_col/unescape_arr_col (functions/textops.py) run
                # the '&amp;'-only fast path JVM-side and null-mask the
                # Arrow UDF input, so only strings with non-'&amp;' entity
                # shapes pay the python boundary (the pre-fast-path stage
                # was 458 s of JVM GC at crawl scale 40 — BENCH.md).
                ("song_u", unescape_col(F.col("song"))),
                ("movie_u", unescape_col(F.col("movie_val"))),
                ("lyrics_u", unescape_col(F.col("d_lyrics"))),
                ("singers_u", unescape_arr_col(F.col("singers_val"))),
                ("directors_u", unescape_arr_col(F.col("directors_val"))),
                ("lyricists_u", unescape_arr_col(F.col("lyricists_val"))),
            ]
            sel_pre = [
                F.col("site").alias("start_url"),
                F.col("url").alias("song_url"),
                # doc_id = the song occurrence's absolute URL: plain
                # concat for every topology (leaves are never the
                # topo-1 artist quirk case — functions/urls.py)
                F.concat(F.col("site"), F.col("url")).alias("doc_id"),
                F.col("host"),
                F.col("topology"),
                F.col("song_u").alias("song"),
                F.col("movie_u").alias("movie"),
                F.col("movie_url_val").alias("movie_url"),
                F.col("artist"),
                F.col("dfs_key"),
            ]
            sel_post = [
                F.col("fetched_at").cast("int").alias("fetched_at"),
                spans_expr(
                    F.col("movie_u"), F.col("singers_u"), F.col("directors_u"),
                    F.col("lyricists_u"), F.col("lyrics_u"),
                ).alias("spans"),
            ]
            return withcols, sel_pre, sel_post

        return self._memo("docs_sink", build)

    def _build_d2_exprs(self) -> dict:
        """Wave-invariant expression trees of the D2 movie resolution
        (expander / deferred-dup settlement); see :meth:`_memo`."""
        return {
            "is_movie": (F.col("topology") == 0) & (F.col("task_type") == 1),
            "imm_where": F.col("is_exp")
            | (F.col("L") == 0)
            | (F.col("n_prev") == F.col("L")),
            "imm_action": F.when(
                F.col("n_prev") == F.col("L"), F.lit("skipped_no_new")
            ).otherwise(F.lit("expanded")),
            "defer_where": ~F.col("is_exp")
            & (F.col("L") > 0)
            & (F.col("n_prev") != F.col("L")),
            "song_urls_sel": [
                F.col(c)
                for c in ("dfs_key", "site_id", "url", "max_err", "L", "n_prev")
            ] + [
                F.explode(
                    F.array_distinct(F.transform("children", lambda c: c["url"]))
                ).alias("child_url"),
            ],
            "cs_agg": [
                F.max("ok").alias("s_has_ok"),
                F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("s_n_fail"),
            ],
            "settled": F.col("prev_doc")
            | F.col("s_has_ok")
            | (F.col("s_n_fail") >= F.col("max_err")),
            "newly_saved": F.col("s_has_ok") & ~F.col("prev_doc"),
            "dup_agg": [
                F.min(F.col("settled").cast("int")).alias("all_settled"),
                F.sum(F.col("newly_saved").cast("int")).alias("n_new_saved"),
            ],
            "dup_action": F.when(
                F.col("n_prev") + F.col("n_new_saved") == F.col("L"),
                F.lit("skipped_no_new"),
            ).otherwise(F.lit("expanded")),
        }

    def _build_pending_merge_exprs(self) -> dict:
        """Wave-invariant expression trees of the pending' merge; see
        :meth:`_memo` and the in-line comments at the call site (the
        HashAggregate-vs-SortAggregate buffer story lives there)."""
        keys = ["site_id", "url", "task_type", "depth"]
        return {
            "log_agg": [
                F.max("ok").alias("w_ok"),
                F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("w_dfail"),
            ],
            "old_side_logged": [F.col(c) for c in keys] + [
                F.col("min_key"), F.col("n_fail"),
                F.coalesce("w_ok", F.lit(False)).alias("has_ok"),
                F.coalesce("w_dfail", F.lit(0)).alias("fail_delta"),
                F.col("w_ok").isNotNull().cast("int").alias("src_new"),
            ],
            "old_side_plain": [F.col(c) for c in keys] + [
                F.col("min_key"), F.col("n_fail"),
                F.lit(False).alias("has_ok"), F.lit(0).alias("fail_delta"),
                F.lit(0).alias("src_new"),
            ],
            "kid_side": [F.col(c) for c in keys] + [
                F.col("min_key"), F.col("k_n_fail").alias("n_fail"),
                F.col("k_has_ok").alias("has_ok"),
                F.lit(0).alias("fail_delta"), F.lit(1).alias("src_new"),
            ],
            "merge_agg": [
                F.max("has_ok").alias("has_ok_any"),
                F.max("n_fail").alias("n_fail0"),
                F.sum("fail_delta").alias("dfail"),
                F.max("src_new").alias("touched"),
                F.min("depth").alias("depth"),
                F.min("min_key").alias("min_key"),
            ],
            "n_fail": F.coalesce("n_fail0", F.lit(0)) + F.col("dfail"),
        }

    def _build_kids_exprs(self) -> dict:
        """Wave-invariant expression trees of the children fan-out
        (X1–X6 + LIFO rank keys); see :meth:`_memo`."""
        wpar = Window.partitionBy("parent_key").orderBy(F.desc("pos"))
        return {
            "explode_sel": [
                F.col("dfs_key").alias("parent_key"),
                F.col("key_dec").alias("parent_dec"),
                F.col("url").alias("parent_url"),
                F.col("site_id"), F.col("topology"), F.col("depth"),
                F.col("movie").alias("p_movie"),
                F.col("artist").alias("p_artist"),
                F.posexplode("children").alias("pos", "child"),
            ],
            "child_sel": [
                F.col(c) for c in (
                    "parent_key", "parent_dec", "parent_url", "site_id",
                    "topology", "depth", "pos", "p_movie", "p_artist",
                )
            ] + [
                F.col("child.url").alias("c_url"),
                F.col("child.label").alias("c_label"),
                F.col("child.child_type").alias("c_type"),
                F.col("child.album").alias("c_album"),
            ],
            # site-relative path of the child (the P18 '/' quirk inserts
            # the separator the topo-1 artist links lack); sites are
            # scheme://host with no path component (SiteSpec contract),
            # so this equals abs_url minus scheme://host.
            "c_path": F.when(
                (F.col("topology") == 1) & (F.col("c_type") == 1),
                F.concat(F.lit("/"), F.col("c_url")),
            ).otherwise(F.col("c_url")),
            "rank": F.row_number().over(wpar) - 1,
            "c_key": child_key(F.col("parent_key"), F.col("rank")),
            "c_key_dec": child_key_dec(
                F.col("parent_dec"), F.col("rank"), F.col("depth")
            ),
            "frontier_sel": [
                F.col("c_key").alias("dfs_key"),
                F.col("c_url").alias("url"),
                F.col("site_id"),
                F.col("c_type").alias("task_type"),
                (F.col("depth") + 1).alias("depth"),
                F.when(
                    (F.col("topology") == 0) & (F.col("c_type") == 1),
                    F.col("c_label"),
                )
                .when(
                    (F.col("topology") == 0) & (F.col("c_type") == 2),
                    F.col("p_movie"),
                )
                .alias("movie"),
                F.when(
                    (F.col("topology") == 0) & (F.col("c_type") == 2),
                    F.col("parent_url"),
                ).alias("movie_url"),
                F.when(
                    F.col("topology").isin(1, 2) & (F.col("c_type") == 1),
                    F.col("c_label"),
                )
                .when(
                    F.col("topology").isin(1, 2) & (F.col("c_type") != 1),
                    F.col("p_artist"),
                )
                .alias("artist"),
                F.when(
                    (F.col("topology") == 1) & (F.col("c_type") == 2),
                    F.col("c_album"),
                ).alias("album"),
                F.when(
                    (F.col("topology") == 1) & (F.col("c_type") == 2),
                    F.col("parent_url"),
                ).alias("album_url"),
                F.when(
                    ((F.col("topology") == 0) & (F.col("c_type") == 2))
                    | ((F.col("topology") == 1) & (F.col("c_type") == 2))
                    | ((F.col("topology") == 2) & (F.col("c_type") == 3)),
                    F.col("c_label"),
                ).alias("song"),
            ],
        }

    def _merge_documents(self, delta: DataFrame, wave: int, futures: list) -> None:
        """Per-wave MERGE INTO documents, merge-on-read style: the wave
        appends its delta (O(wave) commit, never O(state)); the win rule
        — Type0/1 keep the MIN-dfs_key occurrence (first pop saves,
        later pops skip via exists_song, db_operations.py:214-229),
        Type2 keeps the MAX (D4 missing return, base_crawler.py:714-722
        — every pop re-saves, last wins) — is associative + idempotent,
        so read-time resolution (:meth:`_resolve_documents`) equals one
        batch merge (resume-safe). On Iceberg this is MERGE INTO … WHEN
        MATCHED AND s.key <wins> t.key THEN UPDATE with merge-on-read
        row deltas."""
        withcols, sel_pre, sel_post = self._docs_sink_exprs()

        # the sink plan (a ~40-node withColumn/select chain) is built on
        # the background thread too — `delta` may itself be a thunk.
        def docs_delta():
            plan = delta() if callable(delta) else delta
            for name, c in withcols:
                plan = plan.withColumn(name, c)
            return plan.select(
                *sel_pre,
                F.lit(wave).alias("wave"),
                F.lit(self.cycle).alias("cycle"),
                *sel_post,
            )

        # append the delta only — the win-rule resolves at read
        # (:meth:`documents`); a wave never rewrites history. The write
        # runs on a background thread (it gates nothing downstream in the
        # wave); its Observation count drops empty deltas from the commit.
        self._stage_append_bg("documents", docs_delta, wave, futures)

    # ---------------- derived outputs ----------------

    def seen(self) -> DataFrame:
        """The URL-seen set (exists_song semantics): one row per saved
        (start_url, song_url), with its 64-bit hash key."""
        return self.documents().select(
            "start_url", "song_url", "doc_id",
            F.xxhash64("doc_id").alias("url_hash"),
            F.col("wave").alias("first_wave"),
        )

    def trace(self) -> DataFrame:
        """Reconstruct the totally-ordered single-threaded visit trace
        (golden contract). Only valid on a finished run."""
        dim = F.broadcast(self.site_dim)
        occ = self.frontier().join(dim, "site_id")
        # URL state is per-cycle (fresh retry ladders each re-crawl pass);
        # each occurrence joins its own cycle's ladder.
        us = self._url_state(self.visits(), by_cycle=True)
        occ = (
            occ.join(us, ["cycle", "site_id", "url"], "left")
            .withColumn("has_ok", F.coalesce("has_ok", F.lit(False)))
            .withColumn("n_fail", F.coalesce("n_fail", F.lit(0)))
        )
        is_leaf = self._leaf(F.col("topology"), F.col("task_type"))
        wleaf = Window.partitionBy("site_id", "url")
        # cross-cycle facts per URL: whether it EVER fetched ok (a Type0/1
        # leaf saved in cycle 1 is not re-fetched in cycle 2 but is very
        # much not dead), and the first-ever leaf occurrence (the saver —
        # every later occurrence in any cycle is skipped_seen).
        occ = (
            occ.withColumn("has_ok_any", F.max("has_ok").over(wleaf))
            .withColumn(
                "leaf_winner",
                F.min(
                    F.when(is_leaf, F.struct("cycle", "dfs_key"))
                ).over(wleaf),
            )
            .join(
                self.resolved().select(
                    "cycle", "dfs_key", "site_id", "url",
                    F.col("action").alias("res_action"),
                ),
                ["cycle", "dfs_key", "site_id", "url"],
                "left",
            )
        )

        dead = ~F.col("has_ok_any")
        skipped_seen = (
            is_leaf
            & F.col("topology").isin(0, 1)
            & (F.struct("cycle", "dfs_key") != F.col("leaf_winner"))
        )
        is_movie = (F.col("topology") == 0) & (F.col("task_type") == 1)

        occ = occ.withColumn(
            "terminal_action",
            F.when(dead, F.lit("dead"))
            .when(skipped_seen, F.lit("skipped_seen"))
            .when(
                is_movie,
                F.when(F.col("res_action") == "expanded", F.lit("fetched")).otherwise(
                    F.lit("skipped_no_new")
                ),
            )
            .otherwise(F.lit("fetched")),
        ).withColumn(
            "terminal_n",
            F.when(dead, F.col("max_err"))
            .when(skipped_seen, F.lit(0))
            .otherwise(F.col("n_fail")),
        )

        err_rows = (
            occ.where(F.col("terminal_n") > 0)
            .select(
                "site", "host", "url", "task_type", "cycle", "dfs_key",
                F.explode(F.sequence(F.lit(0), F.col("terminal_n") - 1)).alias(
                    "n_errors"
                ),
            )
            .withColumn("action", F.lit("error"))
        )
        term_rows = occ.select(
            "site", "host", "url", "task_type", "cycle", "dfs_key",
            F.col("terminal_n").alias("n_errors"),
            F.col("terminal_action").alias("action"),
        )
        allrows = err_rows.unionByName(term_rows)
        # scale-safe per-site sequencing: Window.partitionBy("site") would
        # funnel each site's ENTIRE trace through one task (site
        # cardinality ~5 — a 10^8-row trace would OOM it). Instead:
        # range-partition the global sort order, rank locally within each
        # (range-slice, site) group — every group is bounded by the range
        # partitioner's balanced split size — then add back the per-slice
        # cumulative offsets (a tiny P×sites table, broadcast).
        order = ["cycle", "dfs_key", "n_errors"]
        parts = allrows.repartitionByRange("site", *order).withColumn(
            "_pid", F.spark_partition_id()
        )
        wloc = Window.partitionBy("_pid", "site").orderBy(*order)
        local = parts.withColumn("_rn", F.row_number().over(wloc))
        counts = local.groupBy("_pid", "site").agg(F.count(F.lit(1)).alias("_cnt"))
        woff = (
            Window.partitionBy("site")
            .orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = counts.withColumn(
            "_off", F.coalesce(F.sum("_cnt").over(woff), F.lit(0))
        ).drop("_cnt")
        return (
            local.join(F.broadcast(offsets), ["_pid", "site"])
            .withColumn("seq", (F.col("_rn") + F.col("_off")).cast("int"))
            .drop("_pid", "_rn", "_off")
        )
