"""The wave-loop crawl engine — Spark-native replacement for the
reference's thread/queue machinery (base_crawler.py:45-145 and twins).

Execution model (SURVEY.md §3.1 "Spark lifecycle equivalent"):

    while pending work:
        1. derive URL settlement state from the append-only fetch log
        2. pick this wave's fetch set: per-site minimum pending depth
           (BSP frontier expansion), per-host politeness budget top-k
        3. one Arrow-batched fetch+parse pass (mapInPandas)
        4. resolve non-leaf occurrences (F2 dispatch + the movie
           count-equality skip D2), explode children with robots
           anti-join + LIFO rank keys, MERGE the documents sink
        5. commit one snapshot manifest (checkpoint; resume-safe)

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
- all state tables are append-only logs; a wave commits O(wave) bytes,
  never O(state) — except the documents MERGE, which is copy-on-write
  here and becomes an Iceberg merge-on-read MERGE INTO on a cluster;
- the settlement join (frontier ⋈ fetch_log) is an equi-join on abs_url —
  hash-partitioned, AQE-skew-handled; per-host politeness windows run
  only for capped hosts (uncapped hosts never shuffle for selection);
- site/robots dimensions are broadcast joins;
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

from lyrics_crawler_spark.functions.textops import unescape_arr, unescape_str
from lyrics_crawler_spark.operators.priority import child_key, seed_key
from lyrics_crawler_spark.operators.spans_sql import spans_expr
from lyrics_crawler_spark.sitegen.graph import SiteGraph, SiteSpec
from lyrics_crawler_spark.sources.fetch_stage import FETCH_SCHEMA, make_fetch_parse
from lyrics_crawler_spark.tables.store import SnapshotStore

FRONTIER_SCHEMA = (
    "dfs_key string, url string, abs_url string, host string, site string, "
    "task_type int, depth int, movie string, movie_url string, artist string, "
    "album string, album_url string, song string, wave_enq int, cycle int"
)

FETCH_LOG_SCHEMA = (
    "abs_url string, wave int, attempt int, ok boolean, bytes long, "
    "partition_id int, user_agent string, host string, delay_s double, "
    "children array<struct<url:string,label:string,child_type:int,album:string>>, "
    "d_album string, d_lyrics string, d_singers array<string>, "
    "d_directors array<string>, d_lyricists array<string>, d_other array<string>, "
    "cycle int"
)

RESOLVED_SCHEMA = "dfs_key string, abs_url string, action string, wave int, cycle int"

# politeness delay midpoint of randint(35, 60) (network_manager.py:44-46),
# applied as *virtual* time — the engine never sleeps.
DELAY_MIDPOINT_S = 47.5

DOCS_SCHEMA = (
    "start_url string, song_url string, doc_id string, host string, "
    "topology int, song string, movie string, movie_url string, "
    "artist string, dfs_key string, wave int, cycle int, fetched_at int, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


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
    ):
        """``bloom_seen`` enables the partitioned bloom URL-seen
        pre-filter (operators/urlseen.py): frontier URLs the bloom
        proves unfetched skip the exact settlement join entirely; only
        the maybe-seen remainder (true hits + ~2% fp at k=4) pays it.
        Results are identical either way (fp resolved exactly) — the
        flag trades an extra Arrow stage per wave for a much smaller
        seen-join, the right trade once the fetch log dwarfs a wave
        (the 10^10-URL regime; at sandbox scale the exact join is
        already cheap, so benches default it off)."""
        self.spark = spark
        self.bloom_seen = bloom_seen
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
            {"bloom_seen": True, **self._bloom_params}
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
            self._pool = ThreadPoolExecutor(
                max_workers=5, thread_name_prefix="lcs-wave-bg"
            )
        return self._pool

    def _stage_append_bg(self, table: str, df: DataFrame, wave: int, futures: list):
        """Stage an append snapshot on a background thread. The future
        resolves to ``(manifest_entry_or_None, row_count)``; empty
        snapshots resolve to (None, 0) and are dropped from the commit.
        Uncommitted output of a failed wave is orphaned data, invisible
        to readers — the same crash-safety story as the foreground path."""

        def job():
            from pyspark.sql import Observation

            obs = Observation()
            entry = self.store.stage_append(
                table, df.observe(obs, F.count(F.lit(1)).alias("n")), wave
            )
            n = obs.get["n"]
            return (entry if n else None), n

        futures.append(self._bg_pool().submit(job))

    def _set_specs(self, specs: list[SiteSpec]) -> None:
        """Install (or replace, between re-crawl cycles) the site specs
        and their derived dimension tables."""
        self.specs = specs
        self.specs_by_site = {s.start_url: s for s in specs}
        # site dimension (broadcast); host intentionally excluded — the
        # frontier carries host, keeping joins unambiguous.
        self.site_dim = self.spark.createDataFrame(
            [
                (
                    s.start_url,
                    s.dialect,
                    s.topology,
                    s.max_err,
                    s.politeness_budget,
                    DELAY_MIDPOINT_S if s.delay_request else 0.0,
                )
                for s in specs
            ],
            "site string, dialect string, topology int, max_err int, "
            "budget int, delay_s double",
        )
        robots_rows = [(s.host, p) for s in specs for p in s.robots_disallow] or [
            ("__none__", "__never__")
        ]
        self.robots = self.spark.createDataFrame(
            robots_rows, "host string, prefix string"
        )
        # static plan trims: when NO site declares a politeness budget /
        # robots rules, the per-host window / anti-join never changes the
        # result — skip those operators entirely (fewer AQE stages per
        # wave; per-wave serial latency is the scaling bottleneck).
        self._any_budget = any(s.politeness_budget is not None for s in specs)
        self._any_robots = any(s.robots_disallow for s in specs)

    # ---------------- table access ----------------

    def _read(self, table: str, schema: str) -> DataFrame:
        df = self.store.read(table)
        if df is None:
            return self.spark.createDataFrame([], schema)
        return df

    def _stage_and_read(
        self, table: str, df: DataFrame, wave: int, schema: str, staged: list
    ) -> DataFrame:
        """Stage an append snapshot; return a re-read of the written file
        (downstream ops never recompute the plan). The plan is computed
        exactly once (the write); the row count rides on the SAME job via
        an Observation (no separate count job — per-wave fixed overhead
        is the scaling killer at high parallelism). The re-read carries an
        explicit schema so even an empty snapshot round-trips, and empty
        snapshots are dropped from the commit (a parquet dir with no part
        files can't be re-read without a schema)."""
        from pyspark.sql import Observation

        obs = Observation()
        entry = self.store.stage_append(
            table, df.observe(obs, F.count(F.lit(1)).alias("n")), wave
        )
        n = obs.get["n"]
        if n == 0:
            return self.spark.createDataFrame([], schema), 0
        staged.append(entry)
        out = self.spark.read.schema(schema).parquet(entry["path"])
        return out, n

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
            "abs_url", "wave", "attempt", "ok", "cycle"
        )

    def parsed_view(self, log: DataFrame) -> DataFrame:
        return log.where("ok").select(
            "abs_url", "wave", "bytes", "children", "d_album", "d_lyrics",
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
            .groupBy(F.col("abs_url").alias("movie_abs"))
            .agg(F.max("wave").alias("touch_wave"))
        )
        return (
            docs.withColumn("last_updated", F.col("wave"))
            .join(
                touches,
                F.concat(F.col("start_url"), F.col("movie_url")) == F.col("movie_abs"),
                "left",
            )
            .withColumn(
                "last_crawled",
                F.greatest(
                    F.col("last_updated"),
                    F.coalesce(F.col("touch_wave"), F.lit(-1)),
                ),
            )
            .drop("movie_abs", "touch_wave")
        )

    @staticmethod
    def _resolve_documents(merged_src: DataFrame) -> DataFrame:
        """MERGE resolution: min-dfs_key wins for Type0/1 (first pop
        saves; later pops skip via exists_song), max for Type2 (the D4
        missing-return quirk — every pop re-saves, last wins). Every row
        of a (start_url, song_url) group shares its topology, so
        first(topology) picks the rule exactly.

        Shape note: the winner is found on a *slim* key-only aggregate
        (three string columns — map-side combinable), then kept via a
        left-semi join back. The obvious one-pass min_by/max_by over the
        full row struct allocates two span-array deep copies per input
        row in the agg buffers — measured 200s+ of GC in one stage at
        32 threads; the slim agg + semi-join does no row construction
        at all (UnsafeRow passthrough)."""
        winners = (
            merged_src.groupBy("start_url", "song_url")
            .agg(
                F.min(F.struct("cycle", "dfs_key")).alias("kmin"),
                F.max(F.struct("cycle", "dfs_key")).alias("kmax"),
                F.first("topology").alias("topo"),
            )
            .select(
                "start_url",
                "song_url",
                F.when(F.col("topo") == 2, F.col("kmax"))
                .otherwise(F.col("kmin"))
                .alias("w"),
            )
            .select(
                "start_url", "song_url",
                F.col("w.cycle").alias("cycle"),
                F.col("w.dfs_key").alias("dfs_key"),
            )
        )
        # (start_url, song_url, cycle, dfs_key) is unique in the log —
        # each occurrence is saved exactly once per cycle — so the
        # semi-join keeps exactly one row per document. Ordering is
        # lexicographic on (cycle, dfs_key): Type0/1 keep the first-ever
        # save, Type2 the last re-save (latest cycle wins — re-crawls
        # refresh Type2 content, db_operations.py:79-99 UPDATE path).
        return merged_src.join(
            winners, ["start_url", "song_url", "cycle", "dfs_key"], "left_semi"
        )

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

    # ---------------- seeding (wave 0) ----------------

    def _seed_cycle(self, cycle: int, wave: int) -> None:
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
            for i, u in enumerate(allowed):
                rows.append(
                    (
                        seed_key(i, n), u, spec.start_url + u, spec.host,
                        spec.start_url, 0, 0,
                        None, None, None, None, None, None, wave, cycle,
                    )
                )
        df = self.spark.createDataFrame(rows, FRONTIER_SCHEMA)
        staged = [self.store.stage_append("frontier", df, wave)]
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
        keys = ["cycle", "abs_url"] if by_cycle else ["abs_url"]
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
        while max_waves is None or waves_done < max_waves:
            if not self._run_wave(wave + 1):
                break
            wave += 1
            waves_done += 1
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
        # frontier is consulted by ~5 independent jobs per wave (work
        # list, resolution, expansion, leaf join) — cache it once per
        # wave instead of re-scanning the snapshot log each time.
        Fr = self.frontier(True).persist()
        persisted.append(Fr)
        log = self.fetch_log(True)
        R = self.resolved(True)
        us = self._url_state(self.visits(True))
        dim = F.broadcast(self.site_dim)
        # documents from PREVIOUS cycles: the cross-cycle exists_song /
        # number_of_songs state (stable throughout a cycle). None in
        # cycle 0 — every cross-cycle operator is statically elided.
        doc_log = self.store.read("documents") if self.cycle > 0 else None
        prev_docs = (
            doc_log.where(F.col("cycle") < self.cycle) if doc_log is not None else None
        )

        # distinct-URL work list (all occurrence fields per URL are equal
        # except depth/dfs_key, aggregated min)
        urls_base = (
            Fr.groupBy("abs_url")
            .agg(
                F.first("site").alias("site"),
                F.first("host").alias("host"),
                F.first("url").alias("url"),
                F.first("task_type").alias("task_type"),
                F.min("depth").alias("depth"),
                F.min("dfs_key").alias("min_key"),
            )
            .join(dim, "site")
        )
        if self.bloom_seen:
            # partitioned bloom pre-filter (D1 scale path): definite
            # bloom misses are provably unfetched — they skip the exact
            # settlement join; only maybe-hits pay it. fp resolved
            # exactly, so `urls` is value-identical to the plain join.
            from lyrics_crawler_spark.operators.urlseen import (
                BLOOM_SCHEMA, seen_split,
            )

            bloom = self._read("url_bloom", BLOOM_SCHEMA)
            hashed = urls_base.withColumn("url_hash", F.xxhash64("abs_url"))
            new_side, maybe_side = seen_split(
                hashed, bloom, **self._bloom_params
            )
            urls = (
                new_side.withColumn("has_ok", F.lit(False))
                .withColumn("n_fail", F.lit(0).cast("bigint"))
                .unionByName(
                    maybe_side.join(us, "abs_url", "left")
                    .withColumn("has_ok", F.coalesce("has_ok", F.lit(False)))
                    .withColumn("n_fail", F.coalesce("n_fail", F.lit(0)))
                )
                .drop("url_hash")
            )
        else:
            urls = (
                urls_base.join(us, "abs_url", "left")
                .withColumn("has_ok", F.coalesce("has_ok", F.lit(False)))
                .withColumn("n_fail", F.coalesce("n_fail", F.lit(0)))
            )
        pending = urls.where(
            ~F.col("has_ok") & (F.col("n_fail") < F.col("max_err"))
        )
        if prev_docs is not None:
            # cross-cycle exists_song (base_crawler.py:195-202, :442-449):
            # a Type0/1 song saved in an earlier cycle is skipped without
            # a fetch. Within a cycle the settlement join already covers
            # it; Type2 leaves always re-fetch (D4).
            prev_keys = prev_docs.select(
                F.col("start_url").alias("site"), F.col("song_url").alias("url")
            ).distinct()
            is_leaf01 = self._leaf(
                F.col("topology"), F.col("task_type")
            ) & F.col("topology").isin(0, 1)
            pending = pending.where(~is_leaf01).unionByName(
                pending.where(is_leaf01).join(prev_keys, ["site", "url"], "left_anti")
            )

        # unresolved non-leaf occurrences over already-fetched URLs
        occ_dim = Fr.join(dim, "site")
        # NB: DFS keys are only unique *within* a site (every site's first
        # seed is 00000000) — all resolution joins key on (dfs_key, abs_url).
        unresolved = (
            occ_dim.where(self._nonleaf(F.col("topology"), F.col("task_type")))
            .join(R.select("dfs_key", "abs_url"), ["dfs_key", "abs_url"], "left_anti")
            .join(us.where("has_ok").select("abs_url"), "abs_url", "left_semi")
        )

        staged: list[dict] = []
        t0 = time.time()
        _t = time.time()

        # ---- fetch selection + fetch, all inside ONE write job: the
        # staged snapshot's footer count doubles as the pending probe ----
        # per-site minimum pending depth: a window partitioned by `site`
        # would funnel every pending row of a site through ONE task (site
        # cardinality is tiny) — use a map-side-combinable groupBy and
        # broadcast the per-site minima back instead (scales linearly).
        site_min = pending.groupBy("site").agg(
            F.min("depth").alias("site_min_depth")
        )
        at_depth = pending.join(F.broadcast(site_min), "site").where(
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
            "site", "abs_url", "url", "task_type", "host", "delay_s",
            F.col("n_fail").cast("int").alias("attempt"),
        )

        # fetch+parse: repartition by URL hash = domain-salted spread.
        # host/delay_s ride through the Arrow stage (echoed per row), so
        # no join-back against the wave input is needed afterwards.
        fetched = wave_urls.repartition(
            self.fetch_partitions, "abs_url"
        ).mapInPandas(make_fetch_parse(self.specs_by_site), FETCH_SCHEMA)
        new_log_df = (
            fetched.withColumn("wave", F.lit(wave))
            .withColumn("cycle", F.lit(self.cycle))
            .selectExpr(
                "abs_url", "wave", "attempt", "ok", "bytes", "partition_id",
                "user_agent", "host", "delay_s", "children", "d_album",
                "d_lyrics", "d_singers", "d_directors", "d_lyricists", "d_other",
                "cycle",
            )
        )
        new_log, n_fetched = self._stage_and_read(
            "fetch_log", new_log_df, wave, FETCH_LOG_SCHEMA, staged
        )
        if n_fetched == 0:
            new_log = None
        _t = _tick('fetch+stage', _t)

        # side writes that depend only on this wave's fetch-log file run
        # on background threads, off the wave's critical path; their
        # manifest entries are gathered before commit.
        bg: list = []
        if new_log is not None:
            snapshot_id = staged[-1]["path"]
            # per-wave, per-host, per-partition lineage metrics (O4)
            met = (
                new_log.groupBy("host", "partition_id")
                .agg(
                    F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("urls_fetched"),
                    F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("errors"),
                    F.sum(F.when(F.col("ok"), F.col("bytes")).otherwise(0)).alias("bytes"),
                    F.sum("delay_s").alias("vtime_s"),
                    F.count("*").alias("urls_attempted"),
                )
                .withColumn("wave", F.lit(wave))
                .withColumn("snapshot_id", F.lit(snapshot_id))
            )
            self._stage_append_bg("metrics", met, wave, bg)
            if self.bloom_seen:
                # bloom delta for every URL attempted this wave (ok and
                # failed — mirrors _url_state, which counts both). One
                # bitset row per touched partition; merged by OR at
                # probe time, so this too is an append-only log.
                from lyrics_crawler_spark.operators.urlseen import bloom_build

                delta_bits = bloom_build(
                    new_log.select(F.xxhash64("abs_url").alias("url_hash")),
                    **self._bloom_params,
                )
                self._stage_append_bg("url_bloom", delta_bits, wave, bg)
            _t = _tick('metrics-submit', _t)

        # parsed view + settled URL state each feed 2-3 jobs this wave;
        # cache both (they are groupBy/projection of the full fetch log —
        # the single most re-scanned input).
        P_all = self.parsed_view(
            log if new_log is None else log.unionByName(new_log)
        ).persist()
        persisted.append(P_all)

        # -------- resolution pass (F2 dispatch + D2 movie skip) --------
        # resolution sees THIS wave's fetches too (same-wave expand — no
        # dead resolution-only waves between depths)
        if new_log is not None:
            us_all = self._url_state(
                self.visits(True).unionByName(
                    new_log.select("abs_url", "wave", "attempt", "ok", "cycle")
                )
            ).persist()
            persisted.append(us_all)
            unresolved = (
                occ_dim.where(self._nonleaf(F.col("topology"), F.col("task_type")))
                .join(
                    R.select("dfs_key", "abs_url"), ["dfs_key", "abs_url"], "left_anti"
                )
                .join(us_all.where("has_ok").select("abs_url"), "abs_url", "left_semi")
            )
        else:
            us_all = us
        jo = unresolved.join(P_all.select("abs_url", "children"), "abs_url")
        res_others = jo.where(
            ~((F.col("topology") == 0) & (F.col("task_type") == 1))
        ).select("dfs_key", "abs_url", F.lit("expanded").alias("action"))

        movies = jo.where((F.col("topology") == 0) & (F.col("task_type") == 1))
        expander = (
            occ_dim.where((F.col("topology") == 0) & (F.col("task_type") == 1))
            .groupBy("abs_url")
            .agg(F.min("dfs_key").alias("expander_key"))
        )
        # number_of_songs(start_url, movie_url) over PREVIOUS cycles
        # (db_operations.py:196-211) — zero in cycle 0 (no join at all).
        # Within a cycle the count is stable until the movie expands
        # (its own songs are only saved after its pop; Type0 songs are
        # movie-unique), so the reference's pop-time count check is
        # reproducible relationally.
        if prev_docs is not None:
            n_prev_df = (
                prev_docs.where(F.col("topology") == 0)
                .groupBy(
                    F.col("start_url").alias("site"),
                    F.col("movie_url").alias("url"),
                )
                .agg(F.countDistinct("song_url").alias("n_prev"))
            )
            movies = movies.join(n_prev_df, ["site", "url"], "left").withColumn(
                "n_prev", F.coalesce("n_prev", F.lit(0))
            )
        else:
            movies = movies.withColumn("n_prev", F.lit(0).cast("bigint"))
        mv = (
            movies.join(expander, "abs_url")
            .withColumn("L", F.size("children"))
            .withColumn(
                "n_distinct",
                F.size(F.array_distinct(F.transform("children", lambda c: c["url"]))),
            )
        )
        # first occurrence (expander): the count check runs at pop time,
        # nothing to wait for — skip iff number_of_songs == len(children)
        # (base_crawler.py:158-172). Covers empty movies (0 == 0) and the
        # cycle-2 no-new-songs mass skip (n_prev == L). Dup occurrences
        # with an empty child list decide immediately by the same rule.
        is_exp = F.col("dfs_key") == F.col("expander_key")
        # a dup occurrence whose count ALREADY matches (n_prev == L, e.g.
        # the cycle-2 mass-skip where the expander also skipped and
        # enqueued nothing) decides immediately too — page content is a
        # pure function of URL within a cycle, so its L equals the
        # expander's, and a skipping expander leaves the count unchanged.
        res_immediate = mv.where(
            is_exp | (F.col("L") == 0) | (F.col("n_prev") == F.col("L"))
        ).select(
            "dfs_key", "abs_url",
            F.when(F.col("n_prev") == F.col("L"), F.lit("skipped_no_new"))
            .otherwise(F.lit("expanded"))
            .alias("action"),
        )

        # duplicate-movie occurrences pop AFTER the expander's whole
        # subtree (LIFO): defer until every distinct child is settled —
        # saved in a previous cycle, fetched-ok this cycle (⟹ saved), or
        # dead this cycle — then apply the same count equality:
        # number_of_songs = n_prev + newly-saved children.
        dup_movies = mv.where(
            ~is_exp & (F.col("L") > 0) & (F.col("n_prev") != F.col("L"))
        )
        song_urls = dup_movies.select(
            "dfs_key", "abs_url", "site", "max_err", "L", "n_prev",
            F.explode(
                F.array_distinct(F.transform("children", lambda c: c["url"]))
            ).alias("child_url"),
        ).withColumn("child_abs", F.concat(F.col("site"), F.col("child_url")))
        if prev_docs is not None:
            child_prev = (
                prev_docs.select(
                    F.col("start_url").alias("site"),
                    F.col("song_url").alias("child_url"),
                )
                .distinct()
                .withColumn("prev_doc", F.lit(True))
            )
            song_urls = song_urls.join(
                child_prev, ["site", "child_url"], "left"
            ).withColumn("prev_doc", F.coalesce("prev_doc", F.lit(False)))
        else:
            song_urls = song_urls.withColumn("prev_doc", F.lit(False))
        song_state = (
            song_urls.join(
                us_all.withColumnRenamed("abs_url", "child_abs")
                .withColumnRenamed("has_ok", "s_has_ok")
                .withColumnRenamed("n_fail", "s_n_fail"),
                "child_abs",
                "left",
            )
            .withColumn("s_has_ok", F.coalesce("s_has_ok", F.lit(False)))
            .withColumn("s_n_fail", F.coalesce("s_n_fail", F.lit(0)))
            .withColumn(
                "settled",
                F.col("prev_doc")
                | F.col("s_has_ok")
                | (F.col("s_n_fail") >= F.col("max_err")),
            )
            .withColumn("newly_saved", F.col("s_has_ok") & ~F.col("prev_doc"))
        )
        dup_decided = (
            song_state.groupBy("dfs_key", "abs_url", "L", "n_prev")
            .agg(
                F.min(F.col("settled").cast("int")).alias("all_settled"),
                F.sum(F.col("newly_saved").cast("int")).alias("n_new_saved"),
            )
            .where(F.col("all_settled") == 1)
            .withColumn(
                "action",
                F.when(
                    F.col("n_prev") + F.col("n_new_saved") == F.col("L"),
                    F.lit("skipped_no_new"),
                ).otherwise(F.lit("expanded")),
            )
            .select("dfs_key", "abs_url", "action")
        )

        new_resolved = (
            res_others.unionByName(res_immediate)
            .unionByName(dup_decided)
            .withColumn("wave", F.lit(wave))
            .withColumn("cycle", F.lit(self.cycle))
            .persist()
        )
        persisted.append(new_resolved)
        # the resolved-log write rides a background thread; the kids job
        # below consumes the same cached resolution (whichever job runs a
        # partition first materializes it — block locks dedup the work),
        # so resolve+fan-out is ONE foreground job, not two.
        self._stage_append_bg("resolved", new_resolved, wave, bg)
        f_resolved = bg[-1]
        _t = _tick('resolution-submit', _t)

        # -------- children fan-out (X1–X6 + robots + LIFO rank keys) ----
        exp = (
            new_resolved.where(F.col("action") == "expanded")
            .select("dfs_key", "abs_url")
            .join(Fr, ["dfs_key", "abs_url"])
            .join(dim, "site")
            .join(P_all.select("abs_url", "children"), "abs_url")
        )
        kids_raw = exp.select(
            F.col("dfs_key").alias("parent_key"),
            F.col("url").alias("parent_url"),
            "site", "host", "topology", "depth",
            F.col("movie").alias("p_movie"),
            F.col("artist").alias("p_artist"),
            F.posexplode("children").alias("pos", "child"),
        ).select(
            "parent_key", "parent_url", "site", "host", "topology", "depth", "pos",
            "p_movie", "p_artist",
            F.col("child.url").alias("c_url"),
            F.col("child.label").alias("c_label"),
            F.col("child.child_type").alias("c_type"),
            F.col("child.album").alias("c_album"),
        )
        kids_abs = kids_raw.withColumn(
            "c_abs",
            F.when(
                (F.col("topology") == 1) & (F.col("c_type") == 1),
                F.concat(F.col("site"), F.lit("/"), F.col("c_url")),
            ).otherwise(F.concat(F.col("site"), F.col("c_url"))),
        ).withColumn("c_path", F.regexp_replace("c_abs", r"^https?://[^/]+", ""))
        # robots Disallow: broadcast anti-join on (host, path prefix);
        # statically elided when no site declares rules.
        if self._any_robots:
            rb = F.broadcast(self.robots).withColumnRenamed("host", "r_host")
            kids_ok = kids_abs.join(
                rb,
                (kids_abs["host"] == F.col("r_host"))
                & kids_abs["c_path"].startswith(F.col("prefix")),
                "left_anti",
            )
        else:
            kids_ok = kids_abs
        # LIFO rank AFTER the filter (survivors keep relative pop order)
        wpar = Window.partitionBy("parent_key").orderBy(F.desc("pos"))
        kids = kids_ok.withColumn("rank", F.row_number().over(wpar) - 1).withColumn(
            "c_key", child_key(F.col("parent_key"), F.col("rank"))
        )
        new_frontier_df = kids.select(
            F.col("c_key").alias("dfs_key"),
            F.col("c_url").alias("url"),
            F.col("c_abs").alias("abs_url"),
            "host", "site",
            F.col("c_type").alias("task_type"),
            (F.col("depth") + 1).alias("depth"),
            F.when((F.col("topology") == 0) & (F.col("c_type") == 1), F.col("c_label"))
            .when((F.col("topology") == 0) & (F.col("c_type") == 2), F.col("p_movie"))
            .alias("movie"),
            F.when((F.col("topology") == 0) & (F.col("c_type") == 2), F.col("parent_url"))
            .alias("movie_url"),
            F.when(F.col("topology").isin(1, 2) & (F.col("c_type") == 1), F.col("c_label"))
            .when(F.col("topology").isin(1, 2) & (F.col("c_type") != 1), F.col("p_artist"))
            .alias("artist"),
            F.when((F.col("topology") == 1) & (F.col("c_type") == 2), F.col("c_album"))
            .alias("album"),
            F.when((F.col("topology") == 1) & (F.col("c_type") == 2), F.col("parent_url"))
            .alias("album_url"),
            F.when(
                ((F.col("topology") == 0) & (F.col("c_type") == 2))
                | ((F.col("topology") == 1) & (F.col("c_type") == 2))
                | ((F.col("topology") == 2) & (F.col("c_type") == 3)),
                F.col("c_label"),
            ).alias("song"),
            F.lit(wave).alias("wave_enq"),
            F.lit(self.cycle).alias("cycle"),
        )
        new_kids, n_kids = self._stage_and_read(
            "frontier", new_frontier_df, wave, FRONTIER_SCHEMA, staged
        )
        _t = _tick('kids+stage', _t)

        n_resolved = f_resolved.result()[1]
        if n_fetched == 0 and n_resolved == 0:
            # nothing progressed this wave (n_kids is necessarily 0 —
            # kids explode out of expanded resolutions): either the crawl
            # is done, or the engine is stuck (a bug). Join the side
            # writes (all empty) and decide with one final count.
            for f in bg:
                f.result()
            if unresolved.count() == 0:
                return False
            raise RuntimeError(
                "wave made no progress: nothing pending and nothing resolvable"
            )

        # -------- documents MERGE (O1) — two background deltas --------
        # delta = leaf occurrences saved exactly once: old occurrences
        # whose URL was parsed THIS wave ∪ occurrences enqueued this wave
        # whose URL is parsed (covers late dup-movie expansions). The two
        # parts are disjoint (old vs enqueued-this-wave), so they commit
        # as two merge-on-read deltas; neither is on the critical path.
        leaf_old = Fr.join(dim, "site").where(
            self._leaf(F.col("topology"), F.col("task_type"))
        )
        # the parse wave rides along as `fetched_at` (O2: the virtual
        # clock of the page fetch that produced this document's content).
        if new_log is not None:
            self._merge_documents(
                leaf_old.join(
                    self.parsed_view(new_log)
                    .drop("children", "bytes")
                    .withColumnRenamed("wave", "fetched_at"),
                    "abs_url",
                ),
                wave,
                bg,
            )
        if n_kids > 0:
            self._merge_documents(
                new_kids.join(dim, "site")
                .where(self._leaf(F.col("topology"), F.col("task_type")))
                .join(
                    P_all.drop("children", "bytes").withColumnRenamed(
                        "wave", "fetched_at"
                    ),
                    "abs_url",
                ),
                wave,
                bg,
            )
        _t = _tick('docs-submit', _t)

        for f in bg:
            entry, _n = f.result()
            if entry:
                staged.append(entry)
        _t = _tick('bg-gather', _t)

        self.store.commit_wave(
            wave,
            staged,
            {
                "fetched": n_fetched,
                "resolved": n_resolved,
                "kids": n_kids,
                "wall_s": round(time.time() - t0, 3),
            },
        )
        return True

    # ---------------- documents sink ----------------

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
        docs_delta = (
            delta.withColumn(
                "movie_val",
                F.when(F.col("topology") == 0, F.col("movie"))
                .when(F.col("topology") == 1, F.col("album"))
                .otherwise(F.col("d_album")),
            )
            .withColumn(
                "movie_url_val",
                F.when(F.col("topology") == 0, F.col("movie_url"))
                .when(F.col("topology") == 1, F.col("album_url"))
                .otherwise(F.col("url")),  # Type2 quirk (base_crawler.py:732)
            )
            .withColumn(
                "singers_val",
                F.when(F.col("topology") == 0, F.col("d_singers"))
                .when(F.col("topology") == 1, F.array(F.col("artist")))
                .otherwise(
                    F.concat(
                        F.coalesce(F.col("d_other"), F.array().cast("array<string>")),
                        F.array(F.col("artist")),
                    )
                ),
            )
            .withColumn(
                "directors_val",
                F.when(F.col("topology") == 0, F.col("d_directors")).otherwise(
                    F.array(F.col("artist"))
                ),
            )
            .withColumn(
                "lyricists_val",
                F.when(F.col("topology") == 1, F.array(F.col("artist"))).otherwise(
                    F.col("d_lyricists")
                ),
            )
        )
        # P17 unescape — once, at the sink, like db_operations.py:37-42
        docs_delta = (
            docs_delta.withColumn("song_u", unescape_str(F.col("song")))
            .withColumn("movie_u", unescape_str(F.col("movie_val")))
            .withColumn("lyrics_u", unescape_str(F.col("d_lyrics")))
            .withColumn("singers_u", unescape_arr(F.col("singers_val")))
            .withColumn("directors_u", unescape_arr(F.col("directors_val")))
            .withColumn("lyricists_u", unescape_arr(F.col("lyricists_val")))
        )
        docs_delta = docs_delta.select(
            F.col("site").alias("start_url"),
            F.col("url").alias("song_url"),
            F.col("abs_url").alias("doc_id"),
            "host",
            "topology",
            F.col("song_u").alias("song"),
            F.col("movie_u").alias("movie"),
            F.col("movie_url_val").alias("movie_url"),
            "artist",
            "dfs_key",
            F.lit(wave).alias("wave"),
            F.lit(self.cycle).alias("cycle"),
            F.col("fetched_at").cast("int").alias("fetched_at"),
            spans_expr(
                F.col("movie_u"), F.col("singers_u"), F.col("directors_u"),
                F.col("lyricists_u"), F.col("lyrics_u"),
            ).alias("spans"),
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
        occ = self.frontier().join(dim, "site")
        # URL state is per-cycle (fresh retry ladders each re-crawl pass);
        # each occurrence joins its own cycle's ladder.
        us = self._url_state(self.visits(), by_cycle=True)
        occ = (
            occ.join(us, ["cycle", "abs_url"], "left")
            .withColumn("has_ok", F.coalesce("has_ok", F.lit(False)))
            .withColumn("n_fail", F.coalesce("n_fail", F.lit(0)))
        )
        is_leaf = self._leaf(F.col("topology"), F.col("task_type"))
        wleaf = Window.partitionBy("abs_url")
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
                    "cycle", "dfs_key", "abs_url", F.col("action").alias("res_action")
                ),
                ["cycle", "dfs_key", "abs_url"],
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
        wseq = Window.partitionBy("site").orderBy("cycle", "dfs_key", "n_errors")
        return allrows.withColumn("seq", F.row_number().over(wseq))
