"""Single-threaded re-execution of the reference crawl algorithm.

This is the golden-trace generator (SURVEY.md §7 step 2): a faithful
in-memory replay of iiitv/lyrics-crawler's control flow — LifoQueue task
dicts, per-pop error-budget check, retry-with-requeue, the movie
count-equality skip, the `exists_song` dedup probe, and CrawlerType2's
missing-`return` dedup bug — against the deterministic synthetic site
graph. Its outputs (visit trace, URL-seen set, saved documents with span
arrays) are what the Spark engine must reproduce exactly.

Semantics locked here (single-threaded = the well-defined order):
- crawl order = LIFO pop order with 1 thread (base_crawler.py:45-110);
- a failed task re-enters at the top of the stack (base_crawler.py:110)
  → retries are consecutive pops;
- error budget is checked at pop (base_crawler.py:55-62) → a task whose
  fetch always fails produces max_err 'error' pops + one 'dead' pop;
- azlyrics' random shuffles are dropped (document order; SURVEY.md R4);
- robots Disallow rules filter URLs at enqueue time (north-rule addition,
  applied identically on both sides);
- CrawlerType2.get_song lacks a `return` after the exists_song probe
  (base_crawler.py:714-722, D4): duplicates are re-fetched and re-saved,
  so the *last* occurrence's task context wins in the store — unlike
  Type0/Type1 where the *first* occurrence wins via the skip.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from queue import LifoQueue

from lyrics_crawler_spark.functions.spans import build_spans
from lyrics_crawler_spark.functions.urls import (
    canonicalize,
    compose_url,
    robots_allowed,
    url_path,
)
from lyrics_crawler_spark.parsers.adapters import ADAPTERS
from lyrics_crawler_spark.sitegen.graph import FetchError, SiteGraph, SiteSpec


@dataclass
class OracleResult:
    trace: list[dict] = field(default_factory=list)
    docs: dict = field(default_factory=dict)  # (start_url, song_url) -> doc

    @property
    def seen(self) -> set:
        return set(self.docs.keys())

    def trace_tuples(self) -> list[tuple]:
        return [
            (t["url"], t["task_type"], t["action"], t["n_errors"])
            for t in self.trace
        ]


class ReferenceOracle:
    def __init__(self, spec: SiteSpec):
        self.spec = spec
        self.graph = SiteGraph(spec)
        self.adapters = ADAPTERS[spec.dialect]
        self.queue: LifoQueue = LifoQueue()
        self.result = OracleResult()
        self.cycle = 0
        self.last_crawled_touches = 0
        # (movie_url, cycle) per update_last_crawl call (O2 touch set)
        self.touches: list[tuple[str, int]] = []

    # ---------------- db_operations emulation ----------------

    def _exists_song(self, url: str) -> bool:
        # db_operations.py:214-229
        return (self.spec.start_url, url) in self.result.docs

    def _number_of_songs(self, movie_url: str) -> int:
        # db_operations.py:196-211
        return sum(
            1
            for d in self.result.docs.values()
            if d["movie_url"] == movie_url
        )

    def _save(self, song, song_url, movie, movie_url, singers, directors,
              lyricists, lyrics, artist=None):
        # db_operations.py:35-104 upsert keyed (song_url, start_url);
        # list fields stay arrays (SURVEY.md §1.2), unescape inside
        # build_spans (P17).
        from html import unescape

        prior = self.result.docs.get((self.spec.start_url, song_url))
        self.result.docs[(self.spec.start_url, song_url)] = {
            "song": unescape(song),
            "song_url": song_url,
            "movie": unescape(movie if movie is not None else ""),
            "movie_url": movie_url,
            "start_url": self.spec.start_url,
            "artist": artist,
            "spans": build_spans(movie, singers, directors, lyricists, lyrics),
            # O2: save() stamps last_updated=last_crawled=now on insert
            # AND update (db_operations.py:58-63,:80-83); the virtual
            # clock is the cycle number. first_cycle = the Type0/1 win
            # rule's cycle (first save); updated_cycle = the Type2 one.
            "first_cycle": prior["first_cycle"] if prior else self.cycle,
            "updated_cycle": self.cycle,
        }

    # ---------------- plumbing ----------------

    def _emit(self, task, action):
        self.result.trace.append(
            {
                "url": task["url"],
                "task_type": task["type"],
                "action": action,
                "n_errors": task["n_errors"],
            }
        )

    def _put(self, task):
        abs_url = compose_url(
            self.spec.start_url, task["url"], self.spec.topology, task["type"]
        )
        if robots_allowed(
            url_path(canonicalize(abs_url)), self.spec.robots_disallow
        ):
            self.queue.put(task)

    def _fetch(self, url, task_type, n_errors) -> str:
        abs_url = compose_url(self.spec.start_url, url, self.spec.topology, task_type)
        return self.graph.fetch(abs_url, n_errors)

    # ---------------- run (single cycle) ----------------

    def run(self) -> OracleResult:
        for url in self.graph.seeds():
            self._put({"type": 0, "url": url, "n_errors": 0})
        handler = {
            0: self._handle_type0,
            1: self._handle_type1,
            2: self._handle_type2,
        }[self.spec.topology]
        while not self.queue.empty():
            task = self.queue.get()
            if task["n_errors"] >= self.spec.max_err:
                self._emit(task, "dead")
                continue
            try:
                handler(task)
            except FetchError:
                self._emit(task, "error")
                task["n_errors"] += 1
                self.queue.put(task)  # back on top → retried next pop
        return self.result

    def run_cycle(self, spec: SiteSpec | None = None) -> OracleResult:
        """F4: the next iteration of the reference's ``while True``
        re-seed loop (base_crawler.py:112-147) — optionally against a
        mutated site (graph replaced, DB state kept). The trace keeps
        appending; docs/seen persist across cycles."""
        self.cycle += 1
        if spec is not None:
            assert spec.start_url == self.spec.start_url
            self.spec = spec
            self.graph = SiteGraph(spec)
            self.adapters = ADAPTERS[spec.dialect]
        return self.run()

    # ---------------- CrawlerType0 (base_crawler.py:29-277) ----------------

    def _handle_type0(self, task):
        t = task["type"]
        if t == 0:  # get_movies (:224-243)
            html = self._fetch(task["url"], t, task["n_errors"])
            for url, movie in self.adapters["movies"](html):
                self._put({"type": 1, "url": url, "movie": movie, "n_errors": 0})
            self._emit(task, "fetched")
        elif t == 1:  # download_movie (:149-184)
            html = self._fetch(task["url"], t, task["n_errors"])
            songs = self.adapters["songs"](html)
            if self._number_of_songs(task["url"]) == len(songs):
                self.last_crawled_touches += 1  # update_last_crawl (O2)
                self.touches.append((task["url"], self.cycle))
                self._emit(task, "skipped_no_new")
                return
            for song_url, song in songs:
                self._put(
                    {
                        "type": 2,
                        "url": song_url,
                        "song": song,
                        "movie": task["movie"],
                        "movie_url": task["url"],
                        "n_errors": 0,
                    }
                )
            self._emit(task, "fetched")
        else:  # download_song (:186-222)
            if self._exists_song(task["url"]):
                self._emit(task, "skipped_seen")
                return
            html = self._fetch(task["url"], t, task["n_errors"])
            lyrics, singers, music_by, lyricists = self.adapters["details"](html)
            self._save(
                song=task["song"],
                song_url=task["url"],
                movie=task["movie"],
                movie_url=task["movie_url"],
                singers=singers,
                directors=music_by,
                lyricists=lyricists,
                lyrics=lyrics,
            )
            self._emit(task, "fetched")

    # ---------------- CrawlerType1 (base_crawler.py:280-513) ----------------

    def _handle_type1(self, task):
        t = task["type"]
        if t == 0:  # get_artists (:395-414)
            html = self._fetch(task["url"], t, task["n_errors"])
            for artist_url, artist in self.adapters["artists"](html):
                self._put(
                    {"type": 1, "url": artist_url, "artist": artist, "n_errors": 0}
                )
            self._emit(task, "fetched")
        elif t == 1:  # get_artist_albums (:416-440) — note the '/' join
            html = self._fetch(task["url"], t, task["n_errors"])
            for album, song_with_url in self.adapters["albums"](html):
                for song_url, song in song_with_url:
                    self._put(
                        {
                            "type": 2,
                            "song": song,
                            "url": song_url,
                            "album": album,
                            "album_url": task["url"],
                            "artist": task["artist"],
                            "n_errors": 0,
                        }
                    )
            self._emit(task, "fetched")
        else:  # get_song (:442-474)
            if self._exists_song(task["url"]):
                self._emit(task, "skipped_seen")
                return
            html = self._fetch(task["url"], t, task["n_errors"])
            lyrics = self.adapters["details"](html)
            self._save(
                song=task["song"],
                song_url=task["url"],
                movie=task["album"],
                movie_url=task["album_url"],
                singers=[task["artist"]],
                directors=[task["artist"]],
                lyricists=[task["artist"]],
                lyrics=lyrics,
                artist=task["artist"],
            )
            self._emit(task, "fetched")

    # ---------------- CrawlerType2 (base_crawler.py:516-789) ----------------

    def _handle_type2(self, task):
        t = task["type"]
        if t == 0:  # get_artists (:626-646)
            html = self._fetch(task["url"], t, task["n_errors"])
            for artist_url, artist in self.adapters["artists"](html):
                self._put(
                    {"type": 1, "url": artist_url, "artist": artist, "n_errors": 0}
                )
            self._emit(task, "fetched")
        elif t == 1:  # get_artist (:648-683): songs first, then pages[1:]
            html = self._fetch(task["url"], t, task["n_errors"])
            pages = self.adapters["pages"](html)
            for song_url, song in self.adapters["songs"](html):
                self._put(
                    {
                        "type": 3,
                        "url": song_url,
                        "song": song,
                        "artist": task["artist"],
                        "n_errors": 0,
                    }
                )
            for page in pages[1:]:
                self._put(
                    {
                        "type": 2,
                        "url": page,
                        "artist": task["artist"],
                        "n_errors": 0,
                    }
                )
            self._emit(task, "fetched")
        elif t == 2:  # get_songs_from_page (:685-704)
            html = self._fetch(task["url"], t, task["n_errors"])
            for song_url, song in self.adapters["songs"](html):
                self._put(
                    {
                        "type": 3,
                        "url": song_url,
                        "song": song,
                        "artist": task["artist"],
                        "n_errors": 0,
                    }
                )
            self._emit(task, "fetched")
        else:  # get_song (:706-738) — D4: probe has no return; always fetch+save
            self._exists_song(task["url"])  # warning only in the reference
            html = self._fetch(task["url"], t, task["n_errors"])
            album, lyrics, lyricists, other_artists = self.adapters["details"](html)
            self._save(
                song=task["song"],
                song_url=task["url"],
                movie=album,
                movie_url=task["url"],  # quirk: album_url position gets url (:732)
                singers=other_artists + [task["artist"]],
                directors=[task["artist"]],
                lyricists=lyricists,
                lyrics=lyrics,
                artist=task["artist"],
            )
            self._emit(task, "fetched")
