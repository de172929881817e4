"""The fetch+parse wave stage (operators S6/S7 + P1–P16 + F2 dispatch).

One Arrow-batched ``mapInPandas`` pass per wave: the input is the
politeness-selected set of distinct pending URLs; the output is one row
per URL with fetch outcome, normalized child links *in reference push
order*, and leaf details. This is one of exactly two Python stages in the
engine (the other is HTML unescape at the sink); everything else is
Catalyst.

The reference's equivalents:
- fetch: ``open_request`` (network_manager.py:33-41) — here simulated by
  the deterministic site graph (tests/bench); a real deployment swaps in
  an HTTP client inside the same batch iterator.
- UA rotation (network_manager.py:29-30, random): replaced by a
  deterministic pick ``ua = UA_POOL[hash(url) % len]`` — no RNG on
  executors (SURVEY.md S7).
- dispatch `if task['type']==…` (base_crawler.py:74-92, :357-376,
  :585-608): the per-row topology/task_type switch below.
- child push order: movies/songs/artists in parse order; Type1 nested
  album→song loops (base_crawler.py:428-440); Type2 songs *then*
  pages[1:] (base_crawler.py:663-683).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lyrics_crawler_spark.functions.hashing import stable_hash
from lyrics_crawler_spark.parsers.adapters import parse_page
from lyrics_crawler_spark.sitegen.graph import SiteGraph

# Deterministic, rotation-only UA pool (replaces the reference's random
# choice from its hardcoded list, network_manager.py:6-31).
UA_POOL = [f"lcs-fetcher/{i}.0 (+https://example.invalid/bot)" for i in range(12)]

CHILD_TYPE = StructType(
    [
        StructField("url", StringType()),
        StructField("label", StringType()),
        StructField("child_type", IntegerType()),
        StructField("album", StringType()),
    ]
)

FETCH_SCHEMA = StructType(
    [
        # (site_id, url) is the engine's universal row key: the absolute
        # URL, host and delay never cross the Arrow boundary (bytes/row
        # on the widest-wave foreground is the 4N scaling lever —
        # BENCH.md). The UA pick is S7's deterministic rotation, stored
        # as the 4-byte pool index; `engine.user_agents` rebuilds the
        # string view.
        StructField("site_id", IntegerType()),
        StructField("url", StringType()),
        StructField("attempt", IntegerType()),
        StructField("ok", BooleanType()),
        StructField("bytes", LongType()),
        StructField("partition_id", IntegerType()),
        StructField("ua_id", IntegerType()),
        StructField("children", ArrayType(CHILD_TYPE)),
        StructField("d_album", StringType()),
        StructField("d_lyrics", StringType()),
        StructField("d_singers", ArrayType(StringType())),
        StructField("d_directors", ArrayType(StringType())),
        StructField("d_lyricists", ArrayType(StringType())),
        StructField("d_other", ArrayType(StringType())),
    ]
)


def normalize_children(topology: int, task_type: int, parsed: dict) -> list[dict]:
    """Flatten a parse result into (url, label, child_type, album) rows in
    the exact order the reference pushes them onto its LifoQueue."""
    out: list[dict] = []

    def add(url, label, child_type, album=None):
        out.append(
            {"url": url, "label": label, "child_type": child_type, "album": album}
        )

    if topology == 0:
        if task_type == 0:
            for url, movie in parsed.get("links", []):
                add(url, movie, 1)
        elif task_type == 1:
            for url, song in parsed.get("links", []):
                add(url, song, 2)
    elif topology == 1:
        if task_type == 0:
            for url, artist in parsed.get("links", []):
                add(url, artist, 1)
        elif task_type == 1:
            for album, songs in parsed.get("albums", []):
                for url, song in songs:
                    add(url, song, 2, album)
    elif topology == 2:
        if task_type == 0:
            for url, artist in parsed.get("links", []):
                add(url, artist, 1)
        elif task_type == 1:
            for url, song in parsed.get("links", []):
                add(url, song, 3)
            for page in parsed.get("pages", [])[1:]:
                add(page, None, 2)
        elif task_type == 2:
            for url, song in parsed.get("links", []):
                add(url, song, 3)
    return out


def make_fetch_parse(specs_by_id: dict):
    """Build the mapInPandas function. ``specs_by_id`` maps site_id →
    SiteSpec and rides to executors inside the closure (small broadcast).
    The absolute URL exists only INSIDE this stage (reconstructed via
    compose_url — P18 quirk included — for the simulated HTTP client and
    the UA hash); only (site_id, url) + outcomes cross back."""

    def fetch_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        from lyrics_crawler_spark.functions.urls import compose_url

        graphs: dict[int, SiteGraph] = {}
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                spec = specs_by_id[r.site_id]
                graph = graphs.setdefault(r.site_id, SiteGraph(spec))
                abs_url = compose_url(
                    spec.start_url, r.url, spec.topology, int(r.task_type)
                )
                base = {
                    "site_id": int(r.site_id),
                    "url": r.url,
                    "attempt": int(r.attempt),
                    "partition_id": pid,
                    "ua_id": stable_hash("ua", abs_url) % len(UA_POOL),
                    "children": None,
                    "d_album": None,
                    "d_lyrics": None,
                    "d_singers": None,
                    "d_directors": None,
                    "d_lyricists": None,
                    "d_other": None,
                }
                try:
                    # the reference catches *any* exception and requeues
                    # (base_crawler.py:102-110) — so do we.
                    html = graph.fetch(abs_url, int(r.attempt))
                    parsed = parse_page(
                        spec.dialect, spec.topology, int(r.task_type), html
                    )
                    d = parsed.get("details") or {}
                    rows.append(
                        {
                            **base,
                            "ok": True,
                            "bytes": len(html),
                            "children": normalize_children(
                                spec.topology, int(r.task_type), parsed
                            ),
                            "d_album": d.get("album"),
                            "d_lyrics": d.get("lyrics"),
                            "d_singers": d.get("singers"),
                            "d_directors": d.get("directors"),
                            "d_lyricists": d.get("lyricists"),
                            "d_other": d.get("other_artists"),
                        }
                    )
                except Exception:
                    rows.append({**base, "ok": False, "bytes": 0})
            yield pd.DataFrame(rows, columns=[f.name for f in FETCH_SCHEMA.fields])

    return fetch_parse
