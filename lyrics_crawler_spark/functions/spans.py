"""Interleaved text+media span assembly — the ``documents`` sink contract.

The reference flattens everything into Postgres TEXT columns, stringifying
Python lists (db_operations.py:40-42, :74-77) and html-unescaping at save
(db_operations.py:1, :37-42). Per SURVEY.md §1.2 and BASELINE.json's
input_hint, the rebuild stores one ordered span array per document:

    spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>

kind ∈ {album, singer, director, lyricist, lyric, media}. Media spans come
from ``<media src="…"/>`` markers that survive every reference
replace-chain inside the lyrics body; lyric text is split around them so
text and media interleave in document order. The per-row golden invariant
is span-sequence equality on (kind, text, media_ref, order).

This module is the *single* definition of that assembly, used by the
oracle (driver-side) and mirrored by the engine's Catalyst expression in
``operators/spans_sql.py`` — the golden test proves the two agree.
"""

from __future__ import annotations

import re
from html import unescape

MEDIA_RE = re.compile(r'<media src="([^"]*)"/>')
# Spark/Java-regex twin used by the engine (operators/spans_sql.py).
MEDIA_PATTERN_SQL = '<media src="([^"]*)"/>'


def build_spans(
    album: str | None,
    singers: list[str],
    directors: list[str],
    lyricists: list[str],
    lyrics: str,
) -> list[dict]:
    spans: list[dict] = []

    def add(kind: str, text: str | None = None, media_ref: str | None = None):
        spans.append(
            {
                "kind": kind,
                "text": text,
                "media_ref": media_ref,
                "offset": len(spans),
            }
        )

    add("album", unescape(album if album is not None else ""))
    for s in singers:
        add("singer", unescape(s))
    for d in directors:
        add("director", unescape(d))
    for ly in lyricists:
        add("lyricist", unescape(ly))
    # re.split with a capturing group interleaves [text0, ref0, text1, …].
    parts = MEDIA_RE.split(lyrics)
    for i, p in enumerate(parts):
        if i % 2 == 0:
            add("lyric", unescape(p))
        else:
            add("media", media_ref=p)
    return spans
