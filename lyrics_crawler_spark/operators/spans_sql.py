"""Catalyst-native interleaved span assembly (twin of functions/spans.py).

Builds the ``spans`` array column entirely JVM-side from already-unescaped
document fields: metadata spans (album/singer/director/lyricist) followed
by lyric text split around ``<media src="…"/>`` markers, media refs
interleaved at their document positions, offsets 0..n-1.

No Python runs here — `split`, `regexp_extract_all`, `transform`,
`flatten`, and an indexed `transform` for offsets keep the whole
expression inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from lyrics_crawler_spark.functions.spans import MEDIA_PATTERN_SQL

SPAN_SCHEMA_SQL = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def _span(kind, text, media_ref) -> Column:
    return F.struct(
        kind.alias("kind"), text.alias("text"), media_ref.alias("media_ref")
    )


def _meta_spans(kind: str, arr: Column) -> Column:
    return F.transform(
        F.coalesce(arr, F.array().cast("array<string>")),
        lambda x: _span(F.lit(kind), x, F.lit(None).cast("string")),
    )


def spans_expr(album: Column, singers: Column, directors: Column,
               lyricists: Column, lyrics: Column) -> Column:
    """All inputs already unescaped (P17 runs once, at the sink)."""
    nul = F.lit(None).cast("string")
    meta = F.concat(
        F.array(_span(F.lit("album"), F.coalesce(album, F.lit("")), nul)),
        _meta_spans("singer", singers),
        _meta_spans("director", directors),
        _meta_spans("lyricist", lyricists),
    )
    lyr = F.coalesce(lyrics, F.lit(""))
    parts = F.split(lyr, MEDIA_PATTERN_SQL, -1)  # java split drops the group
    refs = F.regexp_extract_all(lyr, F.lit(MEDIA_PATTERN_SQL), 1)
    interleaved = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(parts) - 1),
            lambda i: F.when(
                i < F.size(refs),
                F.array(
                    _span(F.lit("lyric"), F.try_element_at(parts, i + 1), nul),
                    _span(F.lit("media"), nul, F.try_element_at(refs, i + 1)),
                ),
            ).otherwise(
                F.array(_span(F.lit("lyric"), F.try_element_at(parts, i + 1), nul))
            ),
        )
    )
    combined = F.concat(meta, interleaved)
    return F.transform(
        combined,
        lambda x, i: F.struct(
            x["kind"].alias("kind"),
            x["text"].alias("text"),
            x["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
