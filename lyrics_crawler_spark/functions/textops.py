"""Vectorized text functions that have no Catalyst builtin.

P17 — full HTML entity unescape (reference: db_operations.py:1, :37-42,
applied once at save time). Arrow-batched pandas UDFs; never row-at-a-time
Spark UDFs.

``unescape_col``/``unescape_arr_col`` wrap the UDFs in a JVM fast path
with an exactness proof: ``html.unescape`` scans left-to-right for
'&'-charrefs, so (a) a string without '&' is returned verbatim, and
(b) if EVERY '&' starts a literal ``&amp;`` — checked by deleting all
left-to-right non-overlapping ``&amp;`` occurrences and testing for a
surviving '&' — then the matcher finds exactly those disjoint
occurrences and maps each to '&', identical to a literal replace.
Only strings failing (b) — any other entity shape, bare '&', '&amp'
sans semicolon, '&AMP;' — cross the Arrow boundary (null-masked
otherwise), so the python stage's payload is ~empty on entity-clean
corpora. Before this, the unescape stage was the top GC source after
the decimal-key fix: 458 s JVM GC at crawl scale 40 (BENCH.md round 3).
"""

from __future__ import annotations

from html import unescape

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType


@pandas_udf(StringType())
def unescape_str(s: pd.Series) -> pd.Series:
    return s.map(lambda x: unescape(x) if x is not None else None)


@pandas_udf(ArrayType(StringType()))
def unescape_arr(s: pd.Series) -> pd.Series:
    return s.map(
        lambda xs: [unescape(x) if x is not None else None for x in xs]
        if xs is not None
        else None
    )


def _dirty(x: Column) -> Column:
    """True iff some '&' in ``x`` is NOT the start of a literal '&amp;'
    (the cases where html.unescape may differ from a literal replace)."""
    return x.contains("&") & F.replace(x, F.lit("&amp;"), F.lit("")).contains("&")


def _fast(x: Column) -> Column:
    return F.when(
        x.contains("&"), F.replace(x, F.lit("&amp;"), F.lit("&"))
    ).otherwise(x)


def unescape_col(c: Column) -> Column:
    """html.unescape with the JVM fast path (see module docstring)."""
    return F.coalesce(unescape_str(F.when(_dirty(c), c)), _fast(c))


def unescape_arr_col(c: Column) -> Column:
    """Element-wise html.unescape over array<string>, JVM fast path."""
    return F.coalesce(
        unescape_arr(F.when(F.exists(c, _dirty), c)), F.transform(c, _fast)
    )
