"""Vectorized text functions that have no Catalyst builtin.

P17 — full HTML entity unescape (reference: db_operations.py:1, :37-42,
applied once at save time). Arrow-batched pandas UDFs; never row-at-a-time
Spark UDFs.
"""

from __future__ import annotations

from html import unescape

import pandas as pd
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
