"""DFS priority-key encoding (operator R1/F1 — the LIFO queue's Spark twin).

The reference's LifoQueue with one thread visits tasks in DFS preorder
where siblings pop in *reverse push order* (base_crawler.py:42, :53,
:110). That order is exactly the lexicographic order of path keys built
from fixed-width sibling ranks:

    seed i of n          → key = hex8(n-1-i)
    child j of n under K → key = K || hex8(n-1-j)

A parent's key is a proper prefix of its children's keys, and prefix <
extension in string order = preorder; equal-length sibling ranks compare
numerically. A retried task keeps its key (the reference re-pushes the
same dict → it pops next, base_crawler.py:110), so retries order by the
secondary ``n_errors`` column.

8 hex chars support 2^32 siblings; depth ≤ 4 in every topology, so keys
stay ≤ 32 chars at 10^10-URL scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KEY_WIDTH = 8


def hex8(col: Column) -> Column:
    return F.lpad(F.lower(F.hex(col)), KEY_WIDTH, "0")


def seed_key(i: int, n: int) -> str:
    return format(n - 1 - i, f"0{KEY_WIDTH}x")


def child_key(parent_key: Column, rank: Column) -> Column:
    return F.concat(parent_key, hex8(rank))
