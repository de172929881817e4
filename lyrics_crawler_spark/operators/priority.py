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

Decimal twin (the hot-aggregate key). Spark's HashAggregateExec only
accepts *fixed-width mutable* aggregation buffers: ``min(string)`` (and
``first``/``min_by``/``min(struct)``) silently degrade to
SortAggregateExec, which at 32 task threads turned one per-wave key
aggregate into a 300s-GC stage (BENCH.md round 3). ``decimal(38,0)`` IS
mutable (UnsafeRow reserves a fixed 16-byte slot), so every per-wave
``min(key)`` runs as a map-side-combinable HashAggregate when keys are
decimals. Encoding: one base-2^31 digit per tree level,

    digit(L) = 1 + rank(L)  if the key has level L else 0
    key_dec  = Σ digit(L) · (2^31)^(4-L),  L = 1..4

Absent levels encode 0 < any present digit, so a parent (shorter key)
sorts before all its children; sibling digits compare numerically —
exactly the hex string's lexicographic preorder (injective, order-
isomorphic). Bounds: ≤ 2^31-2 siblings per node (vs 2^32 for the hex
string — still ~10^9-fan-out headroom at the 10^10-URL design point)
and ≤ 4 levels (parents at depth ≤ 2; every topology's depth-3 nodes
are leaves). Max value (2^31)^4 ≈ 2.1e37 < 10^38 fits decimal(38,0).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column
from pyspark.sql import functions as F

KEY_WIDTH = 8

DEC_BASE = 1 << 31  # per-level digit base of the decimal key twin
KEY_DEC_TYPE = "decimal(38,0)"


def hex8(col: Column) -> Column:
    return F.lpad(F.lower(F.hex(col)), KEY_WIDTH, "0")


def seed_key(i: int, n: int) -> str:
    return format(n - 1 - i, f"0{KEY_WIDTH}x")


def child_key(parent_key: Column, rank: Column) -> Column:
    return F.concat(parent_key, hex8(rank))


def seed_key_dec(i: int, n: int) -> Decimal:
    # seed = level 1: digit (1 + rank) at weight DEC_BASE^3
    return Decimal((n - i) * DEC_BASE**3)


def child_key_dec(parent_dec: Column, rank: Column, parent_depth: Column) -> Column:
    """Decimal twin of :func:`child_key`: append digit (1+rank) at the
    child's level. ``parent_depth`` ≤ 2 everywhere (depth-3 nodes are
    leaves in all topologies); the golden trace-equality suite covers
    every topology, so a new deeper dialect that violated this would
    diverge loudly, not silently."""
    w = (
        F.when(parent_depth == 0, F.lit(Decimal(DEC_BASE**2)))
        .when(parent_depth == 1, F.lit(Decimal(DEC_BASE)))
        .otherwise(F.lit(Decimal(1)))
    )
    return (parent_dec + (rank.cast("decimal(10,0)") + 1) * w).cast(KEY_DEC_TYPE)


def hex_key_dec(key: Column) -> Column:
    """Decimal twin derived from the hex path key at READ time — for
    consumers whose storage carries only the string key (the documents
    log). Pure Catalyst (substring/conv/arithmetic), order-isomorphic
    and injective by the same 1+rank digit encoding as
    :func:`child_key_dec` (absent level → digit 0 < any 1+rank), so
    ``min/max(hex_key_dec(k))`` equals the lexicographic string winner
    while keeping the aggregation buffer fixed-width (HashAggregate).
    Deriving at read beats widening DOCS_SCHEMA: zero extra bytes in
    every log row for a projection that is ~free next to the aggregate
    it feeds."""

    def digit(level: int) -> Column:  # 1-based tree level
        sub = F.substring(key, (level - 1) * KEY_WIDTH + 1, KEY_WIDTH)
        return (
            F.when(
                F.length(key) >= level * KEY_WIDTH,
                F.conv(sub, 16, 10).cast("long") + 1,
            )
            .otherwise(F.lit(0))
            .cast("long")
        )

    # two long half-words (each < 2^62) recombined in decimal — a single
    # Σ digit·BASE^(4-L) in long arithmetic would overflow at level 1.
    hi = digit(1) * F.lit(DEC_BASE) + digit(2)
    lo = digit(3) * F.lit(DEC_BASE) + digit(4)
    return (
        hi.cast("decimal(19,0)") * F.lit(Decimal(DEC_BASE) ** 2)
        + lo.cast("decimal(19,0)")
    ).cast(KEY_DEC_TYPE)
