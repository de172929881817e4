"""Deterministic hashing used across the generator, oracle and engine.

Two families:

- :func:`stable_hash` — driver/oracle-side 64-bit hash (blake2b). Used by
  the synthetic site generator so that page content, link targets and
  injected fetch errors are pure functions of ``(seed, url)``.
- ``PORTABLE_HASH64`` SQL — a 60-bit integer hash expressible identically
  in Spark SQL and DuckDB (md5 hex prefix → int), used wherever an
  ``oracle_sql()`` parity check needs the *same* hash on both engines
  (Spark's ``xxhash64`` has no DuckDB twin).
"""

from __future__ import annotations

import hashlib


def stable_hash(*parts: object, bits: int = 64) -> int:
    """64-bit (default) stable hash of the repr of ``parts``."""
    h = hashlib.blake2b(
        "\x1f".join(str(p) for p in parts).encode("utf-8"), digest_size=8
    )
    v = int.from_bytes(h.digest(), "big")
    return v >> (64 - bits) if bits < 64 else v


def stable_unit(*parts: object) -> float:
    """Uniform-ish float in [0, 1) derived from :func:`stable_hash`."""
    return stable_hash(*parts) / float(1 << 64)


# 60-bit hash of a string column, identical in Spark SQL and DuckDB.
# Spark: conv() hex→dec; DuckDB: '0x…' cast. Both take the first 15 hex
# chars of md5 → < 2^60, safe for BIGINT arithmetic under ANSI mode.
def spark_hash64(col_sql: str) -> str:
    return f"CAST(CONV(SUBSTR(MD5({col_sql}), 1, 15), 16, 10) AS BIGINT)"


def duckdb_hash64(col_sql: str) -> str:
    return f"CAST(CONCAT('0x', SUBSTRING(MD5({col_sql}), 1, 15)) AS BIGINT)"


def py_hash64(s: str) -> int:
    """Python twin of spark_hash64/duckdb_hash64 (for unit tests)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
