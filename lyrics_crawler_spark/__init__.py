"""lyrics_crawler_spark — a PySpark-native crawl-frontier + fetch-scheduler engine.

A from-scratch rebuild of the *semantics* of iiitv/lyrics-crawler
(reference at /root/reference, read-only) on idiomatic Spark:

- the LIFO task queue (`crawler/base_crawler.py:42`) becomes a partitioned
  ``frontier`` table ordered by a lexicographic DFS priority key;
- the worker-thread loop (`crawler/base_crawler.py:45-110`) becomes a
  driver-side wave loop over Catalyst DataFrame plans;
- the Postgres upsert sink (`crawler/db_operations.py:35-104`) becomes a
  MERGE into a snapshot-versioned ``documents`` table of interleaved
  text+media span arrays;
- the per-URL dedup probe (`crawler/db_operations.py:214-229`) becomes a
  ``left_anti`` join against a ``seen`` table.

Nothing here is a translation of the reference's code — only of its
observable behavior (crawl order, URL-seen set, saved document content).
"""

__version__ = "0.1.0"
