"""Scoped persistence: per-query caches that a sequential sweep
(driver correctness pass, parity harness, bench) releases automatically.

Several operators persist an intermediate read multiple times within
one query (MinHash's hashed-shingle sets, connected-components label
generations). Spark never auto-unpersists these from Python, so a
134-key sweep would accumulate one cached plan per caching query —
slow eviction churn at best, executor-memory pressure at 100 TB.

``scoped_persist(df)`` persists and registers the DataFrame;
``release_scoped_caches()`` unpersists everything registered. The
registry wraps every query so each *build* first releases the caches
of the previously built query — a sweep therefore holds at most one
query's caches at any time. Releasing is always safe: an unpersisted
DataFrame silently recomputes from lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for release at the next query
    build (or an explicit ``release_scoped_caches()``)."""
    _SCOPED.append(df.persist())
    return df


def release_scoped_caches() -> None:
    """Unpersist every registered DataFrame (idempotent, never raises
    on an already-released or dead SparkContext cache)."""
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — context may already be gone
            pass
