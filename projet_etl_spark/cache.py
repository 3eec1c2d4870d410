"""Lifecycle tracking for eagerly-persisted intermediates.

Several operators stage an intermediate with ``persist()`` +
``count()`` (the right design at 100 TB — one materialization feeding
several subtrees instead of recomputing the pipeline per subtree, and
eager because concurrent broadcast-subquery jobs race on a cold cache
and rematerialize it repeatedly). But a long-lived session — a query
service dispatching registry queries for hours — would accumulate
executor storage if those persists were never released. Every persist
the engine takes goes through this module so callers can drop them
all with one ``release_caches()`` between requests (or rely on LRU
block eviction and call it never; tracked caches are advisory, not
load-bearing: unpersisting merely makes the next use recompute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def eager_persist(df: DataFrame) -> DataFrame:
    """persist + materialize now (count) + register for release."""
    df = df.persist()
    df.count()
    _TRACKED.append(df)
    return df


def lazy_persist(df: DataFrame) -> DataFrame:
    """persist without forcing materialization (for frames consumed
    by exactly one downstream job, e.g. a broadcast side) + register."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked intermediate (and the materialized
    rollups); returns how many cache entries were dropped. Safe to
    call anytime — plans referencing a released cache recompute."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            # a stopped SparkContext can't unpersist — nothing to free
            pass
    _TRACKED.clear()
    from projet_etl_spark.operators import materialized

    n += materialized.invalidate_rollups()
    return n
