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

# A long-lived query service that never calls release_caches() must
# not accumulate an unbounded driver-side list (each entry pins a
# py4j handle even after its storage blocks are LRU-evicted). Past
# this cap the oldest tracked persist is dropped eagerly —
# unpersisting is always safe (dependent plans recompute).
_MAX_TRACKED = 256


def _track(df: DataFrame) -> None:
    _TRACKED.append(df)
    while len(_TRACKED) > _MAX_TRACKED:
        old = _TRACKED.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass


def eager_persist(df: DataFrame) -> DataFrame:
    """persist + materialize now (count) + register for release."""
    df = df.persist()
    df.count()
    _track(df)
    return df


def lazy_persist(df: DataFrame) -> DataFrame:
    """persist without forcing materialization (for frames consumed
    by exactly one downstream job, e.g. a broadcast side) + register."""
    df = df.persist()
    _track(df)
    return df


def release_caches(rollups: bool = True) -> int:
    """Unpersist every tracked intermediate (and, unless
    ``rollups=False``, the materialized rollups); returns how many
    cache entries were dropped. Safe to call anytime — plans
    referencing a released cache recompute. ``rollups=False`` is for
    callers (e.g. the bench harness) that staged the rollups
    deliberately and only want per-query intermediates dropped."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            # a stopped SparkContext can't unpersist — nothing to free
            pass
    _TRACKED.clear()
    if rollups:
        from projet_etl_spark.operators import materialized

        n += materialized.invalidate_rollups()
    return n
