"""The local mirror of the driver's t2 correctness gate: every
registry query with an oracle must match DuckDB on the same parquet
(row count + schema + order-insensitive values)."""

from __future__ import annotations

import pytest

from projet_etl_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMALL, assert_matches_oracle

ORACLE_NAMES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMALL)
    assert_matches_oracle(df, duck, spec.oracle, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 6


def test_registry_contract():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 13


def test_driver_prefix_is_valid():
    """The driver's CORRECTNESS artifact records only the FIRST 50
    registry entries; _DRIVER_PREFIX decides which queries occupy
    that window. _rotate silently skips unknown names, so a typo
    there would silently cost a query its hard value-match row —
    pin that every prefix name resolves and the window isn't
    overcommitted."""
    from projet_etl_spark.plans.registry import REGISTRY, _DRIVER_PREFIX

    unknown = [n for n in _DRIVER_PREFIX if n not in REGISTRY]
    assert not unknown, f"_DRIVER_PREFIX names not in registry: {unknown}"
    assert len(_DRIVER_PREFIX) <= 50, "prefix exceeds the driver's window"
    assert len(set(_DRIVER_PREFIX)) == len(_DRIVER_PREFIX), "duplicate names"
    # and the rotation actually put them first
    head = list(REGISTRY)[: len(_DRIVER_PREFIX)]
    assert head == [n for n in _DRIVER_PREFIX if n in REGISTRY]
