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
