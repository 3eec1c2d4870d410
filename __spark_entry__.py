"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``projet_etl_spark`` package; this file
only wires the contract to the engine's query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from projet_etl_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (top-magasins, the densest reference template:
    scan → filter → multi-COUNT-DISTINCT groupBy → weighted score →
    distributed top-k) on /root/testdata/sf0.001."""
    return _registry.queries()["top-magasins"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
