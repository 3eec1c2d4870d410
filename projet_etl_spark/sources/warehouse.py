"""Warehouse layout helpers for cluster-scale joins.

Two patterns the 100 TB design leans on, made concrete:

- **Bucketed co-located joins**: lineitem⋈orders is fact-fact on
  the natural key; bucketing both sides by the join key at write
  time gives a shuffle-free sort-merge join (both sides already
  hash-distributed the same way). ``bucketize_star`` materializes
  the layout; the plan test asserts no Exchange appears above the
  bucketed scans.
- **Salted joins / aggregations**: when a key is pathologically hot,
  ``salted`` spreads it over N subkeys; aggregate partials per
  subkey, then merge. AQE's skew-join handles moderate skew at
  runtime; salting is the explicit form for the extreme tail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.sources.tables import load_table

N_BUCKETS = 16


def bucketize_star(spark: SparkSession, sf_dir: str, db: str = "bucketed") -> None:
    """Materialize lineitem/orders bucketed by the join key.

    Written as managed tables (bucket metadata lives in the catalog;
    plain parquet files can't carry it).
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        # drop-then-write: overwrite mode alone can't reclaim a
        # leftover managed-table location after an aborted run
        spark.sql(f"DROP TABLE IF EXISTS {db}.{name}")
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(f"{db}.{name}")
        )


def bucketed_sales_join(spark: SparkSession, db: str = "bucketed") -> DataFrame:
    """lineitem⋈orders over the bucketed layout: with
    spark.sql.sources.bucketing.enabled (default true) this plans as
    a sort-merge join with NO shuffle on either side."""
    li = spark.table(f"{db}.lineitem")
    o = spark.table(f"{db}.orders")
    return li.join(o, li.l_orderkey == o.o_orderkey)


def salted(df: DataFrame, key: str, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Spread each hot ``key`` value over ``n_salts`` partial groups.

    The salt must vary WITHIN a key group to be of any use, and
    full-duplicate rows are a meaningful grain in this data model —
    hashing the whole row would hand every duplicate the same salt
    and leave the hot key on one reducer. So the salt hashes the
    non-key columns plus a per-row ordinal; the ordinal guarantees
    spread even when rows are bit-identical. Salt values are not
    stable across repartitionings — fine, because downstream partial
    aggregation is salt-value-agnostic."""
    others = [F.col(c) for c in df.columns if c != key]
    return df.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(*others, F.monotonically_increasing_id()), F.lit(n_salts)
        ),
    )


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """COUNT(*) per key under skew: partial counts per (key, salt)
    — map-side combine keeps any single reducer's group bounded —
    then a second tiny aggregation merges the partials."""
    partial = (
        salted(df, key, n_salts)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").cast("long").alias("n"))


def explain_has_shuffle_above_scan(df: DataFrame) -> bool:
    """True if the plan contains a SHUFFLE exchange (hash
    repartitioning) — broadcast exchanges don't count; they move the
    small side, not the fact table."""
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    return "Exchange hashpartitioning" in plan
