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
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        # drop-then-write: overwrite mode alone can't reclaim a
        # leftover managed-table location after an aborted run — and
        # the in-memory catalog forgets tables between processes
        # while their files persist, so the LOCATION must be cleared
        # directly too or saveAsTable refuses to reuse it
        spark.sql(f"DROP TABLE IF EXISTS {db}.{name}")
        shutil.rmtree(f"{warehouse}/{db}.db/{name}", ignore_errors=True)
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


def _star_fingerprint(sf_dir: str) -> str:
    import os

    parts = []
    for t in ("lineitem", "orders"):
        st = os.stat(os.path.join(sf_dir, f"{t}.parquet"))
        parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def ensure_bucketed_star(spark: SparkSession, sf_dir: str) -> str:
    """Build (or reuse) the bucketed lineitem/orders layout for
    ``sf_dir``; returns the catalog database name. The source
    fingerprint lives in TBLPROPERTIES, so a regenerated fixture
    triggers a rebuild and repeat queries reuse the layout — bucket
    materialization is refresh cost, not query cost (the
    materialized-rollup accounting)."""
    import os
    import re

    name = re.sub(
        r"[^0-9a-zA-Z_]", "_", os.path.basename(os.path.normpath(sf_dir)) or "root"
    )
    db = f"bucketed_{name}"
    fp = _star_fingerprint(sf_dir)
    # probe existence first so the cold path never raises (and never
    # spams analysis errors into the driver log)
    if spark.catalog.tableExists(f"{db}.lineitem") and spark.catalog.tableExists(
        f"{db}.orders"
    ):
        props = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {db}.lineitem").collect()
        }
        if props.get("source_fingerprint") == fp:
            return db
    bucketize_star(spark, sf_dir, db=db)
    for t in ("lineitem", "orders"):
        spark.sql(
            f"ALTER TABLE {db}.{t} SET TBLPROPERTIES "
            f"('source_fingerprint'='{fp}')"
        )
    return db


def q_orders_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity totals per order priority THROUGH the bucketed
    co-located layout: lineitem⋈orders read from catalog tables
    bucketed by the join key, so the fact-fact join needs no shuffle
    on either side (the explicit form of what "bucket both sides by
    orderkey" means at 100 TB — the single biggest shuffle in the
    star schema simply disappears from every downstream join).

    Layout equivalence is the checked contract: bucketing changes
    WHERE rows live, never WHAT they are, so the oracle is the plain
    lineitem⋈orders aggregate over the raw parquet — a green driver
    row proves the bucketed path returns bit-identical results.
    Quantities aggregate as exact DECIMAL (associative at any
    parallelism / bucket count).
    """
    from projet_etl_spark.functions.fixedpoint import (
        UnitSum,
        fixed_point_agg,
        units,
    )

    db = ensure_bucketed_star(spark, sf_dir)
    li = spark.table(f"{db}.lineitem").select("l_orderkey", "l_quantity")
    o = spark.table(f"{db}.orders").select("o_orderkey", "o_orderpriority")
    return (
        fixed_point_agg(
            li.join(o, li.l_orderkey == o.o_orderkey),
            ["o_orderpriority"],
            [UnitSum("uq", units("l_quantity"), 2, 10**6)],
            counts=[("n_items", None)],
        )
        .select(
            "o_orderpriority",
            F.col("n_items").cast("long").alias("n_items"),
            # exact decimal internally, DOUBLE in the final projection
            # (engine output contract; see star.q_customer_spend_deciles)
            F.col("uq").cast("decimal(18,2)").cast("double").alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )


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
