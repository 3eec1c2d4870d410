"""Multi-way star join over the full TPC-H-ish schema.

The reference never joins more than two logical inputs (SURVEY.md
§2.3: all its joins are semi/left against small build sides); a real
warehouse query touches the whole star. ``revenue-by-nation`` is the
classic 6-table shape (region -> nation -> customer/supplier ->
orders -> lineitem): per-nation revenue for orders where customer
and supplier share the nation, inside one region and date range.

Scale design (100 TB):
- ``nation``/``region`` are tiny -> explicit ``broadcast()``; their
  filters (r_name) prune nations *before* the big joins.
- lineitem ⋈ orders is the fact-fact join: shuffles on orderkey
  (bucket both by orderkey on a real cluster for a co-located join);
  the date filter is applied to orders BEFORE the join so the shuffle
  carries only the window.
- customer/supplier grow with SF -> left as shuffle joins; Catalyst
  + AQE pick broadcast automatically when a side is small.
- Revenue uses per-row DOUBLE arithmetic cast to DECIMAL(18,4) and
  an exact decimal SUM: decimal addition is associative, so the
  result is bit-identical regardless of partitioning/merge order —
  no ROUND() crutch, and the same number on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.params import DEFAULTS
from projet_etl_spark.sources.tables import load_table

REGION = "EUROPE"


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue where customer and supplier are co-national
    (TPC-H Q5 shape), region + order-date filtered."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.to_date("o_orderdate").between(DEFAULTS["debut"], DEFAULTS["fin"])
        )
        .select("o_orderkey", "o_custkey")
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == REGION
    )

    # exact decimal revenue: associative sum, order-independent
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )
