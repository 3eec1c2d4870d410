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


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): per (returnflag,
    linestatus) sums, averages, and row counts over shipped lineitems.

    This is the scan-throughput workhorse: one pruned parquet scan,
    map-side partial aggregation into 4 groups, no join. All sums run
    in exact DECIMAL (associative, partition-order-independent); the
    averages are derived from those exact sums with ONE double
    division at the end, so every value is bit-identical at any
    parallelism — no ROUND() crutch anywhere.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") <= DEFAULTS["as_of"]
    )
    dec = lambda c: c.cast("decimal(18,4)")  # noqa: E731
    qty = dec(F.col("l_quantity"))
    price = dec(F.col("l_extendedprice"))
    disc_price = dec(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    # charge has SIX true decimal digits (2dp price x 2dp discount x
    # 2dp tax) — a 4-digit decimal cast lands on exact .xxxx5
    # midpoints where Spark (HALF_UP) and DuckDB (half-even) disagree;
    # scale 6 holds the exact value so no rounding mode is involved
    charge = (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
    ).cast("decimal(18,6)")
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(dec(F.col("l_discount"))).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highest-revenue orders placed by a market segment before the
    cutoff but still shipping after it (TPC-H Q3 shape).

    Scale shape: both date predicates push into the parquet scans
    BEFORE the joins; customer is filtered to one segment then joined
    on custkey (AQE broadcasts when small, shuffle otherwise);
    the final top-10 plans as TakeOrderedAndProject (per-partition
    heaps, no global sort). Revenue is an exact decimal sum.
    """
    cutoff = DEFAULTS["fin"]
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.to_date("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.to_date("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return
    flag — computed from exact decimal moments (n, Σx, Σy, Σxy, Σx²,
    Σy²), not the engines' native corr().

    Native corr implementations differ numerically (streaming
    Welford vs naive) and are partition-order-dependent; exact
    integer/decimal moments are associative, so the five sums are
    bit-identical at any parallelism and the closed-form combination
    at the end is one deterministic double expression per group.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,4)")
    y = F.col("l_extendedprice").cast("decimal(18,4)")
    xy = (F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(18,4)")
    xx = (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(18,4)")
    yy = (F.col("l_extendedprice") * F.col("l_extendedprice")).cast(
        "decimal(18,4)"
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(xy).cast("double").alias("sxy"),
        F.sum(xx).cast("double").alias("sxx"),
        F.sum(yy).cast("double").alias("syy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return (
        agg.select(
            "l_returnflag",
            F.col("n").cast("long").alias("n_rows"),
            corr.alias("corr_qty_price"),
        )
        .orderBy("l_returnflag")
    )
