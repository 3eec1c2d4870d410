"""Data-quality expectations + CDC type-1 upsert (MERGE semantics).

The reference app trusts its warehouse implicitly — nothing in
/root/reference/etl_project checks a key, a null, or a foreign key
before querying (views.py:10-339 goes straight from raw tables to
answers). At 100 TB nothing can be trusted implicitly, so the engine
ships the two hygiene operators every production pipeline ends up
needing:

- a declarative **expectations sweep** (the Deequ /
  Great-Expectations shape, re-expressed as plain Spark
  aggregation): one row per constraint with violation counts, so
  "is the warehouse sane" is itself a query with an oracle;
- a **type-1 upsert** (the MERGE INTO shape): apply a CDC batch of
  updates + inserts over a keyed base table, last-writer-wins, no
  history — the companion to the SCD2 type-2 operator in
  operators/scd.py.

Both are pure DataFrame plans: no collect, no Python row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.functions.fixedpoint import UnitSum, fixed_point_agg, units
from projet_etl_spark.operators.star import TP2_MAX
from projet_etl_spark.sources.tables import load_table

# Expectation bounds — shared with the DuckDB oracle so the two
# sides cannot drift.
QTY_MIN = 1.0
QTY_MAX = 50.0
DISC_MAX_CENTS = 10  # discounts live on the [0.00, 0.10] grid


def _long_form(df: DataFrame, rows: list[tuple[str, str, str]]) -> DataFrame:
    """Pivot a 1-row aggregate into (expectation, violations, checked)
    long form with ONE ``stack`` projection — the aggregate's scan
    runs once no matter how many constraints it feeds."""
    n = len(rows)
    cells = ", ".join(f"'{name}', {viol}, {chk}" for name, viol, chk in rows)
    return df.selectExpr(
        f"stack({n}, {cells}) as (expectation, violations, checked)"
    )


def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint sweep over the warehouse: primary-key uniqueness,
    not-null, value-range, and referential integrity, one result row
    per expectation with exact violation counts and rates.

    Scale shape: four branches, each a single column-pruned scan (or
    one equi-join) reduced to a 1-row aggregate, pivoted to long form
    by a ``stack`` projection — constraint count never adds scans.
    The referential checks run as LEFT OUTER equi-joins aggregated to
    (count, misses) in the same pass, so "checked" and "violations"
    come from one shuffle; on the bucketed warehouse the
    lineitem-to-orders check is co-located and shuffle-free, and at
    100 TB each branch is an independent map-side-combined aggregate
    whose output is one row. The uniqueness check is an exact
    COUNT(DISTINCT) (two-stage shuffle on the key) — the KMV sketch
    family (operators/sketches.py) is the approximate fallback when
    a cheap pass suffices.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    o_agg = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_orderkey").alias("dk"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("nn"),
    )
    o_rows = _long_form(
        o_agg,
        [
            ("orders.pk-unique", "n - dk", "n"),
            ("orders.custkey-not-null", "nn", "n"),
        ],
    )

    qty_bad = ~((F.col("l_quantity") >= QTY_MIN) & (F.col("l_quantity") <= QTY_MAX))
    disc_bad = ~(
        (units("l_discount") >= 0) & (units("l_discount") <= DISC_MAX_CENTS)
    )
    l_agg = lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(qty_bad, 1).otherwise(0)).cast("long").alias("qv"),
        F.sum(F.when(disc_bad, 1).otherwise(0)).cast("long").alias("dv"),
    )
    l_rows = _long_form(
        l_agg,
        [
            ("lineitem.qty-range", "qv", "n"),
            ("lineitem.discount-range", "dv", "n"),
        ],
    )

    fk_o = (
        orders.select("o_custkey")
        .join(
            customer.select(F.col("c_custkey").alias("ck")),
            F.col("o_custkey") == F.col("ck"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("ck").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("miss"),
        )
    )
    fk_o_rows = _long_form(fk_o, [("orders.fk-customer", "miss", "n")])

    fk_l = (
        lineitem.select("l_orderkey")
        .join(
            orders.select(F.col("o_orderkey").alias("ok")),
            F.col("l_orderkey") == F.col("ok"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("ok").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("miss"),
        )
    )
    fk_l_rows = _long_form(fk_l, [("lineitem.fk-orders", "miss", "n")])

    c_agg = customer.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("c_acctbal").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("nv"),
    )
    c_rows = _long_form(c_agg, [("customer.acctbal-not-null", "nv", "n")])

    out = o_rows.unionByName(l_rows).unionByName(fk_o_rows)
    out = out.unionByName(fk_l_rows).unionByName(c_rows)
    return out.select(
        "expectation",
        F.col("violations").cast("long").alias("violations"),
        F.col("checked").cast("long").alias("checked"),
        # try_divide: NULL (not an ANSI error) when a table is empty
        F.round(
            F.try_divide(
                F.col("violations").cast("double"), F.col("checked").cast("double")
            ),
            6,
        ).alias("violation_rate"),
    ).orderBy("expectation")


# CDC batch derivation constants — deterministic functions of the
# base table so the oracle derives the identical batch.
UPSERT_UPDATE_MOD = 10  # o_orderkey % 10 == 3 -> repriced in place
UPSERT_UPDATE_RES = 3
UPSERT_INSERT_MOD = 97  # o_orderkey % 97 == 0 -> cloned as a new order
UPSERT_KEY_OFFSET = 3_000_000_000  # re-keys inserts past the base key range
UPSERT_FEE_CENTS = 1_000  # flat +10.00 repricing adjustment (exact in cents)


def q_orders_upsert_type1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-1 upsert (MERGE INTO, last-writer-wins): apply a CDC
    batch of updates and inserts over the keyed orders base, then
    summarize the post-merge table per status — count and exact
    revenue — so merge semantics (replaced rows replaced, new rows
    present, untouched rows untouched) are value-checked without
    emitting a table-sized result.

    The batch is derived deterministically from the base itself:
    every ``o_orderkey % 10 == 3`` order is repriced (+10.00, status
    'U'), every ``% 97 == 0`` order is cloned as a new order past the
    key range (status 'N').

    Scale shape: merge = ``changes UNION ALL (base ANTI JOIN
    changes)`` — the scalable MERGE plan: ONE equi-shuffle on the
    merge key (co-located and shuffle-free on the bucketed
    warehouse), no full-outer row widening, no per-column coalesce
    churn; batch-side cost is O(|changes|). The summary then reduces
    on the 5-value status grain under exact fixed-point sums. At
    100 TB the anti-join is the only data-sized exchange and AQE
    picks broadcast automatically when a CDC batch is small.
    """
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        units("o_totalprice").alias("pu"),
    )
    updates = base.filter(
        F.col("o_orderkey") % UPSERT_UPDATE_MOD == UPSERT_UPDATE_RES
    ).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("pu") + UPSERT_FEE_CENTS).alias("pu"),
    )
    inserts = base.filter(F.col("o_orderkey") % UPSERT_INSERT_MOD == 0).select(
        (F.col("o_orderkey") + UPSERT_KEY_OFFSET).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        "pu",
    )
    changes = updates.unionByName(inserts)
    untouched = base.join(
        changes.select("o_orderkey"), "o_orderkey", "left_anti"
    )
    merged = changes.unionByName(untouched)
    summary = fixed_point_agg(
        merged,
        ["o_orderstatus"],
        # rows are already integer cents; the +fee keeps the bound honest
        [UnitSum("rev_dec", F.col("pu"), 2, TP2_MAX + UPSERT_FEE_CENTS)],
        counts=[("n_orders", None)],
    )
    return summary.select(
        "o_orderstatus",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round(F.col("rev_dec").cast("double"), 2).alias("revenue"),
    ).orderBy("o_orderstatus")
