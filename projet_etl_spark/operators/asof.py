"""As-of (backward) join — an operator Spark's DataFrame API lacks,
re-expressed as a composition of built-ins (union + ordered window
carry-forward), per the engine's custom-operator policy.

For each purchase, attach the most recent click at-or-before it by
the same user. The naive formulation (range join + row_number) blows
up quadratically per user; the union trick is linear: interleave both
streams on the time axis, then ``last(value, ignorenulls)`` over an
unbounded-preceding window carries the latest click forward. One
shuffle on user_id, one sort — the same cost as any windowed
aggregation, and the DuckDB oracle is a native ASOF LEFT JOIN.

Determinism: clicks are deduped to max event_id per (user, ts), and
clicks sort before purchases at equal timestamps in both engines
(ASOF's ``<=`` bound includes the equal instant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_etl_spark.sources.tables import events


def q_purchase_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    merged = clicks.select(
        "user_id",
        "ts",
        "click_id",
        F.lit(None).cast("long").alias("purchase_id"),
    ).unionByName(
        purchases.select(
            "user_id", "ts", F.lit(None).cast("long").alias("click_id"), "purchase_id"
        )
    )
    # clicks first at equal ts: (click_id IS NULL) sorts false<true
    w = Window.partitionBy("user_id").orderBy(
        "ts", F.col("click_id").isNull()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = merged.select(
        "user_id",
        "ts",
        "purchase_id",
        F.last("click_id", ignorenulls=True).over(w).alias("asof_click_id"),
        F.last(
            F.when(F.col("click_id").isNotNull(), F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("asof_click_ts"),
    )
    return carried.filter(F.col("purchase_id").isNotNull()).select(
        "user_id",
        "purchase_id",
        "asof_click_id",
        (F.unix_micros("ts") - F.unix_micros("asof_click_ts")).alias(
            "asof_latency_us"
        ),
    )
