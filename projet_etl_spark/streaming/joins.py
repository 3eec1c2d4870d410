"""Stream-stream interval join: click -> purchase attribution.

Joins two event streams (clicks and purchases by the same user)
where the purchase lands within ATTRIBUTION_MINUTES after the click.
Both sides carry watermarks so Spark can bound the join state: a
click older than watermark + interval can never match a future
purchase and is evicted — the condition that makes an unbounded
stream-stream join feasible at all.

Batch parity: the same join expressed over the static events table
(q_click_purchase_attribution_batch) — the streaming test asserts
equality, and the batch form is oracle-checked in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ATTRIBUTION_MINUTES = 30


def _split(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    )
    return clicks, purchases


def _join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_MINUTES} MINUTES")
        )
    )
    return clicks.join(purchases, cond).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.round("amount", 6).alias("amount"),
        (
            F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
        ).alias("latency_us"),
    )


def click_purchase_attribution_stream(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming form: both sides watermarked, interval condition
    bounds the state retention."""
    clicks, purchases = _split(events)
    return _join(
        clicks.withWatermark("click_ts", watermark),
        purchases.withWatermark("purchase_ts", watermark),
    )


def q_click_purchase_attribution_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch form over the static events table (oracle-checked)."""
    from projet_etl_spark.sources.tables import events as load_events

    ev = load_events(spark, sf_dir)
    clicks, purchases = _split(ev)
    return _join(clicks, purchases)
