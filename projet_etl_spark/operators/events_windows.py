"""Windowed aggregations over the events table (batch form).

Tumbling / sliding / session windows expressed as batch DataFrame
plans with exact ANSI-SQL oracles; the Structured Streaming forms of
the same computations live in projet_etl_spark/streaming/ (windows
over readStream with watermarks — rows-only checkable, since a
streaming sink can't be oracle'd by DuckDB).

Window starts are emitted as formatted strings so the value hash is
engine-neutral (no timestamp-encoding skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_etl_spark.sources.tables import events

SESSION_GAP_MIN = 15
TS_FMT = "yyyy-MM-dd HH:mm:ss"


def q_events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour, per-type counts and value sums (tumbling window)."""
    ev = events(spark, sf_dir)
    win = F.window("ts", "1 hour")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


def q_events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes, per event type."""
    ev = events(spark, sf_dir)
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
        )
        .orderBy("window_start", "event_type")
    )


def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization with a 15-minute inactivity gap.

    Classic gaps-and-islands: a window lag marks session starts, a
    running sum numbers sessions — both engines implement identical
    ANSI window semantics, so this is exactly oracle-checkable
    (unlike streaming session_window state, tested in streaming/).
    """
    ev = events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond arithmetic (unix_micros / epoch_us) so the gap
    # comparison is integer-exact in both engines
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(by_user)
            > SESSION_GAP_MIN * 60 * 1_000_000,
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
            F.date_format(F.max("ts"), TS_FMT).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("user_id", "session_no")
    )
