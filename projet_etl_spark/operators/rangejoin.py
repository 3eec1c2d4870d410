"""Range join via bucket decomposition — the second custom operator
(after as-of) that Spark's optimizer lacks a native strategy for.

Joining a fact value against interval dimensions (``lo <= v < hi``)
naively plans as a broadcast nested-loop join: every row probes every
band. The scale path decomposes each interval into fixed-width
buckets, turning the theta join into an equi-join on bucket id plus
a residual filter — hash join cost, resilient to dimension tables
far too large to nested-loop.

Bands here are value tiers over events.value (domain ~0..500); the
oracle states the same join as a plain inequality join in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.sources.tables import events

# (band, lo, hi) — irregular tiers so the bucket decomposition is
# actually exercised (several buckets per band, several bands per
# bucket at the boundaries)
BANDS: list[tuple[str, float, float]] = [
    ("micro", 0.0, 5.0),
    ("small", 5.0, 25.0),
    ("mid", 25.0, 100.0),
    ("large", 100.0, 250.0),
    ("whale", 250.0, 1000.0),
]
BUCKET_WIDTH = 25.0


def q_events_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag each event with its value band; per-band rollup."""
    ev = events(spark, sf_dir).select("event_id", "event_type", "value")
    bands = spark.createDataFrame(BANDS, "band string, lo double, hi double")
    # decompose each band into the integer buckets it overlaps
    exploded = bands.select(
        "band",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / BUCKET_WIDTH),
                F.floor((F.col("hi") - F.lit(1e-9)) / BUCKET_WIDTH),
            )
        ).alias("bucket"),
    )
    fact = ev.withColumn("bucket", F.floor(F.col("value") / BUCKET_WIDTH))
    tagged = fact.join(F.broadcast(exploded), "bucket").filter(
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return (
        tagged.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("band")
    )


# --- interval-interval overlap join ---------------------------------

OVERLAP_TYPE_A = "error"
OVERLAP_TYPE_B = "view"
# events are sparse per user (hours apart), so the burst/browsing
# windows use a 12 h inactivity gap — "same activity day" islands —
# rather than the 15 min UI-session gap of q_events_session
OVERLAP_GAP_MIN = 720


def _typed_sessions(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    """Per-user gaps-and-islands sessions over ONE event type, with
    integer-microsecond bounds kept for exact interval arithmetic."""
    from pyspark.sql import Window

    ev = (
        events(spark, sf_dir)
        .filter(F.col("event_type") == event_type)
        .select("user_id", "ts", "event_id")
    )
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(by_user)
            > OVERLAP_GAP_MIN * 60 * 1_000_000,
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("new_session")
        .over(by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min(F.unix_micros(F.col("ts"))).alias("start_us"),
        F.max(F.unix_micros(F.col("ts"))).alias("end_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def q_events_session_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join: per user, which error-burst
    sessions overlap which browsing (view) sessions, and by how long
    — the "incident impact" shape (which activity windows were hit by
    an error window). Completes the join family: equi (star), as-of
    (asof.py), point-in-interval (bands above), interval-interval
    (here).

    Scale shape: both session sets are already reduced (gaps-and-
    islands per user, windows partitioned by user_id — never global);
    the overlap join is an EQUI-join on user_id with the two interval
    comparisons as residual predicates, so it hash-partitions on the
    user key like any fact join — per-user session counts bound the
    residual work, and a hot user is AQE-splittable. No nested-loop
    plan at any size. Overlap arithmetic is integer microseconds —
    exact in both engines.
    """
    a = _typed_sessions(spark, sf_dir, OVERLAP_TYPE_A).select(
        "user_id",
        F.col("session_no").alias("err_session"),
        F.col("start_us").alias("a_start"),
        F.col("end_us").alias("a_end"),
    )
    b = _typed_sessions(spark, sf_dir, OVERLAP_TYPE_B).select(
        "user_id",
        F.col("session_no").alias("view_session"),
        F.col("start_us").alias("b_start"),
        F.col("end_us").alias("b_end"),
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    joined = a.join(b, "user_id").filter(
        (F.col("a_start") <= F.col("b_end")) & (F.col("b_start") <= F.col("a_end"))
    )
    return joined.select(
        "user_id",
        "err_session",
        "view_session",
        F.date_format(F.timestamp_micros(F.col("a_start")), fmt).alias("err_start"),
        F.date_format(F.timestamp_micros(F.col("a_end")), fmt).alias("err_end"),
        F.date_format(F.timestamp_micros(F.col("b_start")), fmt).alias("view_start"),
        F.date_format(F.timestamp_micros(F.col("b_end")), fmt).alias("view_end"),
        (
            F.least(F.col("a_end"), F.col("b_end"))
            - F.greatest(F.col("a_start"), F.col("b_start"))
        ).alias("overlap_us"),
    ).orderBy("user_id", "err_session", "view_session")
