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
