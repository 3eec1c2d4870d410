"""Table profiling: the data-quality census a pipeline runs before
trusting a new drop — per column: row/null/distinct counts and
extremes, in one long-format frame.

Scale shape: one 1-row aggregate PER COLUMN, unioned — each branch's
parquet scan reads exactly its own column chunk (ReadSchema pruning;
profiling a 400-column table reads 400 column streams, never 400 x
the table), branches run in parallel, and nothing shuffles more than
one row per branch except the distinct pre-reduce. Exact
COUNT(DISTINCT) is the oracle-able baseline; at 100 TB swap it for
the mergeable KMV sketch (operators/sketches.py) column by column —
the output contract doesn't change.

Extremes are typed, not stringified: numeric columns fill
(min_num, max_num) — raw stored values, bit-identical across
engines since MIN/MAX select, never compute — and string/timestamp
columns fill (min_str, max_str) (timestamps formatted, strings
compared binary in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.sources.tables import events

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _agg_counts(col: str):
    return [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count(col)).cast("long").alias("n_nulls"),
        F.countDistinct(col).cast("long").alias("n_distinct"),
    ]


def _num(ev: DataFrame, col: str) -> DataFrame:
    return ev.select(col).agg(
        *_agg_counts(col),
        F.min(col).cast("double").alias("min_num"),
        F.max(col).cast("double").alias("max_num"),
        F.lit(None).cast("string").alias("min_str"),
        F.lit(None).cast("string").alias("max_str"),
    ).select(F.lit(col).alias("col"), "*")


def _str(ev: DataFrame, col: str) -> DataFrame:
    return ev.select(col).agg(
        *_agg_counts(col),
        F.lit(None).cast("double").alias("min_num"),
        F.lit(None).cast("double").alias("max_num"),
        F.min(col).alias("min_str"),
        F.max(col).alias("max_str"),
    ).select(F.lit(col).alias("col"), "*")


def _ts(ev: DataFrame, col: str) -> DataFrame:
    return ev.select(col).agg(
        *_agg_counts(col),
        F.lit(None).cast("double").alias("min_num"),
        F.lit(None).cast("double").alias("max_num"),
        F.date_format(F.min(col), TS_FMT).alias("min_str"),
        F.date_format(F.max(col), TS_FMT).alias("max_str"),
    ).select(F.lit(col).alias("col"), "*")


def q_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column census of the events table: one row per column with
    row/null/exact-distinct counts and typed extremes."""
    ev = events(spark, sf_dir)
    branches = [
        _num(ev, "event_id"),
        _ts(ev, "ts"),
        _num(ev, "user_id"),
        _str(ev, "event_type"),
        _num(ev, "value"),
        _str(ev, "props"),
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out.orderBy("col")
