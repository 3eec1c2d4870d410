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


ROLLING_DAYS = 7


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: exact distinct active users that day (DAU) and over
    the trailing 7 days (WAU), plus DAU/WAU stickiness — the classic
    growth-analytics rollup.

    Scale shape: a sliding COUNT(DISTINCT) cannot ride an ordinary
    window frame, and a day-spine range join would be a nested-loop.
    Instead each (user, day) contributes itself to the 7 days it
    keeps the user "active" for — a map-side `explode(sequence(...))`
    — and both counts become plain hash aggregations. No join against
    the event volume: events reduce to the (user, day) grain first,
    so the explode multiplies user-days, not events. The exact
    distinct is the oracle-able baseline; at 100 TB swap the final
    count for HLL sketches merged per day (`mag-cat-approx` pattern).
    """
    ev = events(spark, sf_dir)
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    contrib = ud.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", ROLLING_DAYS - 1))
        ).alias("day"),
        "user_id",
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "day")  # inner: keeps only days with events
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


def q_rolling_active_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB / streaming form of ``q_rolling_active_users``:
    DAU and trailing-7-day WAU as HyperLogLog++ estimates.

    Why this exists: the exact form's contribution explode carries
    every (user, day) pair through the shuffle; the sketch form
    reduces map-side to ONE mergeable HLL per (day, partition), so
    shuffle volume is sketches × days, independent of user count —
    the same estimator a streaming job would merge per micro-batch.
    No DuckDB oracle: HLL estimates are implementation-specific
    (rows-only check, like mag-cat-approx); the accuracy contract
    against the exact twin is pinned by
    tests/test_scale_patterns.py::test_rolling_approx_within_tolerance.
    """
    ev = events(spark, sf_dir)
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = ud.groupBy("day").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("dau_approx")
    )
    contrib = ud.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", ROLLING_DAYS - 1))
        ).alias("day"),
        "user_id",
    )
    wau = contrib.groupBy("day").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("wau_approx")
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau_approx").cast("long"),
            F.col("wau_approx").cast("long"),
        )
        .orderBy("day")
    )


def _versioned_user_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared SCD2 versioning core: collapse same-state runs per
    user, then open one validity interval per state CHANGE —
    (user_id, state, version_no, from_ts, to_ts), NULL to_ts =
    current version. ONE contract for both the history build and the
    as-of snapshot, so the versioning rules (tie-break order, run
    collapse) can never desynchronize between them.

    Scale shape: both window passes partition by user_id with the
    same (ts, event_id) order, so the change-detection lag and the
    interval-closing lead share ONE shuffle + sort (the filter
    between them preserves distribution and order — Catalyst plans a
    single Exchange). Output is O(state changes), the SCD2 contract.
    """
    ev = events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn(
        "prev_state", F.lag("event_type").over(by_user)
    ).filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("event_type"))
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.row_number().over(by_user).cast("long").alias("version_no"),
        F.col("ts").alias("from_ts"),
        F.lead("ts").over(by_user).alias("to_ts"),
    )


def q_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from the event
    stream: each user's event_type acts as their current state; runs
    of the same state collapse, and each state CHANGE opens a
    versioned validity interval [valid_from, valid_to) closed by the
    next change (NULL valid_to = current version) — the standard
    warehouse history-table shape, built distributively (see
    ``_versioned_user_states`` for the single-shuffle plan shape).
    """
    versioned = _versioned_user_states(spark, sf_dir)
    return versioned.select(
        "user_id",
        "state",
        "version_no",
        F.date_format("from_ts", TS_FMT).alias("valid_from"),
        F.date_format("to_ts", TS_FMT).alias("valid_to"),
        F.isnull("to_ts").cast("long").alias("is_current"),
    ).orderBy("user_id", "version_no")


ASOF_SNAPSHOT = "2024-01-15 12:00:00"  # mid-fixture instant, UTC


def q_user_state_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time snapshot of the SCD2 user-state dimension: each
    user's state AS OF a fixed instant — the time-travel read every
    type-2 history table exists to serve (pick the version whose
    [valid_from, valid_to) interval contains the instant).

    Scale shape: the exact versioned frame of the history build
    (``_versioned_user_states`` — shared code, not a re-derivation),
    then a map-side interval filter — the snapshot never
    materializes the full history, and at 100 TB the filter prunes to
    at most one row per user before any downstream join. The
    interval comparison runs in integer microseconds on both engines
    (no timestamp-encoding skew).
    """
    from datetime import datetime, timezone

    asof_us = int(
        datetime.strptime(ASOF_SNAPSHOT, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=timezone.utc)
        .timestamp()
        * 1_000_000
    )
    versioned = _versioned_user_states(spark, sf_dir).select(
        "user_id",
        "state",
        "version_no",
        F.unix_micros(F.col("from_ts")).alias("from_us"),
        F.unix_micros(F.col("to_ts")).alias("to_us"),
    )
    return (
        versioned.filter(
            (F.col("from_us") <= F.lit(asof_us))
            & (F.col("to_us").isNull() | (F.col("to_us") > F.lit(asof_us)))
        )
        .select(
            "user_id",
            "state",
            "version_no",
            F.date_format(F.timestamp_micros("from_us"), TS_FMT).alias(
                "valid_from"
            ),
        )
        .orderBy("user_id")
    )


def q_events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of ``value``: each observation
    weighs by its holding time (microseconds until the user's next
    event; the last observation carries no weight) — the TSDB
    time_weight/locf-integral shape, where a plain AVG would let
    burst sampling dominate the mean.

    Scale shape: one per-user window (lead) and one hash aggregate,
    both on user_id — the weight integral never materializes beyond
    a per-row dt column. Microsecond arithmetic is integer-exact;
    the single sum/sum division rounds once for presentation.
    """
    ev = events(spark, sf_dir).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        "value",
    )
    by_user = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    dted = ev.withColumn("dt_us", F.lead("ts_us").over(by_user) - F.col("ts_us"))
    return (
        dted.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.coalesce(F.sum("dt_us"), F.lit(0)).cast("long").alias("span_us"),
            F.round(
                F.sum(F.col("value") * F.col("dt_us").cast("double"))
                / F.sum("dt_us").cast("double"),
                6,
            ).alias("twa"),
        )
        .orderBy("user_id")
    )


def q_events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour per-type OHLC bars: open/close are the first/last
    values in (ts, event_id) order — deterministic even under
    same-timestamp events, unlike min_by/max_by tie behavior — plus
    high/low/volume/count (the candlestick rollup).

    Scale shape: both row_number windows partition on the SAME
    (hour, type) key the final aggregate groups by, so the plan is
    one exchange + two partition-local sorts + one hash aggregate;
    window input is event rows but every partition is one bucket's
    worth of one type — bounded by the bucket, not the stream.
    """
    ev = events(spark, sf_dir).select(
        F.date_trunc("hour", F.col("ts")).alias("h"),
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        "value",
    )
    w_asc = Window.partitionBy("h", "event_type").orderBy("ts_us", "event_id")
    w_desc = Window.partitionBy("h", "event_type").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    ranked = ev.withColumn("rn_a", F.row_number().over(w_asc)).withColumn(
        "rn_d", F.row_number().over(w_desc)
    )
    return (
        ranked.groupBy("h", "event_type")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.round(F.sum("value"), 6).alias("volume"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            F.date_format("h", TS_FMT).alias("hour"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_events",
        )
        .orderBy("hour", "event_type")
    )


def q_users_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — "users acquired to date"
    without a windowed COUNT(DISTINCT): reduce each user to their
    FIRST-SEEN day (one hash aggregate), count first-appearances per
    day, then one cumulative-sum window over the days-sized series.
    The windowed-distinct anti-pattern would sort user sets per
    frame; this form's window input is |days| rows at any event
    volume.
    """
    ev = events(spark, sf_dir).select(
        "user_id", F.to_date("ts").alias("d")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    per_day = first_seen.groupBy("d0").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("d0").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        F.date_format("d0", "yyyy-MM-dd").alias("day"),
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("users_to_date"),
    ).orderBy("day")
