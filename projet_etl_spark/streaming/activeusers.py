"""Streaming daily active users: dedup-then-aggregate.

The streaming twin of the DAU half of
operators/events_windows.q_rolling_active_users: an exact per-day
distinct-user count over an at-least-once event feed. Streaming
aggregations can't express COUNT(DISTINCT), so the distinct is made
explicit — dropDuplicates on (user_id, day) upstream of a plain
count — the canonical chained-stateful-operator shape (dedup state →
window aggregation state), supported natively by Spark 3.4+.

State eviction: the dedup key includes the day-truncated EVENT-TIME
column (``day_ts``, the watermarked column), so per-(user, day) state
is dropped once the watermark passes the day — on an unbounded feed
the state bound is |active users| × watermark horizon in days, which
is what keeps exact DAU feasible.

The trailing-7-day WAU half deliberately has no streaming twin: an
exact sliding distinct would need per-(user, 7-day-window) dedup
state 7× the DAU state; at stream scale the right tool is a merged
HLL sketch per day (the `mag-cat-approx` pattern). Documented, not
silently approximated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_active_users(events: DataFrame, watermark: str = "2 days") -> DataFrame:
    """Exact per-day distinct users (expects TimestampType ``ts``).

    Duplicate deliveries of the same (user, day) — redelivery, or a
    user's repeated events within a day — collapse in the dedup
    stage, so the downstream count needs no distinct.
    """
    day = F.date_trunc("day", F.col("ts"))
    return (
        events.select(F.col("user_id"), day.alias("day_ts"))
        .withWatermark("day_ts", watermark)
        .dropDuplicates(["user_id", "day_ts"])
        .groupBy(F.window("day_ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("dau"))
        .select(F.date_format("w.start", "yyyy-MM-dd").alias("day"), "dau")
    )


def cumulative_new_users(events: DataFrame) -> DataFrame:
    """Streaming twin of operators/events_windows.q_users_cumulative:
    per-day NEW-user counts from an at-least-once feed. A user's
    first-ever event survives `dropDuplicates(["user_id"])`; every
    later event (and every redelivery) hits existing state and drops,
    so counting the survivors per day counts first appearances — the
    downstream cumulative sum is a days-sized batch step over the
    sink.

    State is keyed on user_id alone with NO watermark, deliberately:
    "have we ever seen this user" is dimension-sized state (bound =
    |users|, exactly the SCD2/history.py argument), and evicting it
    would re-count returning users as new.
    """
    day = F.date_trunc("day", F.col("ts"))
    return (
        events.select("user_id", day.alias("day_ts"))
        .dropDuplicates(["user_id"])
        .groupBy(F.window("day_ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("new_users"))
        .select(F.date_format("w.start", "yyyy-MM-dd").alias("day"), "new_users")
    )
