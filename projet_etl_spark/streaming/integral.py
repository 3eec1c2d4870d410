"""Streaming time-weighted integral: the streaming twin of
operators/events_windows.q_events_time_weighted_avg.

Per-user state = the last observation (ts, event_id, value) plus the
running integral (Σ value·dt) and span (Σ dt). Each micro-batch
extends the integral with the holding periods its events close —
including the period carried OPEN across the batch boundary by the
previous batch's last observation — and re-emits the user's running
totals; an upsert on user_id converges to the batch operator.

Replay safety mirrors streaming/history.py: events at or below the
(ts, event_id) high-water mark are skipped, so redelivered batches
are no-ops. State is one tuple per user (dimension-sized — the
SCD2/new-users bound argument); the ordering contract is the same as
any streaming CDC consumer: cross-batch event-time order (in-batch
disorder is sorted away, late stragglers are dropped at the mark).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_obs long, span_us long, weighted_sum double"
STATE_SCHEMA = "last_us long, last_eid long, last_value double, acc_w double, acc_dt long, n long"


def make_update_integral():
    """Closure so cloudpickle ships the function by value."""

    def update_integral(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        (user_id,) = key
        if state.exists:
            last_us, last_eid, last_value, acc_w, acc_dt, n = state.get
        else:
            last_us, last_eid, last_value, acc_w, acc_dt, n = -1, -1, 0.0, 0.0, 0, 0

        batch = _pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
        for ts_us, eid, value in zip(
            batch["ts_us"].astype("int64"),
            batch["event_id"].astype("int64"),
            batch["value"].astype("float64"),
        ):
            if (ts_us, eid) <= (last_us, last_eid):
                continue  # redelivery at/below the high-water mark
            if n > 0:
                dt = int(ts_us) - last_us
                acc_w += last_value * float(dt)
                acc_dt += dt
            last_us, last_eid, last_value = int(ts_us), int(eid), float(value)
            n += 1

        state.update((last_us, last_eid, last_value, acc_w, acc_dt, n))
        yield _pd.DataFrame(
            {
                "user_id": [user_id],
                "n_obs": [n],
                "span_us": [acc_dt],
                "weighted_sum": [acc_w],
            }
        )

    return update_integral


def time_weighted_integral_stream(events: DataFrame) -> DataFrame:
    """Running per-user (n_obs, span_us, Σ value·dt) over an events
    feed (expects TimestampType ``ts``); upsert on user_id, last
    write wins — twa = weighted_sum / span_us at read time."""
    prepared = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        F.col("value").cast("double").alias("value"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        make_update_integral(),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
