"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the engine's escape hatch for operators Spark's built-in
windows can't express: arbitrary per-key state evolved across
micro-batches with Arrow-batched pandas, bounded by group-state
timeouts. Here: a running per-user accumulator (event count, value
sum, last-seen timestamp) emitted every micro-batch.

Scale notes: state lives in the state store partitioned by the
grouping key (user_id), so this shuffles once per micro-batch on the
same key a batch groupBy would; Arrow batching keeps the
Python-boundary cost amortized.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, last_ts_us long"
STATE_SCHEMA = "n long, s double, last_us long"


def make_update_user_state():
    """Closure so cloudpickle ships the function by value — executors
    of an external driver don't have this package on sys.path."""

    def update_user_state(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        (user_id,) = key
        if state.exists:
            n, s, last_us = state.get
        else:
            n, s, last_us = 0, 0.0, 0
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            if len(pdf):
                last_us = max(last_us, int(pdf["ts_us"].max()))
        state.update((n, s, last_us))
        yield _pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [round(s, 6)],
                "last_ts_us": [last_us],
            }
        )

    return update_user_state


def user_running_stats(events: DataFrame) -> DataFrame:
    """Running per-user stats over a streaming events frame
    (expects columns user_id, value, and ts as TimestampType)."""
    from pyspark.sql import functions as F

    with_us = events.select(
        "user_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    return with_us.groupBy("user_id").applyInPandasWithState(
        make_update_user_state(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
