"""Streaming sessionization: the stateful twin of
operators/events_windows.q_events_session.

Per-user state = the OPEN session (its number, start, last-event
time, count, value sum) plus a (last_ts, last_event_id) high-water
mark. Each micro-batch processes the user's new events in
(ts, event_id) order: an inter-event gap > SESSION_GAP_MIN CLOSES
the open session (emitted with its final aggregates) and opens the
next; the open session is (re-)emitted every batch the user appears
in, so a downstream upsert keyed on (user_id, session_no) with
last-batch-wins always converges to the batch operator's output —
closed rows are immutable once emitted, and the last re-emission of
an open session carries its final aggregates.

At-least-once safety: redelivered events sit at or below the
(ts, event_id) high-water mark and are skipped; replaying a batch
reproduces its emissions from the checkpoint-rolled-back state, so
per-batch dynamic partition overwrite is idempotent.

Ordering contract (same as streaming/history.py): correctness vs
the batch rebuild assumes the feed does not deliver a user's events
out of (ts, event_id) order ACROSS micro-batches — in-batch
disorder is sorted away, cross-batch late events are dropped at the
high-water mark. That is the standard streaming-sessionization
tradeoff; the alternative is session rewrite.

Scale notes: state is one tiny tuple per user in the state store,
shuffled on user_id exactly like the batch window pass; there is no
timeout because the upsert sink already folds re-emissions (a
production pipeline serving ONLY closed sessions would add an
EventTimeTimeout to flush idle users and drop their state). Arrow
batches amortize the Python boundary (applyInPandasWithState).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from projet_etl_spark.operators.events_windows import SESSION_GAP_MIN

GAP_US = SESSION_GAP_MIN * 60 * 1_000_000

OUTPUT_SCHEMA = (
    "user_id long, session_no long, start_us long, end_us long, "
    "n_events long, sum_value double, is_open long"
)
STATE_SCHEMA = (
    "sess_no long, start_us long, end_us long, n long, s double, "
    "last_us long, last_eid long"
)


def make_update_sessions():
    """Closure so cloudpickle ships the function by value — executors
    of an external driver don't have this package on sys.path. The
    gap is captured as a plain int at closure creation."""
    gap_us = GAP_US

    def update_sessions(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        (user_id,) = key
        if state.exists:
            sess_no, start_us, end_us, n, s, last_us, last_eid = state.get
        else:
            sess_no, start_us, end_us, n, s, last_us, last_eid = (
                -1, 0, 0, 0, 0.0, -1, -1,
            )

        batch = _pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")

        closed: list[tuple] = []
        for ts_us, eid, val in zip(
            batch["ts_us"].astype("int64"),
            batch["event_id"].astype("int64"),
            batch["value"].astype("float64"),
        ):
            if (ts_us, eid) <= (last_us, last_eid):
                continue  # redelivery at/below the high-water mark
            if sess_no < 0:
                sess_no, start_us, end_us, n, s = 0, int(ts_us), int(ts_us), 1, float(val)
            elif ts_us - end_us > gap_us:
                closed.append(
                    (user_id, sess_no, start_us, end_us, n, round(s, 6), 0)
                )
                sess_no, start_us, end_us, n, s = (
                    sess_no + 1, int(ts_us), int(ts_us), 1, float(val),
                )
            else:
                end_us, n, s = int(ts_us), n + 1, s + float(val)
            last_us, last_eid = int(ts_us), int(eid)

        state.update((sess_no, start_us, end_us, n, s, last_us, last_eid))
        rows = closed
        if sess_no >= 0:
            rows = closed + [
                (user_id, sess_no, start_us, end_us, n, round(s, 6), 1)
            ]
        yield _pd.DataFrame(
            rows,
            columns=[
                "user_id", "session_no", "start_us", "end_us",
                "n_events", "sum_value", "is_open",
            ],
        )

    return update_sessions


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Streaming gap-sessionization over an events feed (expects
    TimestampType ``ts``): emits closed sessions as they close plus
    the open session per touched user each batch; upsert on
    (user_id, session_no), last batch wins."""
    prepared = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        "value",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        make_update_sessions(),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
