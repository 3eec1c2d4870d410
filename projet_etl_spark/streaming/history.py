"""Streaming SCD type-2 maintenance: the streaming twin of
operators/events_windows.q_user_state_history.

Per-user state = the OPEN version (current state, its start, the
version counter) plus a (last_ts, last_event_id) high-water mark.
Each micro-batch processes the user's new events in (ts, event_id)
order: a state change CLOSES the open version (emitted with its
validity interval) and opens the next; the open version is
(re-)emitted every batch the user appears in, so a downstream
upsert keyed on (user_id, version_no) always converges to the batch
operator's output — closed rows are immutable once emitted.

At-least-once safety: redelivered events sit at or below the
(ts, event_id) high-water mark and are skipped, so replaying a batch
is a no-op — the emitted closed set is append-only and duplicate
open-row emissions collapse in the upsert.

Scale notes: state is one tiny tuple per user in the state store,
shuffled on user_id exactly like the batch window; there is no
timeout because SCD2 state IS the live dimension row (bound =
|users|, the same bound as the dimension table being maintained).
Arrow batches amortize the Python boundary (applyInPandasWithState).

Ordering contract: like any streaming CDC consumer, correctness vs
the batch rebuild assumes the feed does not deliver a user's events
out of (ts, event_id) order ACROSS micro-batches (in-batch disorder
is sorted away; cross-batch late events are dropped at the
high-water mark — the standard "late upstream change" tradeoff,
where the alternative is history rewrite).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, state string, version_no long, "
    "from_us long, to_us long, is_current long"
)
STATE_SCHEMA = (
    "cur_state string, cur_from_us long, version_no long, "
    "last_us long, last_eid long"
)


def make_update_history():
    """Closure so cloudpickle ships the function by value."""

    def update_history(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        (user_id,) = key
        if state.exists:
            cur_state, cur_from, ver, last_us, last_eid = state.get
        else:
            cur_state, cur_from, ver, last_us, last_eid = None, 0, 0, -1, -1

        batch = _pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")

        closed: list[tuple] = []
        for ts_us, eid, etype in zip(
            batch["ts_us"].astype("int64"),
            batch["event_id"].astype("int64"),
            batch["event_type"],
        ):
            if (ts_us, eid) <= (last_us, last_eid):
                continue  # redelivery at/below the high-water mark
            if cur_state is None:
                cur_state, cur_from, ver = etype, int(ts_us), 1
            elif etype != cur_state:
                closed.append((user_id, cur_state, ver, cur_from, int(ts_us), 0))
                cur_state, cur_from, ver = etype, int(ts_us), ver + 1
            last_us, last_eid = int(ts_us), int(eid)

        state.update((cur_state, cur_from, ver, last_us, last_eid))
        rows = closed
        if cur_state is not None:
            rows = closed + [(user_id, cur_state, ver, cur_from, None, 1)]
        out = _pd.DataFrame(
            rows,
            columns=["user_id", "state", "version_no", "from_us", "to_us", "is_current"],
        )
        out["to_us"] = out["to_us"].astype("Int64")
        yield out

    return update_history


def user_state_history_stream(events: DataFrame) -> DataFrame:
    """Streaming SCD2 over an events feed (expects TimestampType
    ``ts``): emits closed versions as they close plus the open
    version per touched user each batch; upsert on
    (user_id, version_no), last write wins."""
    prepared = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        "event_type",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        make_update_history(),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
