"""Streaming SCD2 equals the batch history rebuild when the feed is
chunked in event order, and replaying chunks changes nothing."""

from __future__ import annotations

import datetime
import os
import time

from pyspark.sql import functions as F

from projet_etl_spark.operators.events_windows import q_user_state_history
from projet_etl_spark.streaming.history import user_state_history_stream
from projet_etl_spark.streaming.windows import read_events_stream, run_available_now
from tests.conftest import SF_SMALL

N_CHUNKS = 3


def _stage_ordered_chunks(spark, src_sf: str, root, *, replay: bool = False) -> None:
    """Split the events table into N_CHUNKS files along the global
    (ts, event_id) order — row-boundary splits, so a (user, ts) tie
    never straddles chunks out of event_id order — and stamp strictly
    increasing mtimes so the file source triggers them in sequence.
    ``replay`` re-delivers every chunk once (at-least-once feed)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    table = pq.read_table(f"{src_sf}/events.parquet")
    order = pc.sort_indices(
        table, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
    )
    table = table.take(order)
    n = table.num_rows
    os.makedirs(root, exist_ok=True)
    copies = []
    for k in range(N_CHUNKS):
        lo, hi = k * n // N_CHUNKS, (k + 1) * n // N_CHUNKS
        chunk = table.slice(lo, hi - lo)
        path = f"{root}/chunk{k:02d}.parquet"
        pq.write_table(chunk, path)
        copies.append(path)
        if replay:
            replay_path = f"{root}/chunk{k:02d}_replay.parquet"
            pq.write_table(chunk, replay_path)
            copies.append(replay_path)
    # file source orders new files by modification time: force the
    # chunk sequence (replays land directly after their original)
    base = time.time()
    for i, path in enumerate(copies):
        os.utime(path, (base + i, base + i))


def _fmt(us):
    if us is None:
        return None
    return datetime.datetime.fromtimestamp(us / 1e6, datetime.UTC).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def _finalize(spark, table: str):
    """Upsert semantics on the append stream: per (user, version), a
    closed row supersedes the open emissions."""
    rows = spark.sql(f"SELECT * FROM {table}").collect()
    byv = {}
    for r in rows:
        k = (r.user_id, r.version_no)
        if k not in byv or r.to_us is not None:
            byv[k] = r
    return sorted(
        (u, r.state, v, _fmt(r.from_us), _fmt(r.to_us), r.is_current)
        for (u, v), r in byv.items()
    )


def _batch_expected(spark):
    return sorted(
        (r.user_id, r.state, r.version_no, r.valid_from, r.valid_to, r.is_current)
        for r in q_user_state_history(spark, SF_SMALL).collect()
    )


def test_stream_scd2_equals_batch(spark, tmp_path):
    root = str(tmp_path / "hist_stream")
    _stage_ordered_chunks(spark, SF_SMALL, root)
    ev = read_events_stream(spark, root, max_files_per_trigger=1)
    run_available_now(user_state_history_stream(ev), "t_hist", "append")
    assert _finalize(spark, "t_hist") == _batch_expected(spark)


def test_stream_scd2_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "hist_stream_replay")
    _stage_ordered_chunks(spark, SF_SMALL, root, replay=True)
    ev = read_events_stream(spark, root, max_files_per_trigger=1)
    run_available_now(user_state_history_stream(ev), "t_hist_rp", "append")
    assert _finalize(spark, "t_hist_rp") == _batch_expected(spark)
