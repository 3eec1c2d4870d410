"""Streaming gap-sessionization equals the batch gaps-and-islands
rebuild when the feed is chunked in event order, and replaying chunks
changes nothing (the SCD2 feed contract, applied to sessions)."""

from __future__ import annotations

import datetime

from projet_etl_spark.operators.events_windows import q_events_session
from projet_etl_spark.streaming.sessions import sessionize_stream
from projet_etl_spark.streaming.windows import read_events_stream, run_available_now
from tests.conftest import SF_SMALL
from tests.test_streaming_history import _stage_ordered_chunks


def _fmt(us):
    return datetime.datetime.fromtimestamp(us / 1e6, datetime.UTC).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def _finalize(spark, table: str):
    """Upsert semantics on the append stream: per (user, session_no),
    a closed row is final; otherwise the open session's newest
    emission (largest n_events / end_us — both monotone per session)
    carries the final aggregates."""
    rows = spark.sql(f"SELECT * FROM {table}").collect()
    byk = {}
    for r in rows:
        k = (r.user_id, r.session_no)
        cur = byk.get(k)
        if cur is None or (cur.is_open == 1 and (
            r.is_open == 0 or (r.n_events, r.end_us) > (cur.n_events, cur.end_us)
        )):
            byk[k] = r
    return sorted(
        (u, sn, _fmt(r.start_us), _fmt(r.end_us), r.n_events, round(r.sum_value, 6))
        for (u, sn), r in byk.items()
    )


def _batch_expected(spark):
    return sorted(
        (r.user_id, r.session_no, r.session_start, r.session_end,
         r.n_events, r.sum_value)
        for r in q_events_session(spark, SF_SMALL).collect()
    )


def test_stream_sessions_equal_batch(spark, tmp_path):
    root = str(tmp_path / "sess_stream")
    _stage_ordered_chunks(spark, SF_SMALL, root)
    ev = read_events_stream(spark, root, max_files_per_trigger=1)
    run_available_now(sessionize_stream(ev), "t_sess", "append")
    assert _finalize(spark, "t_sess") == _batch_expected(spark)


def test_stream_sessions_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "sess_stream_replay")
    _stage_ordered_chunks(spark, SF_SMALL, root, replay=True)
    ev = read_events_stream(spark, root, max_files_per_trigger=1)
    run_available_now(sessionize_stream(ev), "t_sess_rp", "append")
    assert _finalize(spark, "t_sess_rp") == _batch_expected(spark)
