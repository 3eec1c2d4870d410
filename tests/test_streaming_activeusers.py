"""Streaming DAU: dedup-then-count equals the batch distinct count,
even when the feed delivers every event twice."""

from __future__ import annotations

import os

from projet_etl_spark.operators.events_windows import q_rolling_active_users
from projet_etl_spark.streaming.activeusers import daily_active_users
from projet_etl_spark.streaming.windows import read_events_stream, run_available_now
from tests.conftest import SF_SMALL


def test_stream_dau_equals_batch_despite_duplicates(spark, tmp_path):
    # stage the events file TWICE: at-least-once delivery of every row
    d = tmp_path / "dau_stream"
    d.mkdir()
    os.symlink(f"{SF_SMALL}/events.parquet", d / "a.parquet")
    os.symlink(f"{SF_SMALL}/events.parquet", d / "b.parquet")

    ev = read_events_stream(spark, str(d))
    run_available_now(daily_active_users(ev), "t_dau", "complete")
    got = sorted(
        (r.day, r.dau) for r in spark.sql("SELECT * FROM t_dau").collect()
    )
    want = sorted(
        (r.day, r.dau)
        for r in q_rolling_active_users(spark, SF_SMALL).collect()
    )
    assert got == want


def test_stream_new_users_equals_batch_despite_duplicates(spark, tmp_path):
    """cumulative_new_users over a time-ordered, twice-delivered feed
    equals q_users_cumulative's per-day new_users; the cumulative sum
    is the documented days-sized batch step over the sink."""
    from projet_etl_spark.operators.events_windows import q_users_cumulative
    from projet_etl_spark.streaming.activeusers import cumulative_new_users
    from tests.test_streaming_history import _stage_ordered_chunks

    root = str(tmp_path / "newusers_stream")
    _stage_ordered_chunks(spark, SF_SMALL, root, replay=True)
    ev = read_events_stream(spark, root, max_files_per_trigger=1)
    run_available_now(cumulative_new_users(ev), "t_newusers", "complete")
    got = sorted(
        (r.day, r.new_users)
        for r in spark.sql("SELECT * FROM t_newusers").collect()
    )
    want_rows = q_users_cumulative(spark, SF_SMALL).collect()
    want = sorted((r.day, r.new_users) for r in want_rows)
    assert got == want
    # the cumulative step over the sink reproduces users_to_date
    acc, cum = 0, {}
    for d, n in got:
        acc += n
        cum[d] = acc
    assert cum == {r.day: r.users_to_date for r in want_rows}
