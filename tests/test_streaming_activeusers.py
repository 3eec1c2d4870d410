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
