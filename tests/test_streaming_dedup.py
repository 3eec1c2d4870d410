"""Streaming exact-dedup: duplicate events injected into the stream
are dropped; output matches the batch distinct set."""

from __future__ import annotations

from projet_etl_spark.streaming.dedup import dedup_events
from projet_etl_spark.streaming.windows import read_events_stream, run_available_now
from tests.conftest import SF_SMALL


def test_stream_dedup_drops_duplicates(spark, tmp_path):
    import os

    # stage the same file TWICE -> every event is duplicated
    d = tmp_path / "dup_stream"
    d.mkdir()
    os.symlink(f"{SF_SMALL}/events.parquet", d / "a.parquet")
    os.symlink(f"{SF_SMALL}/events.parquet", d / "b.parquet")

    ev = read_events_stream(spark, str(d))
    run_available_now(
        dedup_events(ev).select("event_id"), "t_dedup", "append"
    )
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM t_dedup").collect()[0]
    base = spark.read.parquet(f"{SF_SMALL}/events.parquet").count()
    assert got.n == base  # doubled input, deduped output
    assert got.d == base
