"""Exactly-once file sink: restart from checkpoint consumes only new
input; no duplicates across restarts."""

from __future__ import annotations

import os

from projet_etl_spark.streaming.sink import write_stream_parquet
from projet_etl_spark.streaming.windows import read_events_stream
from tests.conftest import SF_SMALL


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.symlink(f"{SF_SMALL}/events.parquet", src / "batch1.parquet")

    # first drain: 1000 events land
    ev = read_events_stream(spark, str(src)).select("event_id", "ts", "user_id")
    write_stream_parquet(ev, out, ckpt)
    assert spark.read.parquet(out).count() == 1000

    # restart with NO new input: nothing re-emitted
    ev = read_events_stream(spark, str(src)).select("event_id", "ts", "user_id")
    write_stream_parquet(ev, out, ckpt)
    assert spark.read.parquet(out).count() == 1000

    # add a second batch (same file staged under a new name = all
    # duplicate event_ids, but the SOURCE offset tracking is what's
    # under test): only the new file is consumed
    os.symlink(f"{SF_SMALL}/events.parquet", src / "batch2.parquet")
    ev = read_events_stream(spark, str(src)).select("event_id", "ts", "user_id")
    write_stream_parquet(ev, out, ckpt)
    assert spark.read.parquet(out).count() == 2000
