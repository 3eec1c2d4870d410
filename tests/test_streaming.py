"""Streaming surface: batch/stream parity for windowed aggs, and the
applyInPandasWithState custom stateful operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_etl_spark.operators.events_windows import (
    q_events_sliding_1h_30m,
    q_events_tumbling_1h,
)
from projet_etl_spark.streaming.stateful import user_running_stats
from projet_etl_spark.streaming.windows import (
    read_events_stream,
    run_available_now,
    sliding_counts,
    tumbling_counts,
)
from tests.conftest import SF_SMALL


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def _events_dir(tmp_path):
    """FileStreamSource needs a directory; stage the single parquet
    file behind a symlink dir."""
    import os

    d = tmp_path / "events_stream"
    d.mkdir()
    os.symlink(f"{SF_SMALL}/events.parquet", d / "events.parquet")
    return str(d)


def test_stream_tumbling_equals_batch(spark, tmp_path):
    ev = read_events_stream(spark, _events_dir(tmp_path))
    run_available_now(tumbling_counts(ev), "t_tumbling", "complete")
    got = spark.sql("SELECT * FROM t_tumbling").collect()
    want = q_events_tumbling_1h(spark, SF_SMALL).collect()
    assert _canon(got) == _canon(want)


def test_stream_sliding_equals_batch(spark, tmp_path):
    ev = read_events_stream(spark, _events_dir(tmp_path))
    run_available_now(sliding_counts(ev), "t_sliding", "complete")
    got = spark.sql("SELECT * FROM t_sliding").collect()
    want = q_events_sliding_1h_30m(spark, SF_SMALL).collect()
    assert _canon(got) == _canon(want)


def test_stateful_running_stats(spark, tmp_path):
    ev = read_events_stream(spark, _events_dir(tmp_path))
    run_available_now(user_running_stats(ev), "t_stateful", "update")
    got = {r.user_id: r for r in spark.sql("SELECT * FROM t_stateful").collect()}
    # with a single availableNow drain the running totals must equal
    # the batch per-user aggregates
    from projet_etl_spark.sources.tables import events

    want = {
        r.user_id: r
        for r in events(spark, SF_SMALL)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.max(F.unix_micros("ts")).alias("last_ts_us"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid, g in got.items():
        w = want[uid]
        assert g.n_events == w.n_events, uid
        assert abs(g.sum_value - w.sum_value) < 1e-6, uid
        assert g.last_ts_us == w.last_ts_us, uid


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    from projet_etl_spark.streaming.joins import (
        click_purchase_attribution_stream,
        q_click_purchase_attribution_batch,
    )
    from projet_etl_spark.streaming.windows import run_available_now

    ev = read_events_stream(spark, _events_dir(tmp_path))
    run_available_now(
        click_purchase_attribution_stream(ev), "t_attrib", "append"
    )
    got = spark.sql("SELECT * FROM t_attrib").collect()
    want = q_click_purchase_attribution_batch(spark, SF_SMALL).collect()
    # append-mode stream-stream join emits matches as both sides pass
    # the watermark; with availableNow draining everything in one go,
    # all matched pairs are emitted
    assert _canon(got) == _canon(want)


def test_stream_ohlc_equals_batch(spark, tmp_path):
    from projet_etl_spark.operators.events_windows import q_events_ohlc_hourly
    from projet_etl_spark.streaming.windows import hourly_ohlc

    ev = read_events_stream(spark, _events_dir(tmp_path))
    run_available_now(hourly_ohlc(ev), "t_ohlc", "complete")
    got = spark.sql("SELECT * FROM t_ohlc").collect()
    want = q_events_ohlc_hourly(spark, SF_SMALL).collect()
    # schema parity modulo count type (streaming count stays long in
    # both); values must agree bar-for-bar including tie-broken
    # open/close
    assert _canon([tuple(r) for r in got]) == _canon([tuple(r) for r in want])
