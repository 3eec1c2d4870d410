"""Streaming time-weighted integral equals the batch TWA over an
ordered chunked feed, and replays are no-ops."""

from __future__ import annotations

import pytest

from projet_etl_spark.operators.events_windows import q_events_time_weighted_avg
from projet_etl_spark.streaming.integral import time_weighted_integral_stream
from projet_etl_spark.streaming.windows import read_events_stream, run_available_now
from tests.conftest import SF_SMALL
from tests.test_streaming_history import _stage_ordered_chunks


def _finalize(spark, table: str):
    """Upsert on user_id: keep the row with the highest n_obs (the
    latest running totals)."""
    best = {}
    for r in spark.sql(f"SELECT * FROM {table}").collect():
        if r.user_id not in best or r.n_obs > best[r.user_id].n_obs:
            best[r.user_id] = r
    return best


def _assert_matches_batch(spark, table: str):
    got = _finalize(spark, table)
    want = {r.user_id: r for r in q_events_time_weighted_avg(spark, SF_SMALL).collect()}
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g.n_obs == w.n_obs, uid
        assert g.span_us == w.span_us, uid
        if w.twa is None:
            assert g.span_us == 0
        else:
            # batch sums per-group in arbitrary order, the stream in
            # event order: same doubles, different association
            assert g.weighted_sum / g.span_us == pytest.approx(w.twa, abs=1e-6)


def test_stream_integral_equals_batch(spark, tmp_path):
    root = str(tmp_path / "twa_stream")
    _stage_ordered_chunks(spark, SF_SMALL, root)
    ev = read_events_stream(spark, root, max_files_per_trigger=1)
    run_available_now(time_weighted_integral_stream(ev), "t_twa", "append")
    _assert_matches_batch(spark, "t_twa")


def test_stream_integral_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "twa_stream_rp")
    _stage_ordered_chunks(spark, SF_SMALL, root, replay=True)
    ev = read_events_stream(spark, root, max_files_per_trigger=1)
    run_available_now(time_weighted_integral_stream(ev), "t_twa_rp", "append")
    _assert_matches_batch(spark, "t_twa_rp")
