"""Watermark semantics, as Spark actually guarantees them: once the
watermark passes a window's end and the window is emitted (append
mode), later rows for that window are dropped — the closed window is
never re-emitted or double-counted.

(Observed during development: a late row whose window was never in
state MAY still be admitted if the window end is within the current
batch's eviction pass — Spark's drop guarantee is tied to emitted
state, not a pure timestamp comparison. The test pins the guarantee
that matters for correctness: no duplicate/updated emission.)
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from projet_etl_spark.streaming.windows import (
    read_events_stream,
    sliding_counts,
    tumbling_counts,
)


def _write_batch(spark, path, rows):
    """rows stored with ts as int64 NANOS — the events wire format."""
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_str string, user_id long, event_type string, value double",
    ).select(
        "event_id",
        (F.unix_micros(F.to_timestamp("ts_str")) * 1000).alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_closed_window_never_reemitted(spark, tmp_path):
    src = str(tmp_path / "wm_in")
    # file 1: ten on-time events in the 10:00 hour
    _write_batch(
        spark,
        src,
        [(i, f"2024-01-01 10:0{i % 6}:00", 1, "click", 1.0) for i in range(10)],
    )
    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    # file 2: 12:00 event pushes the watermark to 11:30, closing and
    # emitting the 10:00 window
    _write_batch(spark, src, [(100, "2024-01-01 12:00:00", 1, "click", 1.0)])
    time.sleep(1.1)
    # file 3: a LATE 10:30 event aimed at the closing window
    _write_batch(spark, src, [(101, "2024-01-01 10:30:00", 1, "click", 1.0)])
    time.sleep(1.1)
    # file 4: another late event AFTER the window's state is evicted
    _write_batch(spark, src, [(102, "2024-01-01 10:40:00", 1, "click", 1.0)])

    ev = read_events_stream(spark, src, max_files_per_trigger=1)
    q = (
        tumbling_counts(ev, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("t_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT * FROM t_wm WHERE window_start = '2024-01-01 10:00:00'"
    ).collect()
    # THE append-mode guarantee: the window is emitted exactly once —
    # a late row arriving after eviction can neither re-emit nor
    # update it. (Spark 4.1 leniently ADMITS late rows that arrive in
    # the same batch that closes the window — n_events may be 10 or
    # 11 — but never produces a second emission.)
    assert len(rows) == 1
    assert rows[0].n_events in (10, 11)
    # and the open 12:00 window was never emitted
    assert (
        spark.sql(
            "SELECT count(*) c FROM t_wm WHERE window_start = '2024-01-01 12:00:00'"
        ).collect()[0].c
        == 0
    )


def test_sliding_window_drops_late_rows(spark, tmp_path):
    """Sliding-window twin of the drop guarantee: every on-time window
    is emitted exactly once, and a late row arriving after its windows
    closed can neither re-emit them nor resurrect a never-emitted
    window."""
    src = str(tmp_path / "slide_in")
    # file 1: six on-time events 10:00-10:05 -> sliding windows
    # starting 09:30 and 10:00
    _write_batch(
        spark,
        src,
        [(i, f"2024-01-01 10:0{i % 6}:00", 1, "click", 1.0) for i in range(6)],
    )
    time.sleep(1.1)
    # file 2: 13:00 event pushes the watermark to 12:30, past both
    # on-time windows' ends
    _write_batch(spark, src, [(100, "2024-01-01 13:00:00", 1, "click", 1.0)])
    time.sleep(1.1)
    # file 3: late 10:10 row aimed at the closing windows
    _write_batch(spark, src, [(101, "2024-01-01 10:10:00", 1, "click", 1.0)])
    time.sleep(1.1)
    # file 4: late 10:40 row whose [10:30, 11:30) window was never in
    # state — with the watermark at 12:30 it must be dropped outright,
    # not resurrect a closed window
    _write_batch(spark, src, [(102, "2024-01-01 10:40:00", 1, "click", 1.0)])

    ev = read_events_stream(spark, src, max_files_per_trigger=1)
    q = (
        sliding_counts(ev, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("t_slide_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = {
        r.window_start: r.n_events
        for r in spark.sql("SELECT * FROM t_slide_wm").collect()
    }
    counts = spark.sql(
        "SELECT window_start, count(*) c FROM t_slide_wm GROUP BY 1"
    ).collect()
    assert all(r.c == 1 for r in counts), counts  # exactly-once emission
    # both on-time windows emitted; same-batch lenient admission may
    # add the file-3 row (see module docstring) but never re-emits
    assert emitted.get("2024-01-01 09:30:00") in (6, 7)
    assert emitted.get("2024-01-01 10:00:00") in (6, 7)
    # the post-eviction late row resurrected nothing
    assert "2024-01-01 10:30:00" not in emitted
    # the watermark never passed the 13:00 event's window ends
    assert "2024-01-01 12:30:00" not in emitted
    assert "2024-01-01 13:00:00" not in emitted


def test_interval_join_state_is_bounded(spark, tmp_path):
    """Stream-stream interval join: watermark + interval condition
    must EVICT expired click/purchase state — state size tracks the
    active window, not total input (the condition that makes an
    unbounded join feasible)."""
    from projet_etl_spark.streaming.joins import click_purchase_attribution_stream

    src = str(tmp_path / "join_in")
    # three bursts six hours apart; each burst is 10 clicks + 5
    # purchases within the 30-minute attribution interval
    for b, hour in enumerate((0, 6, 12)):
        rows = [
            (b * 100 + i, f"2024-01-02 {hour:02d}:00:00", b * 10 + i, "click", 1.0)
            for i in range(10)
        ] + [
            (b * 100 + 50 + i, f"2024-01-02 {hour:02d}:10:00", b * 10 + i, "purchase", 5.0)
            for i in range(5)
        ]
        _write_batch(spark, src, rows)
        time.sleep(1.1)

    ev = read_events_stream(spark, src, max_files_per_trigger=1)
    q = (
        click_purchase_attribution_stream(ev, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_join_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # every burst's purchases matched their own click (15 matches)
    assert spark.sql("SELECT count(*) c FROM t_join_state").collect()[0].c == 15

    state = [
        op
        for p in q.recentProgress
        for op in (p["stateOperators"] if isinstance(p, dict) else [])
    ]
    assert state, "expected stateOperators progress metrics"
    removed = sum(op.get("numRowsRemoved", 0) for op in state)
    final_total = state[-1]["numRowsTotal"]
    # eviction actually ran, and the surviving state is (at most) the
    # last burst plus the not-yet-expired tail — far below the 45
    # rows ingested
    assert removed > 0, state
    assert final_total < 45, state
