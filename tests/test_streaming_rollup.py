"""Continuous rollup maintenance: the streamed rollup must equal the
batch rollup over the same facts (batch/stream parity), and the
foreachBatch upsert must refresh only touched month partitions."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from projet_etl_spark.streaming.rollup import (
    read_pdv_stream,
    rollup_counts,
    upsert_rollup_batch,
)


def _facts(spark, rows):
    return spark.createDataFrame(
        [
            (datetime.date.fromisoformat(d), p, c, f, m)
            for d, p, c, f, m in rows
        ],
        "dateid date, prodid long, catid long, fabid long, magid long",
    )


_BATCH1 = [
    ("2022-01-03", 1, 1, 1, 7),
    ("2022-01-03", 1, 1, 1, 7),  # duplicate grain row -> n_ventes 2
    ("2022-01-20", 2, 1, 2, 8),
    ("2022-02-05", 1, 1, 1, 7),
]
_BATCH2 = [
    ("2022-01-28", 1, 1, 1, 7),  # touches an existing January grain
    ("2022-03-14", 3, 2, 1, 9),  # opens a new month
]


def test_stream_rollup_equals_batch(spark, tmp_path):
    src = str(tmp_path / "pdv_in")
    _facts(spark, _BATCH1).coalesce(1).write.mode("append").parquet(src)
    import time

    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    _facts(spark, _BATCH2).coalesce(1).write.mode("append").parquet(src)

    stream = rollup_counts(read_pdv_stream(spark, src, max_files_per_trigger=1))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_rollup_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM t_rollup_stream").collect())
    want = sorted(
        tuple(r)
        for r in rollup_counts(_facts(spark, _BATCH1 + _BATCH2)).collect()
    )
    assert got == want
    # the duplicated January grain really accumulated across batches
    jan = [r for r in got if r[4] == "2022-01" and r[3] == 7]
    assert jan and jan[0][5] == 3


def test_foreachbatch_upsert_stream_with_restart(spark, tmp_path):
    """The deployment shape: update-mode rollup stream draining
    through the foreachBatch merge-upsert with a checkpoint. The
    final table must equal the batch rollup, per-month partitions of
    unchanged grains must survive partial updates, and a restart with
    no new input must change nothing."""
    import time

    src = str(tmp_path / "pdv_stream_in")
    out = str(tmp_path / "rollup_out")
    ckpt = str(tmp_path / "rollup_ckpt")
    _facts(spark, _BATCH1).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    _facts(spark, _BATCH2).coalesce(1).write.mode("append").parquet(src)

    def drain():
        q = (
            rollup_counts(read_pdv_stream(spark, src, max_files_per_trigger=1))
            .writeStream.foreachBatch(
                lambda df, _epoch: upsert_rollup_batch(df, out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(
        tuple(r)
        for r in rollup_counts(_facts(spark, _BATCH1 + _BATCH2))
        # parquet partitioning reads mois back as the last column
        .select("catid", "fabid", "prodid", "magid", "n_ventes", "mois")
        .collect()
    )
    assert got == want

    # restart on the same checkpoint with no new files: no change
    drain()
    assert sorted(tuple(r) for r in spark.read.parquet(out).collect()) == got


def test_upsert_refreshes_only_touched_months(spark, tmp_path):
    out = str(tmp_path / "rollup_tbl")
    upsert_rollup_batch(rollup_counts(_facts(spark, _BATCH1)), out)
    before = {
        (r.mois, r.prodid): r.n_ventes for r in spark.read.parquet(out).collect()
    }
    assert before[("2022-02", 1)] == 1

    # second refresh carries recomputed January + new March, no February:
    # dynamic partition overwrite must replace Jan, add Mar, keep Feb
    refreshed = rollup_counts(
        _facts(spark, [r for r in _BATCH1 if r[0].startswith("2022-01")] + _BATCH2)
    )
    upsert_rollup_batch(refreshed, out)
    after = spark.read.parquet(out)
    assert after.filter(F.col("mois") == "2022-02").count() == 1  # untouched
    assert after.filter(F.col("mois") == "2022-03").count() == 1  # added
    jan = {
        (r.prodid, r.magid): r.n_ventes
        for r in after.filter(F.col("mois") == "2022-01").collect()
    }
    assert jan[(1, 7)] == 3  # replaced with the recomputed count


def test_upsert_does_not_leak_dynamic_overwrite(spark, tmp_path):
    """upsert_rollup_batch scopes partitionOverwriteMode to its own
    writer (ADVICE r3): a later partitioned overwrite in the same
    session must keep full-replace (static) semantics — months absent
    from the rewrite disappear instead of lingering as stale
    partitions."""
    out = str(tmp_path / "rollup_tbl")
    upsert_rollup_batch(rollup_counts(_facts(spark, _BATCH1)), out)
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower()
        == "static"
    ), "session conf mutated by upsert_rollup_batch"

    tbl = str(tmp_path / "replace_tbl")
    jan_feb = rollup_counts(_facts(spark, _BATCH1))
    jan_feb.write.mode("overwrite").partitionBy("mois").parquet(tbl)
    assert spark.read.parquet(tbl).filter(F.col("mois") == "2022-02").count() > 0
    # re-ingest with only March: January AND February must be GONE
    mar = rollup_counts(_facts(spark, [_BATCH2[1]]))
    mar.write.mode("overwrite").partitionBy("mois").parquet(tbl)
    months = {r.mois for r in spark.read.parquet(tbl).select("mois").collect()}
    assert months == {"2022-03"}, months
