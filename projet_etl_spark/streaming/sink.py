"""Checkpointed streaming sinks.

The file sink + checkpoint pair is Spark's exactly-once delivery
story: the sink's transaction log records committed files per batch,
the checkpoint records consumed offsets — restarting the same query
resumes from the last committed batch, never re-emitting rows. At
100 TB this is the only sane default for a pipeline landing zone
(every other sink needs idempotent writers downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_stream_parquet(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_path: str,
):
    """Drain all available input into a parquet landing zone with
    exactly-once semantics; returns the finished query. Re-invoking
    with the same checkpoint resumes incrementally."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
