"""Continuous rollup maintenance — the streaming twin of
operators/materialized.monthly_rollup (the "hypertable rollup"
pattern: a time-bucketed continuous aggregate kept current as facts
arrive, instead of nightly full rebuilds).

The aggregation keys the FULL rollup grain (catid, fabid, prodid,
magid, month-of-dateid) and counts rows, exactly like the batch
rollup; each micro-batch folds new facts into grain state and emits
the affected grains. State size equals the rollup itself — which is
the product being maintained, so it is the honest lower bound; at
100 TB the state store is partitioned by the grouping key like any
shuffle.

Sinks: the parity test drains complete mode to memory; a deployment
uses foreachBatch upsert (``upsert_rollup_batch``) so each
micro-batch becomes a partition-overwrite of only the touched
months — the refresh story docs/SCALE.md describes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.functions.dates import month_key
from projet_etl_spark.schemas import POINTS_DE_VENTE_SCHEMA


def read_pdv_stream(spark: SparkSession, path: str,
                    max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of native points_de_vente parquet (the
    layout the ingest CLI writes, unpartitioned form)."""
    reader = spark.readStream.schema(POINTS_DE_VENTE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def rollup_counts(facts: DataFrame) -> DataFrame:
    """The streaming form of the batch monthly rollup: same grain,
    same additive measure."""
    return facts.groupBy(
        "catid",
        "fabid",
        "prodid",
        "magid",
        month_key(F.col("dateid")).alias("mois"),
    ).agg(F.count(F.lit(1)).alias("n_ventes"))


GRAIN = ("catid", "fabid", "prodid", "magid", "mois")


def upsert_rollup_batch(batch_df: DataFrame, out_path: str) -> None:
    """foreachBatch body: merge updated grains into the rollup table,
    rewriting only the month partitions this micro-batch touched
    (dynamic partition overwrite) — the per-month refresh unit of a
    100 TB rollup table.

    An update-mode aggregation emits only the grains a batch CHANGED,
    so a naive partition overwrite would drop that month's unchanged
    grains; the merge keeps existing rows the update doesn't replace
    and overwrites the rest. The batch must be materialized before
    the overwrite (it reads the table it rewrites); the touched-month
    list is a driver-side collect bounded by months-per-batch, the
    standard partition-management pattern."""
    import os

    from pyspark.sql import functions as F

    spark = batch_df.sparkSession
    batch_df = batch_df.localCheckpoint()  # cut the self-read dependency
    months = [r.mois for r in batch_df.select("mois").distinct().collect()]
    if not months:
        return
    out = batch_df
    if os.path.exists(out_path):
        existing = spark.read.parquet(out_path).filter(F.col("mois").isin(months))
        kept = existing.join(
            batch_df.select(*GRAIN), list(GRAIN), "left_anti"
        ).localCheckpoint()
        out = kept.unionByName(batch_df)
    # per-writer option, NOT a session conf: a session-wide "dynamic"
    # would silently turn later full-replace writes (e.g. ingest
    # write_table re-runs, which rely on static overwrite semantics)
    # into partial partition merges that keep stale months around
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("mois")
        .parquet(out_path)
    )
