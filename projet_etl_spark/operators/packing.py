"""Greedy sequence packing: assign documents to fixed token-budget
training packs.

Pre-training dataloaders concatenate documents and cut the stream
into fixed-length sequences; a document belongs to the pack where
its first token lands (documents may straddle pack boundaries —
that is the real concat-then-chunk behavior, not a bin-packing
approximation of it). The distributed form shards the corpus by a
portable hash of doc_id and packs within each shard over a
deterministic doc_id order, so the window function is
partition-local (never a single global sort) and the resulting
packing is reproducible run-to-run at any parallelism. At 100 TB the
shard count scales with the cluster; each shard's running sum is one
partition-local cumulative window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_etl_spark.functions.text import portable_hash60, tokens
from projet_etl_spark.sources.tables import load_table

# Registry/oracle fixture shard count. The operator itself takes
# n_shards (defaulting to the cluster's defaultParallelism, so the
# packing parallelism scales with the cluster); the registry entry
# pins this constant so the DuckDB oracle — generated from the same
# constant — stays in lockstep.
N_SHARDS = 8
PACK_BUDGET = 2048  # tokens per training sequence


def q_pack_sequences(
    spark: SparkSession, sf_dir: str, n_shards: int | None = None
) -> DataFrame:
    """(doc_id, shard, n_tokens, start_tok, pack_id): where each doc's
    tokens begin in its shard's concatenated stream and which
    fixed-budget pack that start falls into.

    ``n_shards`` controls the packing parallelism (how many
    independent concatenated streams exist); ``None`` derives it from
    ``sparkContext.defaultParallelism`` so a bigger cluster packs in
    proportionally more, smaller shards. The shard assignment is a
    deterministic hash of doc_id, so the output is reproducible for a
    given shard count — but different shard counts are different
    (equally valid) packings."""
    if n_shards is None:
        n_shards = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        (portable_hash60(F.col("doc_id").cast("string")) % F.lit(int(n_shards))).alias(
            "shard"
        ),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    started = base.withColumn(
        "start_tok", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return started.select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_tok",
        F.expr(f"start_tok div {PACK_BUDGET}").alias("pack_id"),
    )


def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard packing-efficiency report for the concat-then-chunk
    layout at the pinned shard count: documents, stream tokens, packs
    consumed (= ceil(stream / PACK_BUDGET), exact integer arithmetic)
    and the fill percentage — the padding-waste number a dataloader
    team watches, since every point below 100% is paid GPU time. In
    this layout only each shard's final pack can be short, so fill
    approaches 100% as shards grow; a LOW fill flags shards too small
    for the budget (resharding needed), which is precisely the
    100 TB-operations signal.

    Plan: one map pass (token count + shard hash), one |shards|-group
    aggregate of longs — no window, unlike the per-doc manifest; the
    division happens once per output row."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        (
            portable_hash60(F.col("doc_id").cast("string")) % F.lit(N_SHARDS)
        ).alias("shard"),
    )
    per = base.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    n_packs = F.expr(f"(n_tokens + {PACK_BUDGET - 1}) div {PACK_BUDGET}")
    return (
        per.select(
            "shard",
            "n_docs",
            "n_tokens",
            n_packs.cast("long").alias("n_packs"),
        )
        .withColumn(
            "fill_pct",
            F.round(
                (F.col("n_tokens") * F.lit(100)).cast("double")
                / (F.col("n_packs") * F.lit(PACK_BUDGET)).cast("double"),
                6,
            ),
        )
        .orderBy("shard")
    )
