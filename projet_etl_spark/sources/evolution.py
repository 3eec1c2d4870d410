"""Schema-evolution parquet source: two vintages, one logical table.

A corpus that has been collected for years never has ONE schema —
early shards predate columns that later shards carry (the reference
app never faces this: its SQLite tables are created once and
re-loaded whole, etl_project/api_etl/data.py:5-46). At 100 TB you
cannot rewrite history to add a column; the engine must read the
union of vintages in place:

- **union-by-name, not by position.** ``mergeSchema`` unions parquet
  footers by column NAME; a column absent from an old vintage reads
  as NULL for its rows — never misaligned data.
- **merge cost is footer-sized, not data-sized.** Schema merging
  reconciles file footers at planning time; the scan itself stays
  columnar and pruned. At 100 TB the footers are the only extra I/O.
- **NULL-vintage semantics are the contract.** Downstream queries
  distinguish "legacy row" (evolved column IS NULL) from "measured
  zero" — the registry query counts exactly that, so a driver row
  pins the semantics.

The staged two-vintage copy is written by Spark itself and
fingerprint-keyed on the source parquet (refresh cost, like the
bucketed warehouse / z-order / JSONL layouts).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.sources.tables import load_table

# vintage split: even doc_ids were collected under the early schema
# (no source, no n_chars), odd doc_ids under the current one
EVOLUTION_MOD = 2
V1_COLUMNS = ("doc_id", "text", "lang")


def _evolution_root() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        "schema_evolution",
    )


def ensure_two_vintage_documents(spark: SparkSession, sf_dir: str) -> str:
    """Stage (or reuse) the two-vintage parquet copy of ``documents``
    for ``sf_dir``: v1 shards carry only the early columns, v2 shards
    the full schema. Fingerprint-keyed on the source parquet."""
    from projet_etl_spark.sources.staging import (
        ensure_staged,
        parquet_fingerprint,
    )

    def _build(root: str) -> None:
        data = os.path.join(root, "documents")
        docs = load_table(spark, sf_dir, "documents")
        v1 = docs.filter(F.col("doc_id") % EVOLUTION_MOD == 0).select(*V1_COLUMNS)
        v2 = docs.filter(F.col("doc_id") % EVOLUTION_MOD == 1)
        v1.write.mode("overwrite").parquet(os.path.join(data, "vintage=v1"))
        v2.write.mode("overwrite").parquet(os.path.join(data, "vintage=v2"))

    return ensure_staged(
        _evolution_root(),
        sf_dir,
        parquet_fingerprint(sf_dir, "documents.parquet"),
        "documents",
        _build,
        version=(
            f"evolution-v1:mod={EVOLUTION_MOD}"
            f":v1cols={','.join(V1_COLUMNS)}"
        ),
    )


def read_two_vintage_documents(spark: SparkSession, path: str) -> DataFrame:
    """Union-by-name read across both vintages: ``mergeSchema``
    reconciles the differing footers at planning time; early-vintage
    rows read NULL for the evolved columns."""
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


def q_documents_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language census over the two-vintage corpus: total docs,
    legacy docs (rows whose evolved ``source`` column is NULL because
    their shard predates it), chars summed over rows that carry
    ``n_chars``, and the migrated fraction. NULL-vintage semantics
    are exactly what the oracle pins: a positional (non-by-name)
    merge or a default-filled read would break the counts loudly.

    Scale shape: one columnar scan over both vintages (merge cost is
    footer-sized), map-side-combined aggregate on the language grain;
    NULL-skipping SUM and the legacy count come from the same pass.
    """
    docs = read_two_vintage_documents(
        spark, ensure_two_vintage_documents(spark, sf_dir)
    )
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("source").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_legacy"),
            F.sum("n_chars").cast("long").alias("sum_chars_v2"),
            F.round(
                F.try_divide(
                    F.sum(F.when(F.col("source").isNotNull(), 1).otherwise(0)).cast(
                        "double"
                    ),
                    F.count(F.lit(1)).cast("double"),
                ),
                6,
            ).alias("migrated_frac"),
        )
        .orderBy("lang")
    )
