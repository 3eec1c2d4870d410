"""JSON-Lines source: the text interchange format a corpus pipeline
actually receives (web-crawl dumps, API exports, labeling-tool
output land as .jsonl, not parquet).

Scale discipline for JSON at 100 TB:

- **Explicit schema, never inference.** ``spark.read.json`` without
  a schema runs a full extra pass over the data just to guess types
  (and guesses a union of everything it saw). The reader here takes
  the engine's pinned StructType, so the scan is one pass and the
  types are the contract, not a sample artifact.
- **Malformed lines are counted, not dropped.** PERMISSIVE mode with
  ``columnNameOfCorruptRecord`` routes broken lines into a side
  column instead of silently vanishing rows (the events-props-parse
  discipline, applied at the source boundary).
- **JSONL is the interchange layer, parquet the performance layer.**
  JSON can't column-prune or push filters into the decode; the
  ingest contract is read-once -> land as parquet/bucketed/z-ordered
  layouts. The registry query proves the JSONL path is
  layout-invariant: same rows, same aggregates as the parquet scan.

The staged copy is written by Spark itself (``df.write.json`` —
distributed, one shard per partition, newlines in text JSON-escaped)
and is fingerprint-keyed on the source parquet: staging is refresh
cost, exactly like the bucketed warehouse / z-order / stream stores.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from projet_etl_spark.sources.tables import load_table

# pinned reader schema for the documents feed — the contract, not an
# inference artifact (column order matches the parquet layout)
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)

JSONL_SHARDS = 8


def _jsonl_root() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        "jsonl",
    )


def ensure_documents_jsonl(spark: SparkSession, sf_dir: str) -> str:
    """Stage (or reuse) the JSONL copy of ``documents`` for
    ``sf_dir``, fingerprint-keyed on the source parquet."""
    from projet_etl_spark.sources.staging import (
        ensure_staged,
        parquet_fingerprint,
    )

    def _build(root: str) -> None:
        (
            load_table(spark, sf_dir, "documents")
            .repartition(JSONL_SHARDS)
            .write.mode("overwrite")
            .json(os.path.join(root, "documents"))
        )

    return ensure_staged(
        _jsonl_root(),
        sf_dir,
        parquet_fingerprint(sf_dir, "documents.parquet"),
        "documents",
        _build,
        version=f"jsonl-v1:shards={JSONL_SHARDS}",
    )


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """One-pass JSONL read under the pinned schema; malformed lines
    land in ``_corrupt`` instead of disappearing."""
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def q_documents_jsonl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition (docs + chars per language x source) read
    off the staged JSONL copy of ``documents``. Source-format
    invariance: the JSONL round-trip must change NOTHING about the
    rows, so the query shares the plain parquet scan's oracle — a
    green driver row proves the text-interchange ingest path end to
    end (explicit schema, corrupt-line accounting, exact long
    arithmetic). Malformed lines would surface as a non-null
    ``_corrupt`` group and break the row-count match loudly."""
    docs = read_documents_jsonl(spark, ensure_documents_jsonl(spark, sf_dir))
    good = docs.filter(F.col("_corrupt").isNull())
    return (
        good.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )
