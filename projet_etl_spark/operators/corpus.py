"""End-to-end corpus curation: the composed training-data pipeline.

quality-filter → exact-dedup (keep lowest doc_id per fingerprint) →
per-language corpus stats, as ONE lazy plan — the shape a 100 TB
pretraining-data build runs nightly: a map-only scoring pass, one
shuffle on the high-entropy fingerprint for dedup, one tiny shuffle
on language for the rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_etl_spark.functions.text import fingerprint, tokens
from projet_etl_spark.operators.textstats import STOPWORDS, _count_in
from projet_etl_spark.sources.tables import load_table

QUALITY_CUTOFF = 0.45


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated per-language corpus stats after quality filter + dedup."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        "lang",
        fingerprint(F.col("text")).alias("fp"),
        tokens(F.col("text")).alias("t"),
        F.length("text").alias("n_chars_obs"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), "[.,;:!?]", ""))
        ).alias("n_punct"),
    )
    scored = staged.select(
        "doc_id",
        "lang",
        "fp",
        F.size("t").cast("long").alias("n_tokens"),
        (
            F.least(F.size("t") / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
            + (_count_in(F.col("t"), STOPWORDS["en"]) / F.size("t")) * F.lit(0.4)
            + (
                F.lit(1.0)
                - F.least(
                    (F.col("n_punct") / F.col("n_chars_obs")) * F.lit(10.0),
                    F.lit(1.0),
                )
            )
            * F.lit(0.2)
        ).alias("quality"),
    ).filter(F.col("quality") >= F.lit(QUALITY_CUTOFF))
    keep = (
        scored.withColumn(
            "rn", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        keep.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        .orderBy("lang")
    )
