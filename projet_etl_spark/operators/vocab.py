"""Tokenizer-adjacent corpus operators: vocabulary building and
per-language temperature resampling.

- ``vocab-top100``: token vocabulary ranked by document frequency —
  the first pass of any tokenizer training run. One explode + two
  hash aggregations; at 100 TB the (token) shuffle key is
  high-entropy so no skew handling is needed.
- ``resample-by-lang``: temperature-flattened language mix. Each
  language keeps a deterministic hash-bucket share proportional to
  count^(1/T - 1) normalized to the largest language — the standard
  multilingual rebalancing — with the keep-decision made by portable
  md5 bucket, so the sample is reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_etl_spark.functions.text import portable_hash60, tokens
from projet_etl_spark.sources.tables import load_table

VOCAB_K = 100
TEMPERATURE = 2.0  # T > 1 flattens the language distribution


def q_vocab_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 tokens by document frequency (ties: token asc).

    Scale shape (r10, verdict item 2): the rank used to be a
    ``row_number()`` window over the FULL vocabulary — an
    Exchange SinglePartition sort of the whole distinct-token table
    (hundreds of millions of rows on a web corpus). The top-K is now
    taken with ``orderBy().limit(K)`` — TakeOrderedAndProject keeps a
    K-row heap per partition and only K rows ever converge — and the
    rank window runs over the K-row result, so nothing data-sized is
    ever gathered to one partition (pinned by the SinglePartition
    plan invariant, tests/test_plan_invariants.py)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", tokens(F.col("text")).alias("t")).select(
        "doc_id", F.explode(F.array_distinct(F.col("t"))).alias("token")
    )
    df_counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    top = df_counts.orderBy(F.desc("doc_freq"), F.asc("token")).limit(VOCAB_K)
    w = Window.orderBy(F.desc("doc_freq"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).orderBy(
        "rank"
    )


def q_resample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic temperature resampling: language l keeps
    round(100 * (n_min / n_l)^(1 - 1/T)) percent of its documents by
    hash bucket — the keep rate falls with size so the mix flattens
    toward the target distribution; the smallest language keeps 100%.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    n_min = counts.agg(F.min("n").alias("n_min"))
    quotas = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        "n",
        F.round(
            F.pow(F.col("n_min") / F.col("n"), F.lit(1.0 - 1.0 / TEMPERATURE))
            * F.lit(100.0),
            0,
        )
        .cast("long")
        .alias("keep_pct"),
    )
    bucket = portable_hash60(F.col("text")) % F.lit(100)
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"))
        .join(F.broadcast(quotas.select("lang", "keep_pct")), "lang")
        .filter(F.col("bucket") < F.col("keep_pct"))
        .select("doc_id", "lang", "bucket")
    )


COVERAGE_BANDS = 10
COVERAGE_MILLI = 1000  # per-doc coverage in exact integer millis
# the coverage audit uses a TIGHT vocabulary (top-20 by document
# frequency) so the banding carries signal on small-vocabulary
# corpora; production tokenizer vocabs swap K without changing shape
COVERAGE_VOCAB_K = 20


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-document vocabulary coverage under the
    top-COVERAGE_VOCAB_K token vocabulary: what fraction of each document's
    token OCCURRENCES the vocabulary covers, banded into deciles —
    the go/no-go audit before freezing a tokenizer vocab (low-band
    mass = documents the vocab would shred into unknowns).

    Exactness: per-doc coverage is integerized as
    div(1000·n_in, n_tot) — pure integer arithmetic — so the band
    assignment and the banded average are exact-int sums with ONE
    double division per output row (the fixed-point discipline).

    Scale shape: the vocab is VOCAB_K rows → broadcast; the
    occurrence explode joins map-side against it (no shuffle of the
    exploded table beyond the per-doc aggregate); band rollup is
    |bands| groups. The vocab subtree itself is vocab-top100's
    oracle-checked plan.
    """
    docs = load_table(spark, sf_dir, "documents")
    vocab100 = (
        q_vocab_top100(spark, sf_dir)
        .filter(F.col("rank") <= COVERAGE_VOCAB_K)
        .select("token")
    )
    occ = docs.select("doc_id", tokens(F.col("text")).alias("t")).select(
        "doc_id", F.explode(F.col("t")).alias("token")
    )
    flagged = occ.join(
        F.broadcast(vocab100.withColumn("in_vocab", F.lit(1))), "token", "left"
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tot"),
        F.coalesce(F.sum("in_vocab"), F.lit(0)).alias("n_in"),
    )
    milli = F.expr(f"div({COVERAGE_MILLI} * n_in, n_tot)")
    banded = per_doc.select(
        F.least(
            milli / F.lit(COVERAGE_MILLI // COVERAGE_BANDS),
            F.lit(COVERAGE_BANDS - 1),
        )
        .cast("long")
        .alias("band"),
        milli.alias("cov_milli"),
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum("cov_milli").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_cov_milli"),
        )
        .orderBy("band")
    )
