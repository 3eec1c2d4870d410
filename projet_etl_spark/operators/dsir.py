"""DSIR-style importance weights for target-distribution resampling.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169, public): score every raw document by how much more
likely its hashed-n-gram bag is under a small curated TARGET corpus
than under the raw corpus, then resample the raw pool toward the
target distribution. The reference app has no counterpart (it is a
599-LoC Django/SQLite CRM, reference views.py:10-339); this operator
is part of the training-data curation surface the engine adds on top
of the reference's query semantics.

The published trick that makes this 100 TB-safe is the HASHED bucket
table: token statistics are folded into a FIXED number of buckets
(``DSIR_BUCKETS``), so the learned log-likelihood-ratio table is
O(buckets) regardless of corpus size — it broadcasts to every
executor as one small array literal, and scoring is a map-only pass
(zero corpus-grain shuffles; the ranking is a TakeOrderedAndProject).

Plan shape, in jobs:

1. COUNT pass: one corpus scan, explode tokens, hash each into its
   bucket (portable md5, functions/text.py:portable_hash60 — the
   cross-engine hash every sketch here uses), partial-aggregate to
   ``(bucket, target_count, raw_count)``. The shuffle moves at most
   ``DSIR_BUCKETS`` rows per map partition; the driver collect is
   bounded by ``DSIR_BUCKETS`` (the same bounded-collect class as the
   kmeans seed centroids).
2. RATIO table: computed driver-side in exact mirror of the DuckDB
   oracle's double arithmetic — Laplace-smoothed
   ``ln(p_target / p_raw)``, integerized to MICROLOG units with
   half-away-from-zero rounding so the per-document sums below are
   EXACT BIGINT arithmetic (no float accumulation order to disagree
   across engines; the r8 kappa lesson applied).
3. SCORE pass: one corpus scan; per document a higher-order fold adds
   the bucket microlog of every token — the tokens of a document live
   in one row, so no explode, no join, no per-document shuffle. The
   HOF evaluates outside whole-stage codegen (the measured ~20% CPU
   premium over explode+join, docs/SCALE.md round-9 A/B) but buys a
   ZERO-shuffle scoring stage, which is the right trade when the
   alternative is a corpus-token-grain exchange at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.functions.text import portable_hash60, tokens
from projet_etl_spark.sources.tables import load_table

# Fixed bucket count: the ratio table is this many rows at ANY corpus
# size (DSIR's hashed feature space). 1024 keeps the broadcast literal
# trivial while leaving bucket collisions rare at the fixture vocab.
DSIR_BUCKETS = 1024

# The curated seed corpus the importance weights pull toward. DSIR
# designates a known-good subset (Wikipedia+books in the paper); the
# synthetic corpus designates two sources as the curated seed.
DSIR_TARGET_SOURCES = ("src0", "src1")

# report size: the top documents by importance weight
DSIR_TOP_K = 40

_MICRO = 1_000_000.0


def _round_half_away(x: float) -> int:
    """Half-away-from-zero to integer — DuckDB's ROUND, which Python's
    banker's-rounding ``round()`` does NOT match at exact halves."""
    return int(math.floor(x + 0.5)) if x >= 0.0 else -int(math.floor(-x + 0.5))


def bucket_partials(docs: DataFrame) -> DataFrame:
    """(bucket, ct, cr) hashed token counts of ANY (source, text)
    frame — the COUNT-pass core, shared by the batch table build and
    the streaming store's per-micro-batch partials (partial counts
    are additive, so a fold of per-batch partials equals this frame
    over the union of the batches — the store→rescan parity the
    dsir-store oracle row certifies)."""
    tok = docs.select(
        F.col("source"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    ).filter(F.col("tok") != "")
    return (
        tok.select(
            (portable_hash60(F.col("tok")) % F.lit(DSIR_BUCKETS)).alias("bucket"),
            F.col("source")
            .isin(*DSIR_TARGET_SOURCES)
            .cast("long")
            .alias("is_target"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_target").cast("long").alias("ct"),
            F.count(F.lit(1)).cast("long").alias("cr"),
        )
    )


def microlog_from_counts(counts) -> list[int]:
    """The learned table from collected (bucket, ct, cr) rows:
    smoothed log-likelihood ratio per hash bucket, in exact integer
    MICROLOG units, dense over all buckets.

    Mirrors the oracle's arithmetic operation-for-operation: each
    smoothed probability is one integer->double division, the ratio
    one more, then ``ln`` and the half-away integerization — so both
    engines integerize the identical IEEE double.
    """
    total_t = sum(r["ct"] for r in counts)
    total_r = sum(r["cr"] for r in counts)
    table = [0] * DSIR_BUCKETS
    for r in counts:
        p_t = (r["ct"] + 1) / (total_t + DSIR_BUCKETS)
        p_r = (r["cr"] + 1) / (total_r + DSIR_BUCKETS)
        table[r["bucket"]] = _round_half_away(math.log(p_t / p_r) * _MICRO)
    return table


def _bucket_microlog(spark: SparkSession, sf_dir: str) -> list[int]:
    """Batch path: one corpus COUNT pass, bounded collect, table."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    # bounded: at most DSIR_BUCKETS rows by construction
    return microlog_from_counts(bucket_partials(docs).collect())


def score_with_table(
    spark: SparkSession, sf_dir: str, table: list[int]
) -> DataFrame:
    """The SCORE pass over ``documents`` under a given microlog
    table — shared by the batch query and the store-served twin, so
    the two serve paths cannot drift."""
    mlog = F.lit(table)  # single array<long> literal, broadcast with the plan
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    toks = F.filter(tokens(F.col("text")), lambda x: x != F.lit(""))
    weight = F.aggregate(
        F.col("t"),
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.element_at(
            mlog, ((portable_hash60(x) % F.lit(DSIR_BUCKETS)) + F.lit(1)).cast("int")
        ),
    )
    return (
        docs.withColumn("t", toks)
        .filter(F.size("t") > 0)
        .select(
            "doc_id",
            "lang",
            "source",
            weight.alias("dsir_microlog"),
        )
        .orderBy(F.desc("dsir_microlog"), F.asc("doc_id"))
        .limit(DSIR_TOP_K)
    )


def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``DSIR_TOP_K`` documents by DSIR importance weight toward
    the curated seed sources — the resampling order a curation run
    reads to upsample target-like raw documents.

    ``dsir_microlog`` is the document's summed bucket log-likelihood
    ratio in exact micro-log units (BIGINT end to end)."""
    return score_with_table(spark, sf_dir, _bucket_microlog(spark, sf_dir))
