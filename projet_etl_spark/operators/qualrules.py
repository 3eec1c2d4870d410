"""Document-quality rule battery: the published web-corpus filter
heuristics (the "Gopher rules" of Rae et al. 2021, and the C4 lineage
before them) as one auditable sweep — word-count bounds, mean word
length, symbol-to-word ratio, alphabetic-word fraction, and the
stopword floor.

Output is the dq-expectations shape: ONE row per rule with the
corpus-wide failure count and rate, so corpus drift shows up as a
moving failure profile (run per snapshot, diff the profiles).

Exactness: every rule threshold is evaluated in INTEGER
cross-multiplied form (mean word length < 3 ⇔ total_chars < 3·n_words;
alpha fraction < 0.8 ⇔ 5·alpha < 4·n_words; symbol ratio > 0.1 ⇔
10·symbols > n_words), so no rule sits on a float knife-edge and the
DuckDB oracle matches bit for bit; the only float op is the final
percentage presentation division.

100 TB design: one map-only pass computes all per-doc counters from a
single tokens() array (no per-rule rescans), one grand aggregate sums
the five failure indicators, and the rule unpivot emits five rows —
nothing after the scan is data-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.functions.text import tokens
from projet_etl_spark.sources.tables import load_table

WORDS_MIN = 50
WORDS_MAX = 100_000
# Gopher's "must contain at least 2 of" stopword floor
STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
STOP_MIN = 2


def per_doc_counters(docs: DataFrame) -> DataFrame:
    """(doc_id, nw, chars, alpha, symbols, stops) — the one map-only
    pass every rule evaluates from; shared by the corpus-wide rule
    sweep and the rules-vs-model agreement audit."""
    t = docs.select("doc_id", tokens(F.col("text")).alias("t"), "text")
    return t.select(
        "doc_id",
        F.size("t").alias("nw"),
        F.length(F.concat_ws("", F.col("t"))).alias("chars"),
        F.size(F.filter(F.col("t"), lambda w: w.rlike("[a-z]"))).alias(
            "alpha"
        ),
        (
            F.size(F.regexp_extract_all(F.col("text"), F.lit("#"), 0))
            + F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\.\.\."), 0))
        ).alias("symbols"),
        F.size(
            F.filter(
                F.lit(list(STOP_WORDS)).cast("array<string>"),
                lambda w: F.array_contains(F.col("t"), w),
            )
        ).alias("stops"),
    )


def rules_pass_col() -> Column:
    """True iff a (nw, chars, alpha, symbols, stops) row fails NONE
    of the five rules — integer cross-multiplied forms, same as the
    sweep."""
    return ~(
        (F.col("nw") < WORDS_MIN)
        | (F.col("nw") > WORDS_MAX)
        | (F.col("chars") < 3 * F.col("nw"))
        | (F.col("chars") > 10 * F.col("nw"))
        | (10 * F.col("symbols") > F.col("nw"))
        | (5 * F.col("alpha") < 4 * F.col("nw"))
        | (F.col("stops") < STOP_MIN)
    )


def q_docs_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rule, n_fail, fail_pct) over the documents corpus — the
    quality-filter audit a curation pipeline runs before dropping
    anything (see module docstring for the rule set and the
    integer-exact threshold forms)."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = per_doc_counters(docs)
    agg = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            ((F.col("nw") < WORDS_MIN) | (F.col("nw") > WORDS_MAX)).cast("long")
        ).alias("f_wordcount"),
        F.sum(
            (
                (F.col("chars") < 3 * F.col("nw"))
                | (F.col("chars") > 10 * F.col("nw"))
            ).cast("long")
        ).alias("f_meanwordlen"),
        F.sum((10 * F.col("symbols") > F.col("nw")).cast("long")).alias(
            "f_symbolratio"
        ),
        F.sum((5 * F.col("alpha") < 4 * F.col("nw")).cast("long")).alias(
            "f_alphafrac"
        ),
        F.sum((F.col("stops") < STOP_MIN).cast("long")).alias("f_stopwords"),
    )
    rules = agg.selectExpr(
        "n_docs",
        "stack(5, "
        "'word-count-range', f_wordcount, "
        "'mean-word-length', f_meanwordlen, "
        "'symbol-to-word-ratio', f_symbolratio, "
        "'alpha-word-fraction', f_alphafrac, "
        "'stopword-floor', f_stopwords"
        ") AS (rule, n_fail)",
    )
    return rules.select(
        "rule",
        F.col("n_fail").cast("long").alias("n_fail"),
        F.round(
            F.expr("cast(n_fail * 100 as double) / n_docs"), 6
        ).alias("fail_pct"),
    ).orderBy("rule")


def q_quality_rules_vs_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement audit between the two quality filters the engine
    ships: the published rule battery above vs the learned
    (fastText-style) scorer — the confusion table
    (rules_pass, model_keep, n_docs) a curation team reads before
    choosing thresholds: heavy off-diagonal mass means the filters
    disagree about what to drop and the corpus decision is really a
    policy decision.

    Composition: per-doc rule flags come from per_doc_counters (the
    sweep's own map pass), model keeps from the JVM scorer twin
    (oracle-checked expression tree); the join is doc_id equi,
    co-partitioned by the aggregate shuffles on either side; output
    is ≤4 rows.
    """
    from projet_etl_spark.operators.quality_model import (
        q_text_quality_model_jvm,
    )

    docs = load_table(spark, sf_dir, "documents")
    rules = per_doc_counters(docs).select(
        "doc_id", rules_pass_col().alias("rules_pass")
    )
    model = q_text_quality_model_jvm(spark, sf_dir).select("doc_id", "keep")
    return (
        rules.join(model, "doc_id")
        .groupBy("rules_pass", F.col("keep").alias("model_keep"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("rules_pass", "model_keep")
    )
