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


def _counter_cols() -> list:
    """The five per-doc rule counters as column expressions over a
    staged token array ``t`` and the raw ``text`` — shared by the
    corpus-wide sweep's frame and the fused rules-vs-model scan."""
    return [
        F.size("t").alias("nw"),
        F.length(F.concat_ws("", F.col("t"))).alias("chars"),
        F.size(F.filter(F.col("t"), lambda w: w.rlike("[a-z]"))).alias(
            "alpha"
        ),
        (
            F.size(F.regexp_extract_all(F.col("text"), F.lit("#"), 0))
            + F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\.\.\."), 0))
        ).alias("symbols"),
        # |STOP_WORDS ∩ set(t)|: array_intersect builds a hash set of
        # one side (O(|t| + |stopwords|)) where the equivalent
        # filter/array_contains form is O(|stopwords| × |t|) —
        # measured 1.8× faster on the counter at sf0.1, and the gap
        # grows with a production-sized stopword list; both count
        # each stopword at most once (STOP_WORDS is distinct), which
        # is also what the DuckDB oracle's list_filter computes
        F.size(
            F.array_intersect(
                F.lit(list(STOP_WORDS)).cast("array<string>"), F.col("t")
            )
        ).alias("stops"),
    ]


def per_doc_counters(docs: DataFrame) -> DataFrame:
    """(doc_id, nw, chars, alpha, symbols, stops) — the one map-only
    pass every rule evaluates from; shared by the corpus-wide rule
    sweep and the rules-vs-model agreement audit."""
    t = docs.select("doc_id", tokens(F.col("text")).alias("t"), "text")
    return t.select("doc_id", *_counter_cols())


def rule_fail_exprs() -> list[tuple[str, Column]]:
    """The five per-rule FAIL predicates over a counters row, named
    as the sweep reports them — the single source every consumer
    (corpus sweep, rules_pass gate, per-domain rollup) derives from,
    in integer cross-multiplied form."""
    return [
        (
            "f_wordcount",
            (F.col("nw") < WORDS_MIN) | (F.col("nw") > WORDS_MAX),
        ),
        (
            "f_meanwordlen",
            (F.col("chars") < 3 * F.col("nw"))
            | (F.col("chars") > 10 * F.col("nw")),
        ),
        ("f_symbolratio", 10 * F.col("symbols") > F.col("nw")),
        ("f_alphafrac", 5 * F.col("alpha") < 4 * F.col("nw")),
        ("f_stopwords", F.col("stops") < STOP_MIN),
    ]


def rules_pass_col() -> Column:
    """True iff a (nw, chars, alpha, symbols, stops) row fails NONE
    of the five rules — the OR-fold of :func:`rule_fail_exprs`, so
    the gate can never disagree with the per-rule decomposition."""
    failed = F.lit(False)
    for _, e in rule_fail_exprs():
        failed = failed | e
    return ~failed


def q_docs_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rule, n_fail, fail_pct) over the documents corpus — the
    quality-filter audit a curation pipeline runs before dropping
    anything (see module docstring for the rule set and the
    integer-exact threshold forms)."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = per_doc_counters(docs)
    agg = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        *[F.sum(e.cast("long")).alias(n) for n, e in rule_fail_exprs()],
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


def make_fused_logit_kernel(n_buckets: int, w_span: int):
    """Closure-shipped Arrow batch kernel for the fused scan: takes
    (nw, chars, alpha, symbols, stops, t) batches, appends the
    scorer's exact-BIGINT ``logit_milli`` computed from the token
    array with the SAME md5 math as ``make_quality_scorer``
    (quality_model.py), and drops ``t``. Defined inside a factory so
    cloudpickle ships it by value (the make_quality_scorer trap).

    r14 (guide §4.2): the logit used to be an ``F.aggregate`` fold
    whose lambda ran two interpreted md5s per feature occurrence —
    higher-order-function bodies neither codegen nor constant-fold
    (the r13 weight-table-literal experiment), so the fold was the
    dominant cost of all three fused-scan consumers. The Arrow kernel
    computes the identical integer logit (exact BIGINT sum, no float
    anywhere) in the deployment shape the Arrow scorer twin already
    certifies; interleaved A/B: 2.12 → 1.62 s median on
    quality-rules-vs-model at sf0.1.
    """

    def fuse(batches):
        import hashlib

        import pandas as _pd

        h30_mod = 1 << 30
        wmod = 2 * w_span + 1
        memo_w: dict[int, int] = {}

        def _h30(s: str) -> int:
            return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % h30_mod

        def _weight(bucket: int) -> int:
            w = memo_w.get(bucket)
            if w is None:
                w = _h30(f"w#{bucket}") % wmod - w_span
                memo_w[bucket] = w
            return w

        for pdf in batches:
            logit_out = []
            for toks in pdf["t"]:
                toks = list(toks)
                feats = [f"u#{x}" for x in toks]
                feats += [f"b#{a} {b}" for a, b in zip(toks, toks[1:])]
                logit_out.append(
                    sum(_weight(_h30(f) % n_buckets) for f in feats)
                )
            out = pdf.drop(columns=["t"]).copy()
            out["logit_milli"] = _pd.Series(logit_out, dtype="int64")
            yield out

    return fuse


def _per_doc_rules_and_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused single-scan projection (round-9, verdict item 3):
    rule counters AND the learned scorer's exact-BIGINT logit from
    ONE pass over ``documents`` — shared by the confusion table, the
    kappa fold, and the calibration curve so the three reports can
    never disagree about what either filter said.

    Still one corpus pass, zero joins, zero pre-aggregate shuffles
    (the round-9 contract, pinned by tests/test_round9_ops.py): the
    rule counters stay JVM column expressions; only the logit fold
    moved behind Arrow (see make_fused_logit_kernel) because its
    HOF lambda evaluated interpreted md5s per feature occurrence."""
    from projet_etl_spark.operators.quality_model import N_BUCKETS, W_SPAN

    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", tokens(F.col("text")).alias("t"), "text")
    counters = staged.filter(F.size("t") > 0).select(*_counter_cols(), "t")
    return counters.mapInPandas(
        make_fused_logit_kernel(N_BUCKETS, W_SPAN),
        "nw int, chars int, alpha int, symbols int, stops int, logit_milli long",
    )


# fixed calibration bands over the milli-logit axis: width/limits are
# pinned constants (shared with the DuckDB oracle), clamped at the
# edges, so the band arithmetic is pure non-negative integer division
# in both engines — no data-dependent boundaries to broadcast and no
# float banding knife-edge.
CAL_BAND_MILLI = 4_000
CAL_LO_MILLI = -24_000
CAL_HI_MILLI = 16_000
CAL_BANDS = (CAL_HI_MILLI - CAL_LO_MILLI) // CAL_BAND_MILLI


def q_quality_rules_vs_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement audit between the two quality filters the engine
    ships: the published rule battery above vs the learned
    (fastText-style) scorer — the confusion table
    (rules_pass, model_keep, n_docs) a curation team reads before
    choosing thresholds: heavy off-diagonal mass means the filters
    disagree about what to drop and the corpus decision is really a
    policy decision.

    Fused single-scan plan (round-9, verdict item 3): both filters
    are map-only derivations of the same ``documents`` scan, so the
    round-8 shape — two corpus-sized doc_id shuffles to join the rule
    frame with the scorer frame — was a 2-shuffle plan where a
    0-shuffle plan exists (its 5.8× at 10× data was the steepest
    scaler of that round, docs/SCALE.md). Here ONE projection computes
    the rule counters and the model logit together: the logit is the
    same exact BIGINT sum of bucket weights the scorer produces, just
    folded over the feature array with ``F.aggregate`` instead of
    explode → broadcast-weight join → per-doc hash aggregate (the
    linear model's weights are in-row derivable, so no weight-table
    state is needed). Docs with an empty token array have no feature
    occurrences and never reach the scorer's per-doc aggregate, so
    the inner join dropped them — the fused plan keeps that contract
    with an explicit ``size(t) > 0`` filter. Nothing shuffles before
    the final ≤4-row aggregate (pinned by a plan test).
    """
    per_doc = _per_doc_rules_and_logit(spark, sf_dir)
    return (
        per_doc.select(
            rules_pass_col().alias("rules_pass"),
            (F.col("logit_milli") > 0).alias("model_keep"),
        )
        .groupBy("rules_pass", "model_keep")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("rules_pass", "model_keep")
    )


def q_filter_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the rule battery and the learned scorer
    — the chance-corrected agreement statistic that turns the
    confusion table into the one number a curation team tracks per
    corpus snapshot (raw agreement overstates consensus when both
    filters keep/drop lopsidedly).

    Composition: folds q_quality_rules_vs_model's ≤4-row confusion
    table (the fused single-scan plan) into exact integer margins,
    then evaluates po/pe/kappa with the identical IEEE expression
    shape as the DuckDB oracle — longs in, one correctly-rounded
    double out per ratio, ROUND(·, 6) for presentation. pe = 1
    (degenerate margins) is defined as kappa = 1.0 via NULLIF/
    COALESCE in both engines.

    100 TB: everything after the confusion table's own aggregate is
    a 4-row fold — the statistic costs nothing beyond the audit it
    summarizes."""
    ct = q_quality_rules_vs_model(spark, sf_dir)
    m = ct.agg(
        F.sum("n_docs").cast("long").alias("n"),
        F.sum(
            F.when(F.col("rules_pass") & F.col("model_keep"), F.col("n_docs"))
            .otherwise(F.lit(0))
        ).cast("long").alias("a"),
        F.sum(
            F.when(~F.col("rules_pass") & ~F.col("model_keep"), F.col("n_docs"))
            .otherwise(F.lit(0))
        ).cast("long").alias("d"),
        F.sum(
            F.when(F.col("rules_pass"), F.col("n_docs")).otherwise(F.lit(0))
        ).cast("long").alias("r1"),
        F.sum(
            F.when(F.col("model_keep"), F.col("n_docs")).otherwise(F.lit(0))
        ).cast("long").alias("m1"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("a") + F.col("d")).cast("double") / nd
    pe = (F.col("r1").cast("double") / nd) * (F.col("m1").cast("double") / nd) + (
        (F.col("n") - F.col("r1")).cast("double") / nd
    ) * ((F.col("n") - F.col("m1")).cast("double") / nd)
    kappa = F.coalesce((po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0)), F.lit(1.0))
    return m.select(
        F.col("n").alias("n_docs"),
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("expected_agreement"),
        F.round(kappa, 6).alias("kappa"),
    )


def q_quality_model_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability curve of the learned scorer against the rule
    battery: documents banded by the model's milli-logit (fixed
    CAL_BAND_MILLI-wide bands, edge-clamped), each band reporting how
    often the rules agree the document is keepable. Kappa
    (q_filter_agreement_kappa) is the one-number agreement summary;
    this is the per-band view a curation team reads to SET the
    model threshold — a monotone rules-pass rate across bands means
    the logit orders quality even where the two filters disagree in
    aggregate, and the band where the rate crosses ~50% is the
    evidence-backed cut point.

    Exactness: the clamp and band index are pure non-negative integer
    arithmetic (no data-dependent boundaries, no float banding
    knife-edge); per-band counts are exact BIGINTs with one rounded
    double ratio per output row.

    Scale shape: the fused single-scan projection (shared with the
    confusion table) followed by a ≤CAL_BANDS-group aggregate —
    nothing shuffles before the final tiny aggregate, same contract
    as quality-rules-vs-model.
    """
    per_doc = _per_doc_rules_and_logit(spark, sf_dir)
    clamped = F.greatest(
        F.least(F.col("logit_milli"), F.lit(CAL_HI_MILLI - 1)),
        F.lit(CAL_LO_MILLI),
    )
    banded = per_doc.select(
        (clamped - F.lit(CAL_LO_MILLI)).alias("shifted"),
        rules_pass_col().cast("long").alias("rules_pass"),
    ).select(
        F.expr(f"div(shifted, {CAL_BAND_MILLI})").alias("band"),
        "rules_pass",
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("rules_pass").cast("long").alias("n_rules_pass"),
        )
        .select(
            "band",
            (F.lit(CAL_LO_MILLI) + F.col("band") * F.lit(CAL_BAND_MILLI))
            .cast("long")
            .alias("band_lo_milli"),
            "n_docs",
            "n_rules_pass",
            F.round(
                F.col("n_rules_pass").cast("double")
                * 100.0
                / F.col("n_docs").cast("double"),
                6,
            ).alias("rules_pass_pct"),
        )
        .orderBy("band")
    )
