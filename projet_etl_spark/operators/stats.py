"""Statistical / reshaping operators the reference lacks (SURVEY.md
§2.4 notes no percentiles; §2.8 no n-gram analytics): exact
percentiles, typed pivot, and bigram frequency.

- percentiles: Spark's exact ``percentile`` (interpolated) mirrors
  DuckDB's ``quantile_cont`` — both linear-interpolate on the sorted
  values, so with round(6) the outputs agree. At 100 TB the exact
  form needs a sort per group; ``approx_percentile`` (t-digest) is
  the opt-in, same pattern as mag-cat-approx.
- pivot: per-day event-type count matrix. Spark's pivot with an
  EXPLICIT value list compiles to conditional aggregates (one pass,
  no second job to discover values — at scale always pin the list).
- bigrams: adjacent-token pair frequency — the n-gram analytics pass
  of a corpus study; one staged tokenize, posexplode, two hash aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_etl_spark.functions.fixedpoint import UnitSum, fixed_point_agg, units
from projet_etl_spark.functions.text import tokens
from projet_etl_spark.sources.tables import events, load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
BIGRAM_K = 50


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p95 of event value per type."""
    ev = events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        )
        .orderBy("event_type")
    )


Z_THRESHOLD = 3.0


def q_events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers: events whose value deviates more
    than Z_THRESHOLD population standard deviations from their event
    type's mean — the standard metric-monitoring shape.

    Moments are exact decimal sums (associative, bit-identical at any
    parallelism — the corr-qty-price discipline; value is 2-decimal
    money so decimal(18,2)/(18,4) hold it exactly), the per-type
    moment table is broadcast (cardinality = event types, fixed), and
    the per-row z is one deterministic double expression, so both
    engines flag the identical event set.

    The naive-form variance sxx/n - mean² can land a hair below zero
    on a near-constant stratum (catastrophic cancellation); Spark's
    sqrt(negative) is NaN — which compares GREATER than any value, so
    |z| > 3 would emit spurious rows — while DuckDB's sqrt(negative)
    errors out. Clamping with greatest(var, 0) and pre-filtering
    var > 0 on BOTH sides removes the divergence: degenerate strata
    produce no anomalies in either engine."""
    ev = events(spark, sf_dir).select("event_id", "event_type", "value")
    # value is 2-dp and <= $1000 (both pinned per column by
    # tests/test_fixedpoint.py::test_money_columns_on_2dp_grid and
    # test_star_unit_bounds_hold); the moments run in exact integer
    # units (functions/fixedpoint.py) — same snapped values the
    # DECIMAL(18,2)/(18,4) casts produced
    v2 = units("value")
    m = fixed_point_agg(
        ev,
        ["event_type"],
        [
            UnitSum("usx", v2 * 100, 4, 10**8),
            UnitSum("usxx", v2 * v2, 4, 10**10),
        ],
        counts=[("cnt", None)],
    ).select(
        "event_type",
        F.col("cnt").cast("double").alias("n"),
        F.col("usx").cast("double").alias("sx"),
        F.col("usxx").cast("double").alias("sxx"),
    )
    j = ev.join(F.broadcast(m), "event_type")
    mean = F.col("sx") / F.col("n")
    var = F.greatest(
        F.col("sxx") / F.col("n") - mean * mean, F.lit(0.0)
    )
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        j.select(
            "event_id",
            "event_type",
            "value",
            var.alias("var"),
            F.round(z, 6).alias("z"),
        )
        .filter((F.col("var") > F.lit(0.0)) & (F.abs(F.col("z")) > F.lit(Z_THRESHOLD)))
        .drop("var")
    )


def q_events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day counts pivoted into one column per event type."""
    ev = events(spark, sf_dir).select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    )
    return (
        ev.groupBy("day")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
        .orderBy("day")
    )


def q_daily_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily event counts with a 7-day moving average and a
    running cumulative total (window frames over a pre-aggregated
    series).

    Scale shape: the window function runs AFTER reduction to
    (event_type, day) grain — its input is days x types rows, not
    events, so the per-partition sort is trivially small no matter
    how many raw events feed it. avg/sum over exact BIGINT counts are
    deterministic (one division at the end) — no rounding needed.
    """
    ev = events(spark, sf_dir).select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    return daily.select(
        "event_type",
        "day",
        "n",
        F.avg("n").over(w.rowsBetween(-6, 0)).alias("avg_7d"),
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cume_n"
        ),
    ).orderBy("event_type", "day")


def q_bigrams_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent-token bigrams by occurrence (ties: bigram asc).

    Scale shape (r10, verdict item 2): like vocab-top100, the rank
    used to be a ``row_number()`` window over the FULL bigram
    vocabulary — strictly larger than the token vocabulary, gathered
    to one partition. Now ``orderBy().limit(K)``
    (TakeOrderedAndProject: per-partition K-row heaps) takes the
    top-K and the rank window runs over the K-row result only."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    bigrams = staged.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("t", i), F.element_at("t", i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram")
    )
    counts = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("bigram")).limit(BIGRAM_K)
    w = Window.orderBy(F.desc("n"), F.asc("bigram"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).orderBy(
        "rank"
    )


def q_events_type_counts_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type counts computed through the SALTED two-phase
    aggregation (sources/warehouse.salted_count) — the skew-resilient
    plan for low-cardinality hot keys, registered as an oracled query
    so the hard correctness signal covers the salting path, not just
    pytest. A handful of event types over millions of events is the
    canonical pathological GROUP BY: without salting every row of a
    type funnels to one reducer; with it, partials spread over
    (type, salt) and a second types-sized aggregation merges them.
    The result is salt-invariant, so the oracle is the plain GROUP BY."""
    from projet_etl_spark.sources.tables import events
    from projet_etl_spark.sources.warehouse import salted_count

    ev = events(spark, sf_dir).select("event_type")
    return (
        salted_count(ev, "event_type", n_salts=8)
        .select("event_type", F.col("n").cast("long").alias("n_events"))
        .orderBy("event_type")
    )


def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series per event type: a dense day spine with
    zero-filled counts and the last observed daily mean value carried
    forward across gaps (the timeseries-database gap-fill/locf shape).

    Scale shape: the fact table reduces to (type, day) grain FIRST
    (one map-side-combined aggregate); the spine is distinct types ×
    a date sequence exploded from a one-row min/max broadcast, so the
    only non-reduced input the plan touches is the raw scan feeding
    the aggregate. The carry-forward window partitions by type over
    days×types rows — trivially small forever. The spine join is an
    equi-join on (type, day) against the reduced side.
    """
    ev = events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.avg("value"), 6).alias("avg_val"),
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.sequence("d0", "d1")).alias("d")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(daily, ["event_type", "d"], "left")
    return joined.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n"),
        F.isnull("n_obs").cast("long").alias("is_gap"),
        F.last("avg_val", ignorenulls=True).over(w).alias("filled_avg"),
    ).orderBy("event_type", "day")


def q_events_props_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the semi-structured ``props`` JSON
    column (from_json with an explicit schema — not string
    get_json_object), aggregated per event type: the
    JSON-functions family every log pipeline needs.

    Scale shape: parsing is a per-row JVM expression inside the scan
    projection (no Python, no second pass); the aggregate is
    map-side combined on the 5-value type key. Malformed JSON yields
    NULL (PERMISSIVE), counted separately rather than dropped
    silently. The k sum is an exact BIGINT; the mean divides once.
    """
    ev = events(spark, sf_dir).select(
        "event_type",
        F.from_json(F.col("props"), "k INT").getField("k").alias("k"),
    )
    return _props_k_agg(ev)


def _props_k_agg(ev: DataFrame) -> DataFrame:
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(F.when(F.col("k").isNull(), 1)).cast("long").alias("n_bad"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def q_events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT twin of events-props-parse: the props column
    parses ONCE into Spark 4's binary VariantType
    (``try_parse_json``) and fields extract with ``try_variant_get``
    path expressions — the open-schema path for logs whose property
    set drifts, where re-running from_json with a widened schema per
    reader is the anti-pattern. Null semantics match PERMISSIVE
    from_json exactly (malformed or missing -> NULL, counted not
    dropped), so the query shares events-props-parse's oracle —
    the engine's proof that both JSON surfaces agree.

    Scale shape: identical to the from_json twin — per-row JVM
    expressions inside the scan projection, map-side-combined
    aggregate on the type key. At 100 TB the variant binary would be
    materialized once at ingest and every reader does path
    extraction only.
    """
    ev = events(spark, sf_dir).select(
        "event_type",
        F.try_variant_get(
            F.try_parse_json(F.col("props")), "$.k", "int"
        ).alias("k"),
    )
    return _props_k_agg(ev)


RANGE_WINDOW_DAYS = 7


def q_daily_trailing_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-CALENDAR-day event counts per type via a RANGE
    window frame over epoch-day numbers — the frame mechanic a ROWS
    frame cannot express: on a sparse series, ROWS(-6, 0) spans the
    last 7 OBSERVED days while RANGE(-6, 0) spans the last 7 calendar
    days, counting absent days as zero contribution
    (q_daily_moving_avg is the ROWS-frame counterpart).

    Scale shape: identical to the moving average — the window runs
    AFTER reduction to (type, day) grain, so its input is days×types
    rows; the range frame needs no gap-filled spine.
    """
    ev = events(spark, sf_dir).select(
        "event_type", F.to_date("ts").alias("d")
    )
    daily = ev.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_date(F.col("d")))
        .rangeBetween(-(RANGE_WINDOW_DAYS - 1), 0)
    )
    return daily.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n"),
        F.sum("n").over(w).cast("long").alias("sum_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("days_present_7d"),
    ).orderBy("event_type", "day")


MAD_SCALE = 1.4826  # consistency constant: MAD -> sigma under normality
ROBUST_Z = 3.5


def q_events_anomalies_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outliers per event type: |value - median| >
    ROBUST_Z × 1.4826 × MAD — the robust twin of q_events_anomalies.
    Moment-based z-scores move with the outliers they hunt (one whale
    inflates sigma and hides the rest); the median and the median
    absolute deviation have a 50% breakdown point, the standard
    robust alternative.

    Two order-statistics aggregates (median, then MAD of residuals
    against the broadcast medians — MAD needs the median first, so
    two passes is the honest cost), each reducing to one row per
    event type; the flag itself is a per-row expression against the
    broadcast (type, med, mad) table. The robust z is rounded before
    thresholding so both engines cut the identical event set.
    """
    ev = events(spark, sf_dir).select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
        )
    )
    j = ev.join(F.broadcast(mad), "event_type")
    rz = F.round(
        (F.col("value") - F.col("med")) / (F.lit(MAD_SCALE) * F.col("mad")), 6
    )
    return (
        j.select(
            "event_id",
            "event_type",
            "value",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            rz.alias("robust_z"),
        )
        .filter((F.col("mad") > 0) & (F.abs(F.col("robust_z")) > ROBUST_Z))
    )


def q_daily_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-resolved p50/p95 of event value per (type, day) — the
    dashboard latency-percentile shape. The exact percentile
    aggregates at (type, day) grain: each group holds one bucket's
    events, so the order-statistics state is bucket-bounded (swap for
    approx_percentile when buckets stop fitting; the grain and the
    output contract are unchanged)."""
    ev = events(spark, sf_dir).select(
        "event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "value"
    )
    return (
        ev.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        )
        .orderBy("event_type", "day")
    )


CUSUM_K = 0.5  # slack in sigma units
CUSUM_H = 4.0  # decision threshold in sigma units


def q_events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection on each type's daily count
    series: s_t = max(0, s_{t-1} + z_t - k), flagged where s_t > h —
    the classic sequential change-point monitor for "this metric has
    drifted upward", with z the daily count standardized by the
    series' own mean/stddev.

    The recursion is NOT window-expressible directly, but has the
    closed form s_t = c_t - min(0, min_{j<=t} c_j) with
    c_t = Σ(z_i - k): ONE cumulative-sum window plus ONE running-min
    window over the (type, day) reduced series — so the sequential
    algorithm runs as two partition-local frames over days×types
    rows, never a driver loop. Moments are exact integer sums; z and
    the CUSUM are rounded before thresholding so both engines flag
    identical days.
    """
    ev = events(spark, sf_dir).select(
        "event_type", F.to_date("ts").alias("d")
    )
    daily = ev.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("n"))
    return cusum_over_daily(daily)


def cusum_over_daily(daily: DataFrame) -> DataFrame:
    """CUSUM core over any (event_type, d: date, n) daily-count frame
    — shared by the raw-events query and the incremental-store path
    (streaming/dailycounts.py), so the detector cannot drift from its
    maintained input."""
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("days"),
        F.sum("n").cast("double").alias("sn"),
        F.sum(F.col("n") * F.col("n")).cast("double").alias("snn"),
    )
    j = daily.join(F.broadcast(m), "event_type")
    mean = F.col("sn") / F.col("days")
    var = F.greatest(F.col("snn") / F.col("days") - mean * mean, F.lit(0.0))
    z = (F.col("n") - mean) / F.sqrt(var)
    w = Window.partitionBy("event_type").orderBy("d")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = F.sum(F.round(z - F.lit(CUSUM_K), 6)).over(frame)
    running_min = F.min(c).over(frame)
    s = F.round(c - F.least(F.lit(0.0), running_min), 6)
    return (
        j.filter(var > F.lit(0.0))
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("n"),
            s.alias("cusum"),
            (s > CUSUM_H).cast("long").alias("drifted"),
        )
        .orderBy("event_type", "day")
    )


BOLLINGER_WINDOW = 7
BOLLINGER_K = 2.0


def q_daily_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on each type's daily count series: trailing
    7-day rolling mean ± 2 rolling population stddevs, with an
    outside-band flag — the rolling-moments window mechanic
    (moving average exists; this adds second moments per frame).

    The rolling variance derives from exact integer frame sums
    (Σn, Σn² over the ROWS frame — deterministic, no streaming
    variance state), clamped at zero against cancellation exactly
    like the global-moment anomaly queries; bands and the flag use
    rounded values so both engines cut identically. Window input is
    the (type, day) reduced series.
    """
    ev = events(spark, sf_dir).select("event_type", F.to_date("ts").alias("d"))
    daily = ev.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-(BOLLINGER_WINDOW - 1), 0)
    )
    cnt = F.count(F.lit(1)).over(w).cast("double")
    sn = F.sum("n").over(w).cast("double")
    snn = F.sum(F.col("n") * F.col("n")).over(w).cast("double")
    mean = sn / cnt
    var = F.greatest(snn / cnt - mean * mean, F.lit(0.0))
    upper = F.round(mean + F.lit(BOLLINGER_K) * F.sqrt(var), 6)
    lower = F.round(mean - F.lit(BOLLINGER_K) * F.sqrt(var), 6)
    return daily.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n"),
        F.round(mean, 6).alias("ma"),
        lower.alias("band_lo"),
        upper.alias("band_hi"),
        (
            (F.col("n").cast("double") > upper)
            | (F.col("n").cast("double") < lower)
        ).cast("long").alias("outside"),
    ).orderBy("event_type", "day")


EWMA_ALPHA = 0.3
EWMA_WINDOW = 14  # finite-horizon EWMA: weights below (1-α)^13 ≈ 1% truncated


def q_daily_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finite-window exponentially weighted moving average of each
    type's daily counts: weights (1-α)^j for lag j over the trailing
    EWMA_WINDOW days, normalized — the smoothing recursion in its
    bounded-memory form (the infinite recursion's closed form needs
    (1-α)^(-i) powers that overflow on an unbounded series; the
    finite horizon truncates weights already below 1%, stated as the
    operator's definition rather than a silent approximation).

    Mechanics worth the registry slot: collect_list over an ordered
    ROWS frame yields the frame's values IN FRAME ORDER in both
    engines, and the weighted fold over that bounded array is a
    deterministic fixed-order sum — a window × higher-order-function
    composition with no UDF. Window input is the (type, day) reduced
    series; each row carries at most EWMA_WINDOW values.
    """
    ev = events(spark, sf_dir).select("event_type", F.to_date("ts").alias("d"))
    daily = ev.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-(EWMA_WINDOW - 1), 0)
    )
    staged = daily.withColumn(
        "vals", F.collect_list(F.col("n").cast("double")).over(w)
    )
    decay = F.lit(1.0 - EWMA_ALPHA)
    vals = F.col("vals")
    sz = F.size(vals).cast("double")
    # frame order is oldest -> current; weight (1-α)^(len-idx)
    weighted = F.aggregate(
        F.zip_with(
            vals,
            F.sequence(F.lit(1), F.size(vals)),
            lambda x, i: x * F.pow(decay, sz - i.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    norm = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.size(vals)),
            lambda i: F.pow(decay, sz - i.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    return staged.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n"),
        F.round(weighted / norm, 6).alias("ewma"),
    ).orderBy("event_type", "day")


# --- heavy hitters ---------------------------------------------------

# a user is a heavy hitter when its event count exceeds HH_PCT% of
# the corpus MEAN events-per-user — the hot-key audit threshold
# (a fixed share-of-total φ degenerates when the user population
# scales with the corpus: mean activity stays flat, so no user can
# hold a constant share; above-mean is the scale-stable definition)
HH_PCT = 105


def q_events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters over users: every user emitting more than
    HH_PCT% of the mean events-per-user, with count and its multiple
    of the mean — the abusive-client / hot-key audit a pipeline runs
    before choosing salts.

    Scale shape: ONE map-side-combined count at user grain (the only
    pass over the raw events), a 1-row (total, n_users) broadcast,
    and an exact integer-arithmetic threshold — evaluated in
    DECIMAL(38,0), not longs, because n * n_users * 100 exceeds 2^63
    exactly in the hot-user regime the query audits for (n ~ 1e9
    events from one abuser, n_users ~ 1e9) and non-ANSI long
    arithmetic would wrap silently and flip the comparison (the
    DuckDB oracle promotes to HUGEINT and is immune; round-7
    advisor fix). The sketch alternative (Misra-Gries /
    space-saving) trades exactness for sub-linear state; the exact
    form is one shuffle at user grain — the same cost class as any
    per-user aggregate.
    """
    ev = events(spark, sf_dir).select("user_id")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = per_user.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    big = "decimal(38,0)"
    return (
        per_user.crossJoin(F.broadcast(tot))
        .filter(
            F.col("n").cast(big) * F.col("n_users").cast(big) * 100
            > F.col("total").cast(big) * HH_PCT
        )
        .select(
            "user_id",
            "n",
            # double×double, not long×long-then-cast: each factor is
            # exact in double (< 2^53) so the one rounding of the
            # product equals CAST(exact_product AS DOUBLE) — same
            # value as the oracle's HUGEINT-then-cast, without the
            # long-wrap exposure
            F.round(
                F.col("n").cast("double")
                * F.col("n_users").cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("x_mean"),
        )
        .orderBy(F.desc("n"), F.asc("user_id"))
    )


# --- gaps and islands ------------------------------------------------

STREAK_TOPN = 100


def q_users_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands shape: distinct active days, then
    day - row_number() is constant within a consecutive run, so one
    grouping on that island key yields every streak; a per-user argmax
    picks the longest (ties: earliest start). Top STREAK_TOPN rows by
    (streak_days desc, user_id asc) = TakeOrderedAndProject.

    Scale shape: the raw events reduce to distinct (user, day) FIRST
    (map-side combine), both windows partition BY USER over that
    bounded per-user day list — no global sort anywhere; the final
    top-k never materializes a full sort.
    """
    days = (
        events(spark, sf_dir)
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn("g", F.date_sub(F.col("d"), F.row_number().over(w)))
    streaks = islands.groupBy("user_id", "g").agg(
        F.count(F.lit(1)).cast("long").alias("streak_days"),
        F.min("d").alias("start_day"),
        F.max("d").alias("end_day"),
    )
    pick = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), F.asc("start_day")
    )
    return (
        streaks.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "streak_days",
            F.date_format("start_day", "yyyy-MM-dd").alias("start_day"),
            F.date_format("end_day", "yyyy-MM-dd").alias("end_day"),
        )
        .orderBy(F.desc("streak_days"), F.asc("user_id"))
        .limit(STREAK_TOPN)
    )


# --- wide -> long metrics reshaping (UNPIVOT/melt) --------------------


def q_daily_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day activity metrics reshaped wide -> long with the native
    UNPIVOT (DataFrame.unpivot / SQL UNPIVOT): one (day, metric,
    value) row per metric — the shape metric stores and plotting
    layers ingest, produced without a per-metric rescan.

    Scale shape: ONE day-grain aggregate computes all three metrics
    (count, exact distinct, rounded sum) in a single pass; unpivot is
    an Expand over the day-grain frame (|days| x 3 rows out), the
    same zero-shuffle operator grouping-sets use. Counts present as
    DOUBLE because the long value column must be one type.
    """
    ev = events(spark, sf_dir)
    wide = (
        ev.select(F.to_date("ts").alias("d"), "user_id", "value")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_events"),
            F.countDistinct("user_id").cast("double").alias("n_users"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    return (
        wide.unpivot(
            ids=["d"],
            values=["n_events", "n_users", "sum_value"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"), "metric", "value"
        )
        .orderBy("day", "metric")
    )


# --- daily-series autocorrelation (exact integer moments) -------------

ACF_LAGS = (1, 7)


def q_events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 / lag-7 autocorrelation of each event type's daily count
    series — does yesterday (or last week) predict today? The
    weekly-seasonality detector a monitoring pipeline runs over its
    own counters.

    Exactness: the ACF is a ratio of integer polynomials in the
    series' exact sums — n, Σx, Σx², and per lag Σ(x_t·x_{t+k}) plus
    the two truncated edge sums. Every term is integer arithmetic on
    the DENSE zero-filled day series (a sparse series would misalign
    lags), so both engines reduce to ONE double division of identical
    integers — the lineitem-corr-matrix discipline applied to time
    series. Counts are day-grain; at 100 TB the terms outgrow longs
    with the corpus, so they widen through DECIMAL(38,0) before the
    polynomial.

    Scale shape: events reduce to (type, day) counts once; the dense
    spine is |days| rows per type; lags come from one lead window per
    type partition (type-bounded, never global); the polynomial is a
    per-type 1-row aggregate.
    """
    ev = events(spark, sf_dir)
    counts = (
        ev.select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    types = counts.select("event_type").distinct()
    dense = (
        types.crossJoin(spine)
        .join(counts, ["event_type", "day"], "left")
        .select(
            "event_type", "day", F.coalesce("x", F.lit(0)).alias("x")
        )
    )
    by_type = Window.partitionBy("event_type").orderBy("day")
    big = "decimal(38,0)"
    lagged = dense.select(
        "event_type",
        F.col("x").cast(big).alias("x"),
        *[
            F.lead("x", k).over(by_type).cast(big).alias(f"y{k}")
            for k in ACF_LAGS
        ],
    )
    aggs = [
        F.count(F.lit(1)).cast(big).alias("n"),
        F.sum("x").cast(big).alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast(big).alias("sxx"),
    ]
    for k in ACF_LAGS:
        y = F.col(f"y{k}")
        aggs += [
            F.sum(F.col("x") * y).cast(big).alias(f"sxy{k}"),
            F.sum(F.when(y.isNotNull(), F.col("x"))).cast(big).alias(f"sa{k}"),
            F.sum(y).cast(big).alias(f"sb{k}"),
        ]
    m = lagged.groupBy("event_type").agg(*aggs)
    cols = [F.col("event_type")]
    for k in ACF_LAGS:
        num = (
            F.col("n") * F.col("n") * F.col(f"sxy{k}")
            - F.col("n") * F.col("sx") * (F.col(f"sa{k}") + F.col(f"sb{k}"))
            + (F.col("n") - F.lit(k)) * F.col("sx") * F.col("sx")
        )
        den = F.col("n") * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        cols.append(
            F.round(num.cast("double") / den.cast("double"), 6).alias(f"acf{k}")
        )
    return m.select(*cols).orderBy("event_type")
