"""Event-sequence analytics: ordered funnel + retention cohorts.

- funnel: how many users did signup -> click -> purchase IN ORDER.
  Stage timestamps are per-user minima with an ordering constraint
  (first click after first signup, first purchase after that click);
  one groupBy per user, conditional min aggregates, then a global
  rollup — no self-joins, no windows.
- retention: users grouped by first-active-day cohort x day offset.
  Two hash aggregations; the cohort join is an equi-join on user_id
  between two already-user-grained sides — per-user state grows with
  the corpus, so it is NOT forced broadcast (AQE upgrades small
  cases); both sides arrive partitioned by user_id from their own
  aggregations, so no extra shuffle either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.sources.tables import events


def q_funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per funnel stage with the count of users who reached
    it in order."""
    ev = events(spark, sf_dir).select("user_id", "event_type", "ts")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup")
    )
    # first click strictly after the first signup, then first
    # purchase strictly after that click
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ts_c")
    )
    step2 = (
        per_user.join(clicks, "user_id", "left")
        .filter(F.col("t_signup").isNotNull() & (F.col("ts_c") > F.col("t_signup")))
        .groupBy("user_id")
        .agg(F.min("ts_c").alias("t_click"), F.first("t_signup").alias("t_signup"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ts_p")
    )
    step3 = (
        step2.join(purchases, "user_id", "left")
        .filter(F.col("ts_p") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts_p").alias("t_purchase"))
    )
    # one composed plan: three stage counts unpivoted to rows —
    # nothing materializes on the driver
    joined = (
        per_user.filter(F.col("t_signup").isNotNull())
        .join(step2.select("user_id", "t_click"), "user_id", "left")
        .join(step3.select("user_id", "t_purchase"), "user_id", "left")
    )
    counts = joined.agg(
        F.count("t_signup").alias("n1"),
        F.count("t_click").alias("n2"),
        F.count("t_purchase").alias("n3"),
    )
    return counts.selectExpr(
        "stack(3, '1_signup', n1, '2_click_after', n2, "
        "'3_purchase_after', n3) AS (stage, n_users)"
    ).orderBy("stage")


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_day, day_offset) -> active user counts."""
    ev = events(spark, sf_dir).select(
        "user_id", F.to_date("ts").alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.distinct()
    return (
        active.join(first_day, "user_id")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: for each ordered pair of
    consecutive events of the SAME user, count (from_type, to_type)
    and its probability among transitions leaving from_type — the
    first-order Markov model of user behavior (the sequence-mining
    counterpart of the funnel above, which pins one fixed path).

    Determinism: consecutive = next event by (ts, event_id) within
    the user partition, so simultaneous events order identically in
    both engines; counts are exact BIGINTs and p is one IEEE division
    of exact longs.

    Scale shape: ONE window pass over user partitions (lead), then a
    types^2-sized hash aggregation; the per-from totals come from a
    second tiny aggregation joined back broadcast-sized. No
    corpus-sized join, no driver state.
    """
    from pyspark.sql import Window

    from projet_etl_spark.sources.tables import events

    ev = events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("n_from").cast("double")).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


def q_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel depth WITHIN each user session: per 15-minute-gap
    session, the deepest ordered stage reached (signup → click after
    it → purchase after that), aggregated to session counts per
    depth — the global funnel asks "did the user ever convert";
    this asks "does a single session convert", the
    product-analytics variant.

    Scale shape: the gaps-and-islands numbering and the three staged
    minima are all windows over the SAME (user_id) — then
    (user_id, session_no) — partitioning, so the whole pipeline is
    one shuffle + partition-local sorts; no joins. The final
    aggregate reduces sessions to at most four depth rows.
    """
    from pyspark.sql import Window

    from projet_etl_spark.operators.events_windows import SESSION_GAP_MIN

    ev = events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(by_user)
            > SESSION_GAP_MIN * 60 * 1_000_000,
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("new_session")
        .over(by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    w = Window.partitionBy("user_id", "session_no")
    t1 = numbered.withColumn(
        "t1",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
    )
    t2 = t1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    t3 = t2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    sessions = t3.groupBy("user_id", "session_no").agg(
        F.max(F.col("t3").isNotNull().cast("int")).alias("s3"),
        F.max(F.col("t2").isNotNull().cast("int")).alias("s2"),
        F.max(F.col("t1").isNotNull().cast("int")).alias("s1"),
    )
    depth = (
        F.when(F.col("s3") == 1, 3)
        .when(F.col("s2") == 1, 2)
        .when(F.col("s1") == 1, 1)
        .otherwise(0)
        .cast("long")
    )
    return (
        sessions.select(depth.alias("depth"))
        .groupBy("depth")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy("depth")
    )
