"""Targeted semantics tests for the round-5b operators, beyond the
registry-wide oracle sweep (test_parity.py): gap-fill on a crafted
sparse series, incremental-dedup flag algebra, A-ES weighted-sample
determinism and key math, decile partition laws, unigram-LM score
bounds, and the Q18 / grouping-sets invariants.
"""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from projet_etl_spark.operators import curation, dedup, olap, star, stats, textstats
from tests.conftest import SF_SMALL


# --- events-gap-fill on a crafted sparse series ---------------------


def _write_micro_events(spark, root):
    """Two types over a 4-day span: type A observed on days 1, 2, 4
    (gap on day 3); type B observed on days 2, 3 only (leading gap on
    day 1, trailing gap on day 4)."""
    rows = [
        (1, datetime.datetime(2024, 1, 1, 9), 1, "A", 10.0, "{}"),
        (2, datetime.datetime(2024, 1, 2, 9), 1, "A", 20.0, "{}"),
        (3, datetime.datetime(2024, 1, 4, 9), 1, "A", 40.0, "{}"),
        (4, datetime.datetime(2024, 1, 2, 9), 2, "B", 5.0, "{}"),
        (5, datetime.datetime(2024, 1, 3, 9), 2, "B", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{root}/events.parquet")


def test_gap_fill_zero_fill_and_locf(spark, tmp_path):
    _write_micro_events(spark, str(tmp_path))
    out = {
        (r["event_type"], r["day"]): r
        for r in stats.q_events_gap_fill(spark, str(tmp_path)).collect()
    }
    # dense spine: 2 types x 4 days
    assert len(out) == 8
    gap_a3 = out[("A", "2024-01-03")]
    assert (gap_a3["n"], gap_a3["is_gap"]) == (0, 1)
    # locf carries day-2 mean across the day-3 gap
    assert gap_a3["filled_avg"] == pytest.approx(20.0)
    # trailing gap for B carries day-3 mean
    gap_b4 = out[("B", "2024-01-04")]
    assert (gap_b4["n"], gap_b4["is_gap"]) == (0, 1)
    assert gap_b4["filled_avg"] == pytest.approx(7.0)
    # leading gap for B has nothing to carry -> NULL
    gap_b1 = out[("B", "2024-01-01")]
    assert (gap_b1["n"], gap_b1["is_gap"], gap_b1["filled_avg"]) == (0, 1, None)
    # observed days pass through untouched
    assert out[("A", "2024-01-04")]["filled_avg"] == pytest.approx(40.0)
    assert out[("A", "2024-01-04")]["is_gap"] == 0


# --- dedup-incremental flag algebra ---------------------------------


@pytest.fixture(scope="module")
def incremental(spark):
    return dedup.q_dedup_incremental(spark, SF_SMALL).collect()


def test_incremental_keep_iff_unflagged(incremental):
    for r in incremental:
        assert r["keep"] == int(r["dup_of_corpus"] == 0 and r["dup_in_batch"] == 0)


def test_incremental_one_winner_per_batch_fp(incremental):
    by_fp: dict[str, list] = {}
    for r in incremental:
        by_fp.setdefault(r["fp"], []).append(r)
    for rows in by_fp.values():
        winners = [r for r in rows if r["dup_in_batch"] == 0]
        assert len(winners) == 1
        assert winners[0]["doc_id"] == min(r["doc_id"] for r in rows)


def test_incremental_corpus_flag_matches_store(spark, incremental):
    docs = dedup.load_table(spark, SF_SMALL, "documents")
    from projet_etl_spark.functions.text import fingerprint, portable_hash60

    staged = docs.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp"),
        (portable_hash60(F.col("text")) % F.lit(100)).alias("bucket"),
    ).collect()
    store = {r["fp"] for r in staged if r["bucket"] >= dedup.INCREMENTAL_PCT}
    incoming_ids = {r["doc_id"] for r in staged if r["bucket"] < dedup.INCREMENTAL_PCT}
    assert {r["doc_id"] for r in incremental} == incoming_ids
    for r in incremental:
        assert r["dup_of_corpus"] == int(r["fp"] in store)


# --- sample-weighted-n ----------------------------------------------


def test_weighted_sample_deterministic_and_key_math(spark):
    a = curation.q_sample_weighted_n(spark, SF_SMALL).collect()
    b = curation.q_sample_weighted_n(spark, SF_SMALL).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == curation.SAMPLE_W_N
    # recompute the A-ES key for the selected docs from first principles
    from projet_etl_spark.functions.text import H30_MOD

    docs = {
        r["doc_id"]: r
        for r in dedup.load_table(spark, SF_SMALL, "documents")
        .withColumn(
            "h30",
            (
                F.conv(F.substring(F.md5(F.encode(F.col("text"), "UTF-8")), 1, 15), 16, 10)
                .cast("long")
                % F.lit(H30_MOD)
            ),
        )
        .select("doc_id", "n_chars", "h30")
        .collect()
    }
    for r in a[:10]:
        d = docs[r["doc_id"]]
        u = (d["h30"] + 1) / float(H30_MOD)
        expect = round(-math.log(u) / max(d["n_chars"], 1), 9)
        assert r["skey"] == pytest.approx(expect, abs=1e-9)


def test_weighted_sample_biases_toward_long_docs(spark):
    sample = curation.q_sample_weighted_n(spark, SF_SMALL)
    mean_sampled = sample.agg(F.avg("weight")).first()[0]
    mean_all = (
        dedup.load_table(spark, SF_SMALL, "documents").agg(F.avg("n_chars")).first()[0]
    )
    # length-proportional sampling must pull the sampled mean above
    # the corpus mean (48..553-char docs, 50/500 draw: the gap is
    # large; this is a sanity check, not a statistical test)
    assert mean_sampled > mean_all


# --- customer-spend-deciles -----------------------------------------


def test_deciles_partition_and_order(spark):
    rows = star.q_customer_spend_deciles(spark, SF_SMALL).collect()
    n_customers = (
        dedup.load_table(spark, SF_SMALL, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_customers
    assert [r["decile"] for r in rows] == sorted(r["decile"] for r in rows)
    # buckets are totally ordered: every decile's max is below the
    # next decile's min (strict boundary comparison)
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_spend"] <= hi["min_spend"]
        assert lo["min_spend"] <= lo["max_spend"]


# --- text-unigram-logprob -------------------------------------------


def test_unigram_logprob_bounds(spark):
    out = textstats.q_text_unigram_logprob(spark, SF_SMALL)
    rows = out.collect()
    assert len(rows) == 500
    total = sum(r["n_tokens"] for r in rows)
    floor = math.log(1.0 / total)
    for r in rows:
        # every per-token logprob lies in [ln(1/N), 0), so the mean does too
        assert floor - 1e-6 <= r["avg_logprob"] < 0


def test_unigram_token_grain_matches_token_count(spark):
    lm = textstats.q_text_unigram_logprob(spark, SF_SMALL).select(
        "doc_id", F.col("n_tokens").alias("lm_n")
    )
    tc = textstats.q_text_token_count(spark, SF_SMALL).select(
        "doc_id", F.col("n_tokens").alias("tc_n")
    )
    diff = lm.join(tc, "doc_id").filter(F.col("lm_n") != F.col("tc_n")).count()
    assert diff == 0


# --- top-large-orders / sales-grouping-sets -------------------------


def test_top_large_orders_invariants(spark):
    rows = star.q_top_large_orders(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= star.LARGE_ORDER_TOPN
    assert len({r["o_orderkey"] for r in rows}) == len(rows)
    for r in rows:
        assert r["sum_qty"] > star.LARGE_ORDER_QTY
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_grouping_sets_covers_both_dimensions(spark):
    from projet_etl_spark.sources.tables import points_de_vente

    rows = olap.q_sales_grouping_sets(spark, SF_SMALL).collect()
    pv = points_de_vente(spark, SF_SMALL)
    n_rows = pv.count()
    n_cats = pv.select("catid").distinct().count()
    n_fabs = pv.select("fabid").distinct().count()
    assert len(rows) == n_cats + n_fabs
    assert {r["gid"] for r in rows} == {1, 2}
    # each grouping set independently partitions the fact table
    assert sum(r["n_ventes"] for r in rows if r["gid"] == 1) == n_rows
    assert sum(r["n_ventes"] for r in rows if r["gid"] == 2) == n_rows


# --- events-session-overlap / user-state-history --------------------


def _write_overlap_events(spark, root):
    """user 1: one error burst 10:00-10:30; views at 10:15+10:20 (one
    session, overlaps the burst by 5 min) and 23:30 (separate session
    past the 12 h gap, no overlap). user 2: error and view hours
    apart -> point intervals, no overlap."""
    rows = [
        (1, datetime.datetime(2024, 1, 1, 10, 0), 1, "error", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 10, 30), 1, "error", 1.0, "{}"),
        (3, datetime.datetime(2024, 1, 1, 10, 15), 1, "view", 1.0, "{}"),
        (4, datetime.datetime(2024, 1, 1, 10, 20), 1, "view", 1.0, "{}"),
        (5, datetime.datetime(2024, 1, 2, 23, 30), 1, "view", 1.0, "{}"),
        (6, datetime.datetime(2024, 1, 1, 9, 0), 2, "error", 1.0, "{}"),
        (7, datetime.datetime(2024, 1, 1, 12, 0), 2, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{root}/events.parquet")


def test_session_overlap_micro(spark, tmp_path):
    from projet_etl_spark.operators import rangejoin

    _write_overlap_events(spark, str(tmp_path))
    rows = rangejoin.q_events_session_overlap(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 1
    assert (r["err_start"], r["err_end"]) == ("2024-01-01 10:00:00", "2024-01-01 10:30:00")
    assert (r["view_start"], r["view_end"]) == ("2024-01-01 10:15:00", "2024-01-01 10:20:00")
    assert r["overlap_us"] == 5 * 60 * 1_000_000


def test_session_overlap_plan_is_equi_join(spark):
    from projet_etl_spark.operators import rangejoin

    plan = (
        rangejoin.q_events_session_overlap(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the interval predicates must ride an equi-join on user_id, not
    # a nested-loop plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_user_state_history_micro(spark, tmp_path):
    from projet_etl_spark.operators import events_windows

    rows = [
        (1, datetime.datetime(2024, 1, 1, 9), 1, "view", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 10), 1, "view", 1.0, "{}"),
        (3, datetime.datetime(2024, 1, 1, 11), 1, "click", 1.0, "{}"),
        (4, datetime.datetime(2024, 1, 1, 12), 1, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = events_windows.q_user_state_history(spark, str(tmp_path)).collect()
    # runs collapse: view(9-11), click(11-12), view(12-open)
    assert [(r["state"], r["version_no"], r["valid_from"], r["valid_to"], r["is_current"]) for r in out] == [
        ("view", 1, "2024-01-01 09:00:00", "2024-01-01 11:00:00", 0),
        ("click", 2, "2024-01-01 11:00:00", "2024-01-01 12:00:00", 0),
        ("view", 3, "2024-01-01 12:00:00", None, 1),
    ]


def test_user_state_history_single_shuffle(spark):
    from projet_etl_spark.operators import events_windows

    plan = (
        events_windows.q_user_state_history(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the lag pass and the lead/row_number pass share one hash
    # exchange on user_id (the final orderBy adds a range exchange)
    assert plan.count("Exchange hashpartitioning") == 1


# --- distinct-kmv / time-weighted avg / OHLC ------------------------


def test_kmv_small_set_rule_and_tolerance(spark):
    from projet_etl_spark.operators import sketches

    rows = sketches.q_distinct_kmv(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        if r["n_exact"] < sketches.KMV_K:
            # below K distinct hashes the sketch is exact by rule
            assert r["n_est"] == pytest.approx(float(r["n_exact"]))
            assert r["rel_err"] == pytest.approx(0.0)
        else:
            # K=64 -> stderr ~ 1/sqrt(K-2) ~ 13%; generous 3-sigma cap
            assert r["rel_err"] < 0.4


def test_kmv_minima_merge_like_a_sketch():
    """Mergeability (the property that makes KMV a sketch): the K
    minima of a union equal the K minima of the parts' K-minima
    union."""
    import hashlib

    K = 16
    ids = [f"u{i}" for i in range(500)]
    h = sorted(int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in ids)
    half_a = sorted(
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in ids[:250]
    )[:K]
    half_b = sorted(
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in ids[250:]
    )[:K]
    assert sorted(set(half_a) | set(half_b))[:K] == h[:K]


def test_time_weighted_avg_micro(spark, tmp_path):
    from projet_etl_spark.operators import events_windows

    rows = [
        # user 1: value 10 held 1h, then 30 held 3h, last obs unweighted
        (1, datetime.datetime(2024, 1, 1, 0), 1, "view", 10.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 1), 1, "view", 30.0, "{}"),
        (3, datetime.datetime(2024, 1, 1, 4), 1, "view", 99.0, "{}"),
        # user 2: single observation -> zero span, NULL twa
        (4, datetime.datetime(2024, 1, 1, 2), 2, "view", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["user_id"]: r for r in
           events_windows.q_events_time_weighted_avg(spark, str(tmp_path)).collect()}
    hour_us = 3600 * 1_000_000
    assert out[1]["span_us"] == 4 * hour_us
    # (10*1h + 30*3h) / 4h = 25
    assert out[1]["twa"] == pytest.approx(25.0)
    assert (out[2]["n_obs"], out[2]["span_us"], out[2]["twa"]) == (1, 0, None)


def test_ohlc_open_close_tie_break(spark, tmp_path):
    from projet_etl_spark.operators import events_windows

    t = datetime.datetime(2024, 1, 1, 9, 0)
    rows = [
        # same timestamp: event_id must decide open (id 1) and close (id 3)
        (1, t, 1, "view", 5.0, "{}"),
        (2, t, 1, "view", 50.0, "{}"),
        (3, t, 1, "view", 8.0, "{}"),
        (4, datetime.datetime(2024, 1, 1, 9, 30), 1, "view", 2.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = events_windows.q_events_ohlc_hourly(spark, str(tmp_path)).collect()
    assert len(out) == 1
    bar = out[0]
    assert (bar["open"], bar["high"], bar["low"], bar["close"]) == (5.0, 50.0, 2.0, 2.0)
    assert bar["n_events"] == 4 and bar["volume"] == pytest.approx(65.0)


def test_props_parse_malformed_json_counts_not_drops(spark, tmp_path):
    """Spark's PERMISSIVE from_json and the json_valid-guarded oracle
    agree on malformed rows: NULL k, counted in n_bad."""
    import duckdb

    from projet_etl_spark.plans.registry import REGISTRY

    t = datetime.datetime(2024, 1, 1, 9)
    rows = [
        (1, t, 1, "view", 1.0, '{"k": 7}'),
        (2, t, 1, "view", 1.0, "not json"),
        (3, t, 1, "view", 1.0, '{"other": 1}'),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = stats.q_events_props_parse(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["n_bad"], r["min_k"], r["max_k"], r["sum_k"]) == (3, 2, 7, 7, 7)
    # same numbers from the oracle on the same file
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    got = con.execute(REGISTRY["events-props-parse"].oracle).fetchall()
    assert got == [("view", 3, 2, 7, 7, 7, 7.0)]


def test_training_export_conserves_the_clean_corpus(spark):
    """The shard manifest and the per-language audit are two rollups
    of the SAME survivor set — totals must agree exactly."""
    from projet_etl_spark.operators import corpus

    manifest = corpus.q_pipeline_training_export(spark, SF_SMALL).collect()
    audit = corpus.q_pipeline_clean_corpus(spark, SF_SMALL).collect()
    assert sum(r["n_docs"] for r in manifest) == sum(r["n_docs"] for r in audit)
    assert sum(r["n_tokens"] for r in manifest) == sum(r["n_tokens"] for r in audit)
    # packs are dense per shard: ids start at 0 with no holes
    by_shard = {}
    for r in manifest:
        by_shard.setdefault(r["shard"], []).append(r["pack_id"])
    for ids in by_shard.values():
        assert sorted(ids) == list(range(len(ids)))


def test_range_frame_is_calendar_not_rows(spark, tmp_path):
    """On a sparse series the RANGE frame must exclude observations
    older than 7 calendar days even when they are adjacent rows."""
    rows = [
        (1, datetime.datetime(2024, 1, 1, 9), 1, "A", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 10, 9), 1, "A", 1.0, "{}"),
        (3, datetime.datetime(2024, 1, 12, 9), 1, "A", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["day"]: r for r in stats.q_daily_trailing_range(spark, str(tmp_path)).collect()}
    # day 10: Jan 1 is 9 days back -> outside the 7-day range frame
    assert (out["2024-01-10"]["sum_7d"], out["2024-01-10"]["days_present_7d"]) == (1, 1)
    # day 12: Jan 10 is inside, Jan 1 outside
    assert (out["2024-01-12"]["sum_7d"], out["2024-01-12"]["days_present_7d"]) == (2, 2)


def test_intersect_is_subset_of_both_categories(spark):
    from projet_etl_spark.params import DEFAULTS
    from projet_etl_spark.sources.tables import points_de_vente

    both = {r["magid"] for r in olap.q_stores_in_both_categories(spark, SF_SMALL).collect()}
    pv = points_de_vente(spark, SF_SMALL)
    a = {r["magid"] for r in pv.filter(F.col("catid") == DEFAULTS["cat_id"]).select("magid").distinct().collect()}
    b = {r["magid"] for r in pv.filter(F.col("catid") == olap.CAT_B).select("magid").distinct().collect()}
    assert both == (a & b)
    assert both  # non-degenerate fixture


def test_edit_distance_verifies_candidates(spark):
    rows = dedup.q_dedup_edit_distance(spark, SF_SMALL).collect()
    assert rows, "fixture has near-dup pairs"
    # near-dup candidates are genuinely close at the character level
    # (fixture near-dups are small in-place edits: rel_dist << cap)
    assert min(r["rel_dist"] for r in rows) < 0.05
    for r in rows:
        assert r["rel_dist"] <= dedup.EDIT_REL_THRESHOLD
        assert r["doc_a"] < r["doc_b"]
    # the levenshtein pass only ever scores LSH candidates
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidates(
            dedup._doc_shingles(spark, SF_SMALL)
        ).collect()
    }
    assert {(r["doc_a"], r["doc_b"]) for r in rows} <= cands


def test_revenue_share_sums_to_one(spark):
    rows = star.q_revenue_share_by_nation(spark, SF_SMALL).collect()
    assert rows
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-5)
    for r in rows:
        assert 0.0 < r["share"] <= 1.0


def test_psi_flags_the_drifted_source(spark, tmp_path):
    """A source whose length profile diverges from the corpus must
    score a strictly higher PSI than in-distribution sources; PSI is
    non-negative by construction (sum of (p-q)ln(p/q) terms)."""
    rows = []
    did = 0
    # two well-behaved sources: lengths spread across low buckets
    for src in ("a", "b"):
        for n in (60, 120, 180, 240, 300, 60, 120, 180, 240, 300):
            did += 1
            rows.append((did, "x" * 10, "en", src, n))
    # drifted source: everything in the top bucket
    for _ in range(10):
        did += 1
        rows.append((did, "x" * 10, "en", "c", 590))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["source"]: r["psi"] for r in
           textstats.q_docs_length_drift(spark, str(tmp_path)).collect()}
    assert out["c"] > out["a"] and out["c"] > out["b"]
    assert all(v >= 0 for v in out.values())


def test_robust_anomalies_flag_whale_not_constant_stratum(spark, tmp_path):
    rows = [
        # type A: tight cluster + one whale
        *[(i, datetime.datetime(2024, 1, 1, 9, i), 1, "A", 10.0 + (i % 3), "{}")
          for i in range(1, 21)],
        (99, datetime.datetime(2024, 1, 1, 12), 1, "A", 500.0, "{}"),
        # type B: constant -> MAD 0 -> no anomalies by guard
        *[(200 + i, datetime.datetime(2024, 1, 1, 9, i), 2, "B", 7.0, "{}")
          for i in range(1, 11)],
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = stats.q_events_anomalies_robust(spark, str(tmp_path)).collect()
    assert {r["event_id"] for r in out} == {99}
    assert all(r["event_type"] == "A" for r in out)


def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    from projet_etl_spark.operators.star import _CORR_COLS, q_lineitem_corr_matrix

    got = {
        (r["var_a"], r["var_b"]): r["corr"]
        for r in q_lineitem_corr_matrix(spark, SF_SMALL).collect()
    }
    li = dedup.load_table(spark, SF_SMALL, "lineitem").select(*_CORR_COLS).collect()
    mat = np.corrcoef(np.array([[getattr(r, c) for c in _CORR_COLS] for r in li]).T)
    for i, a in enumerate(_CORR_COLS):
        for j, b in enumerate(_CORR_COLS):
            if i < j:
                assert got[(a, b)] == pytest.approx(mat[i, j], abs=1e-5)


def test_daily_percentiles_cover_all_events(spark):
    rows = stats.q_daily_value_percentiles(spark, SF_SMALL).collect()
    from projet_etl_spark.sources.tables import events as events_table

    assert sum(r["n"] for r in rows) == events_table(spark, SF_SMALL).count()
    for r in rows:
        assert r["p50"] <= r["p95"]


def test_users_cumulative_staggered_arrivals(spark, tmp_path):
    from projet_etl_spark.operators import events_windows

    rows = [
        (1, datetime.datetime(2024, 1, 1, 9), 1, "view", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 2, 9), 1, "view", 1.0, "{}"),  # not new
        (3, datetime.datetime(2024, 1, 2, 9), 2, "view", 1.0, "{}"),
        (4, datetime.datetime(2024, 1, 4, 9), 3, "view", 1.0, "{}"),
        (5, datetime.datetime(2024, 1, 4, 9), 1, "view", 1.0, "{}"),  # not new
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = [(r["day"], r["new_users"], r["users_to_date"]) for r in
           events_windows.q_users_cumulative(spark, str(tmp_path)).collect()]
    assert out == [
        ("2024-01-01", 1, 1),
        ("2024-01-02", 1, 2),
        ("2024-01-04", 1, 3),
    ]


def test_q6_filters_reach_the_scan(spark):
    plan = (
        star.q_forecast_revenue_change(spark, SF_SMALL)
        ._jdf.queryExecution()
        .explainString(
            star.q_forecast_revenue_change(spark, SF_SMALL)
            .sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    )
    assert "PushedFilters" in plan
    # the quantity and discount predicates must appear among pushed filters
    assert "l_quantity" in plan.split("PushedFilters")[1][:400]


def test_top_returned_customers_invariants(spark):
    rows = star.q_top_returned_customers(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= star.RETURNED_TOPN
    revs = [r["returned_revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert len({r["c_custkey"] for r in rows}) == len(rows)


def test_q19_superset_prefilters_change_nothing(spark):
    """The factored-out brand/quantity pushdown predicates are pure
    optimizations: the result must equal the unoptimized OR-join."""
    from projet_etl_spark.operators.star import Q19_BLOCKS, q_disjunctive_parts_revenue
    from projet_etl_spark.sources.tables import load_table

    got = q_disjunctive_parts_revenue(spark, SF_SMALL).first()
    li = load_table(spark, SF_SMALL, "lineitem")
    part = load_table(spark, SF_SMALL, "part")
    blocks = None
    for brand, slo, shi, qlo, qhi in Q19_BLOCKS:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )
        blocks = c if blocks is None else (blocks | c)
    want = (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(blocks)
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
        .first()
    )
    assert (got["revenue"], got["n_items"]) == (want["revenue"], want["n_items"])


def test_promo_share_is_a_percentage(spark):
    r = star.q_promo_revenue_share(spark, SF_SMALL).first()
    assert 0.0 < r["promo_share"] < 100.0
    assert r["promo_revenue"] < r["total_revenue"]


def test_session_funnel_orders_stages_within_session(spark, tmp_path):
    from projet_etl_spark.operators import funnel

    t0 = datetime.datetime(2024, 1, 1, 9, 0)
    m = datetime.timedelta(minutes=1)
    rows = [
        # user 1 session: full ordered funnel -> depth 3
        (1, t0, 1, "signup", 1.0, "{}"),
        (2, t0 + m, 1, "click", 1.0, "{}"),
        (3, t0 + 2 * m, 1, "purchase", 1.0, "{}"),
        # user 2 session: purchase BEFORE click -> depth 2 only
        (4, t0, 2, "signup", 1.0, "{}"),
        (5, t0 + m, 2, "purchase", 1.0, "{}"),
        (6, t0 + 2 * m, 2, "click", 1.0, "{}"),
        # user 3 session: no signup -> depth 0 even with click+purchase
        (7, t0, 3, "click", 1.0, "{}"),
        (8, t0 + m, 3, "purchase", 1.0, "{}"),
        # user 1 second session (>15 min later): signup only -> depth 1
        (9, t0 + datetime.timedelta(hours=2), 1, "signup", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["depth"]: r["n_sessions"] for r in
           funnel.q_session_funnel(spark, str(tmp_path)).collect()}
    assert out == {0: 1, 1: 1, 2: 1, 3: 1}


def test_cusum_closed_form_equals_recursion_and_flags_shift(spark, tmp_path):
    """A level shift must push the CUSUM over the threshold, and the
    window-based closed form must equal the textbook recursion
    s_t = max(0, s_{t-1} + z_t - k) recomputed in Python."""
    import math

    rows = []
    eid = 0
    # 14 days at ~10 events/day, then 7 days at 30/day (the shift)
    for day in range(1, 22):
        n = 10 if day <= 14 else 30
        for i in range(n):
            eid += 1
            rows.append(
                (eid, datetime.datetime(2024, 1, day, 9, 0, i), 1, "A", 1.0, "{}")
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = stats.q_events_cusum_drift(spark, str(tmp_path)).collect()
    assert [r["day"] for r in out] == sorted(r["day"] for r in out)
    # recursion from first principles on the same daily counts
    counts = [r["n"] for r in out]
    days = len(counts)
    mean = sum(counts) / days
    var = sum(c * c for c in counts) / days - mean * mean
    sd = math.sqrt(var)
    s = 0.0
    for r, c in zip(out, counts):
        z = (c - mean) / sd
        s = max(0.0, s + round(z - stats.CUSUM_K, 6))
        assert r["cusum"] == pytest.approx(round(s, 6), abs=2e-6)
    # pre-shift days calm, post-shift drift flagged
    assert all(r["drifted"] == 0 for r in out[:14])
    assert any(r["drifted"] == 1 for r in out[14:])


def test_bollinger_bands_bound_the_mean_and_flag_spikes(spark, tmp_path):
    rows = []
    eid = 0
    # 13 calm days at 10/day, one spike day at 40
    for day in range(1, 15):
        n = 40 if day == 14 else 10
        for i in range(n):
            eid += 1
            rows.append(
                (eid, datetime.datetime(2024, 1, day, 9, 0, i), 1, "A", 1.0, "{}")
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["day"]: r for r in stats.q_daily_bollinger(spark, str(tmp_path)).collect()}
    for r in out.values():
        assert r["band_lo"] <= r["ma"] <= r["band_hi"]
    # calm days inside the band (zero variance start: band collapses
    # to the mean and n == ma)
    assert all(out[f"2024-01-{d:02d}"]["outside"] == 0 for d in range(1, 14))
    # the spike bursts through its trailing band
    assert out["2024-01-14"]["outside"] == 1


def test_ewma_matches_direct_weighting(spark, tmp_path):
    """The frame-list fold must equal the finite-window EWMA computed
    directly in Python, and react faster than the plain MA after a
    level shift."""
    rows = []
    eid = 0
    counts = [10] * 10 + [30] * 5
    for day, n in enumerate(counts, start=1):
        for i in range(n):
            eid += 1
            rows.append(
                (eid, datetime.datetime(2024, 1, day, 9, 0, i), 1, "A", 1.0, "{}")
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = stats.q_daily_ewma(spark, str(tmp_path)).collect()
    decay = 1.0 - stats.EWMA_ALPHA
    for t, r in enumerate(out):
        frame = counts[max(0, t - stats.EWMA_WINDOW + 1) : t + 1]
        wts = [decay ** (len(frame) - j) for j in range(1, len(frame) + 1)]
        want = sum(x * w for x, w in zip(frame, wts)) / sum(wts)
        assert r["ewma"] == pytest.approx(want, abs=1e-5), r["day"]
    # day 11 (first shifted day): EWMA has moved further toward 30
    # than the uniform 7-day MA would
    ewma_11 = out[10]["ewma"]
    ma_11 = sum(counts[4:11]) / 7
    assert ewma_11 > ma_11


def test_zipf_fit_matches_numpy_polyfit(spark):
    import numpy as np

    r = textstats.q_token_zipf_fit(spark, SF_SMALL).first()
    terms = (
        dedup.load_table(spark, SF_SMALL, "documents")
        .select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"))
        .groupBy("t")
        .count()
        .collect()
    )
    freqs = sorted((row["count"] for row in terms), reverse=True)
    x = np.log(np.arange(1, len(freqs) + 1, dtype=float))
    y = np.log(np.array(freqs, dtype=float))
    slope = np.polyfit(x, y, 1)[0]
    assert r["vocab_size"] == len(freqs)
    assert r["zipf_slope"] == pytest.approx(slope, abs=1e-4)
    assert r["zipf_slope"] < 0
    assert 0.0 <= r["r2"] <= 1.0


def test_seasonal_deviations_cancel_per_month_of_year(spark):
    rows = star.q_orders_seasonal_profile(spark, SF_SMALL).collect()
    by_moy = {}
    for r in rows:
        by_moy.setdefault(r["moy"], []).append(r["seasonal_dev"])
    for moy, devs in by_moy.items():
        assert sum(devs) == pytest.approx(0.0, abs=1e-3), moy


def test_pareto_matches_bruteforce(spark):
    got = star.q_parts_pareto(spark, SF_SMALL).first()
    per_part = (
        dedup.load_table(spark, SF_SMALL, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("rev")
        )
        .collect()
    )
    revs = sorted((float(r["rev"]) for r in per_part), reverse=True)
    total = sum(revs)
    acc, k = 0.0, 0
    for v in revs:
        k += 1
        acc += v
        if acc / total >= star.PARETO_TARGET:
            break
    assert got["n_parts"] == len(revs)
    assert got["n_parts_for_target"] == k
    assert got["top_part_share"] == pytest.approx(revs[0] / total, abs=1e-5)
