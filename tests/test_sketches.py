"""Sketch-family invariants: the guarantees that make a sketch usable
operationally, beyond the oracle equality test_parity already runs —
count-min never undercounts, and the bloom decontamination path has
no false negatives against the exact gram join."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_etl_spark.operators.decontam import (
    q_decontaminate_bloom,
    q_decontaminate_ngram,
)
from projet_etl_spark.operators.sketches import q_token_freq_cms
from tests.conftest import SF_SMALL


def test_cms_never_undercounts(spark):
    rows = q_token_freq_cms(spark, SF_SMALL).collect()
    assert rows, "top-k probe must return tokens"
    for r in rows:
        assert r.cms_n >= r.exact_n, (r.tok, r.exact_n, r.cms_n)
        assert r.overcount == r.cms_n - r.exact_n


def test_bloom_has_no_false_negatives(spark):
    exact = {
        r.doc_id: r.n_overlap
        for r in q_decontaminate_ngram(spark, SF_SMALL).collect()
    }
    bloom = {
        r.doc_id: (r.n_bloom_hits, r.n_exact_hits)
        for r in q_decontaminate_bloom(spark, SF_SMALL).collect()
    }
    assert exact, "fixture must contain contaminated docs"
    for doc_id, n in exact.items():
        assert doc_id in bloom, f"doc {doc_id} lost by the bloom probe"
        n_bloom, n_ex = bloom[doc_id]
        assert n_ex == n
        assert n_bloom >= n


def test_hash_sample_quantiles_close_to_exact(spark, duck):
    """The bottom-K-by-hash sample deciles must sit within the exact
    quantile envelope q ± 0.06 (3x the K=1024 sampling s.e.) — the
    accuracy contract behind the oracle-exact estimates."""
    from projet_etl_spark.operators.sketches import (
        q_quantiles_hash_sample,
    )
    from tests.conftest import SF_SMALL

    got = {
        r.q: r.est for r in q_quantiles_hash_sample(spark, SF_SMALL).collect()
    }
    assert len(got) == 9
    for q, est in got.items():
        lo, hi = duck.execute(
            f"""SELECT quantile_disc(value, {max(q - 0.06, 0.001)}),
                       quantile_disc(value, {min(q + 0.06, 0.999)})
                FROM events"""
        ).fetchone()
        assert lo <= est <= hi, (q, est, lo, hi)


def test_hash_sample_is_mergeable(spark):
    """bottom-K of the union == bottom-K of per-split bottom-Ks."""
    from projet_etl_spark.functions.text import portable_hash60
    from projet_etl_spark.operators.sketches import QSAMPLE_K
    from projet_etl_spark.sources.tables import events
    from tests.conftest import SF_SMALL

    ev = events(spark, SF_SMALL).select(
        "event_id",
        "value",
        portable_hash60(F.col("event_id").cast("string")).alias("hk"),
    )
    full = [
        (r.hk, r.value)
        for r in ev.orderBy("hk", "value").limit(QSAMPLE_K).collect()
    ]
    parts = []
    for m in (0, 1):
        parts.extend(
            (r.hk, r.value)
            for r in ev.filter(F.col("event_id") % 2 == m)
            .orderBy("hk", "value")
            .limit(QSAMPLE_K)
            .collect()
        )
    merged = sorted(parts)[:QSAMPLE_K]
    assert merged == sorted(full)


def test_kmv_intersection_accuracy(spark):
    """Every pairwise intersection estimate must land within ~3
    sigma of the K=64 KMV estimator (rel_err < 0.35), and pairs
    whose union fits inside the sketch must be exact."""
    from projet_etl_spark.operators.sketches import (
        KMV_K,
        q_distinct_kmv_intersect,
    )

    from projet_etl_spark.sources.tables import events

    rows = q_distinct_kmv_intersect(spark, SF_SMALL).collect()
    assert rows, "fixture has at least two event types"
    ev = events(spark, SF_SMALL).select("event_type", "user_id").distinct()
    # union size per pair (the small-set-rule gate): |A| + |B| - |A∩B|
    per_type = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.rel_err < 0.35, (r.type_a, r.type_b, r.rel_err)
        union = per_type[r.type_a] + per_type[r.type_b] - r.n_exact
        if union < KMV_K:
            # union fits the sketch -> small-set rule -> exact
            assert r.rel_err == 0.0
