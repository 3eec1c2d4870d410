"""Cache lifecycle: eager persists must be releasable so a long-lived
session doesn't accumulate executor storage across requests."""

from __future__ import annotations

from projet_etl_spark.cache import release_caches
from projet_etl_spark.operators.dedup import q_dedup_minhash_lsh
from projet_etl_spark.operators.materialized import monthly_rollup
from projet_etl_spark.operators.similarity import q_ann_ivf_topk
from tests.conftest import SF_SMALL


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_release_caches_frees_all_storage(spark):
    release_caches()  # drop anything earlier tests staged
    assert _cache_manager_empty(spark)

    q_dedup_minhash_lsh(spark, SF_SMALL).collect()
    q_ann_ivf_topk(spark, SF_SMALL).collect()
    monthly_rollup(spark, SF_SMALL)
    assert not _cache_manager_empty(spark)

    assert release_caches() >= 4  # shingles, cands, centroids, index, rollup
    assert _cache_manager_empty(spark)


def test_repeated_invocations_do_not_accumulate(spark):
    release_caches()
    for _ in range(3):
        q_dedup_minhash_lsh(spark, SF_SMALL).collect()
        release_caches()
    assert _cache_manager_empty(spark)


def test_released_query_still_correct(spark):
    """Releasing is advisory: a plan whose cache was dropped simply
    recomputes, with identical results."""
    before = sorted(map(tuple, q_dedup_minhash_lsh(spark, SF_SMALL).collect()))
    df = q_dedup_minhash_lsh(spark, SF_SMALL)
    release_caches()
    after = sorted(map(tuple, df.collect()))
    assert before == after


def test_rollup_keyed_by_application_id(spark):
    from projet_etl_spark.operators import materialized

    release_caches()
    monthly_rollup(spark, SF_SMALL)
    (key,) = materialized._ROLLUP_CACHE.keys()
    assert key.startswith(spark.sparkContext.applicationId)
    release_caches()
    assert materialized._ROLLUP_CACHE == {}
