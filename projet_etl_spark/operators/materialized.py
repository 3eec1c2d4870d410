"""Pre-aggregated monthly rollup — the materialized-view pattern.

At 100 TB the monthly time-series queries (score-evolution,
nb-mag-cat-date) must not scan raw facts: a rollup at
(catid, fabid, magid, month) grain with additive measures answers
them exactly —

- counts/sums re-aggregate losslessly across any sub-grouping,
- distinct counts over dimensions RETAINED IN THE ROLLUP KEY
  (magid here) stay exact: COUNT(DISTINCT magid) over rollup rows
  equals it over raw rows.

(The general case — distinct over a rolled-away dimension — needs
HLL sketches; that path is the `mag-cat-approx` opt-in.)

The rollup queries registered here carry the SAME oracles as their
raw-scan twins: the driver's gate literally proves the rollup path
answers byte-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.functions.dates import month_key
from projet_etl_spark.params import DEFAULTS
from projet_etl_spark.sources.tables import points_de_vente

_ROLLUP_CACHE: dict[str, DataFrame] = {}


def invalidate_rollups() -> int:
    """Unpersist and forget every materialized rollup (the refresh
    hook; also called by cache.release_caches). Returns the number of
    entries dropped."""
    n = 0
    for rollup in _ROLLUP_CACHE.values():
        try:
            rollup.unpersist()
            n += 1
        except Exception:
            pass
    _ROLLUP_CACHE.clear()
    return n


def monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(catid, fabid, magid, mois) -> n_ventes, built once per
    warehouse per application (the stand-in for a nightly-refreshed
    rollup table; a deployment would write it partitioned by mois).

    Keyed by applicationId, not id(spark): Python id values are
    reused after GC, which could hand a rebuilt warehouse a stale
    DataFrame bound to a stopped context."""
    key = f"{spark.sparkContext.applicationId}:{sf_dir}"
    if key not in _ROLLUP_CACHE:
        rollup = (
            points_de_vente(spark, sf_dir)
            .groupBy(
                "catid", "fabid", "magid", month_key(F.col("dateid")).alias("mois")
            )
            .agg(F.count(F.lit(1)).alias("n_ventes"))
            .persist()
        )
        rollup.count()
        _ROLLUP_CACHE[key] = rollup
    return _ROLLUP_CACHE[key]


def q_score_evolution_rollup(
    spark: SparkSession, sf_dir: str, *, cat_id=None, fab_id=None
) -> DataFrame:
    """score-evolution answered from the rollup instead of raw facts
    (same oracle as the raw query — results are identical).

    The epoch..as_of range spans whole months of the default
    parameters, so the month-grain filter is exact.
    """
    cat_id = cat_id if cat_id is not None else DEFAULTS["cat_id"]
    fab_id = fab_id if fab_id is not None else DEFAULTS["fab_id"]
    lo = str(DEFAULTS["epoch"])[:7]
    hi = str(DEFAULTS["as_of"])[:7]
    r = monthly_rollup(spark, sf_dir).filter(
        (F.col("catid") == F.lit(cat_id)) & F.col("mois").between(lo, hi)
    )
    return (
        r.groupBy("mois")
        .agg(
            F.sum("n_ventes").alias("total_ventes"),
            F.sum(
                F.when(F.col("fabid") == F.lit(fab_id), F.col("n_ventes")).otherwise(
                    0
                )
            ).alias("ventes_fab"),
        )
        .withColumn(
            "score_sante",
            F.coalesce(
                F.col("ventes_fab")
                * F.lit(100.0)
                / F.nullif(F.col("total_ventes"), F.lit(0)),
                F.lit(0.0),
            ),
        )
        .orderBy("mois")
    )


def q_nb_mag_cat_date_rollup(
    spark: SparkSession, sf_dir: str, *, cat_id=None, annee: int | None = None
) -> DataFrame:
    """nb-mag-cat-date from the rollup: magid is in the rollup key,
    so the distinct store count per month is exact."""
    cat_id = cat_id if cat_id is not None else DEFAULTS["cat_id"]
    annee = annee or DEFAULTS["annee"]
    r = monthly_rollup(spark, sf_dir).filter(
        (F.col("catid") == F.lit(cat_id))
        & (F.substring("mois", 1, 4) == str(int(annee)))
    )
    return (
        r.groupBy("mois").agg(F.countDistinct("magid").alias("nbmag")).orderBy("mois")
    )
