"""OLAP surface beyond the reference's templates (SURVEY.md §2.4/2.5/
2.7 note these as absent there, free in Spark): grouping-set rollups,
set operations, and ranked window functions. Each is a registry query
with a full oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_etl_spark.params import DEFAULTS
from projet_etl_spark.sources.tables import points_de_vente


def q_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sales counts rolled up (catid, fabid) -> catid -> grand total.

    ROLLUP plans as a single Expand + hash aggregate — one pass over
    the fact table for all three grouping levels.
    """
    return (
        points_de_vente(spark, sf_dir)
        .rollup("catid", "fabid")
        .agg(
            F.count(F.lit(1)).alias("n_ventes"),
            F.countDistinct("prodid").alias("n_produits"),
            F.grouping_id("catid", "fabid").cast("long").alias("gid"),
        )
        .select("catid", "fabid", "n_ventes", "n_produits", "gid")
    )


def q_stores_without_category(
    spark: SparkSession, sf_dir: str, *, cat_id=None
) -> DataFrame:
    """Stores with sales but none in the given category — EXCEPT
    semantics (subtract plans as a left-anti hash join over the
    distinct sets)."""
    cat_id = cat_id if cat_id is not None else DEFAULTS["cat_id"]
    pv = points_de_vente(spark, sf_dir)
    all_stores = pv.select("magid")
    cat_stores = pv.filter(F.col("catid") == F.lit(cat_id)).select("magid")
    return all_stores.subtract(cat_stores).orderBy("magid")


def q_top3_stores_per_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category top-3 stores by sales count — the windowed
    generalization of the reference's global top-k (SURVEY.md §2.5):
    rank inside each category partition instead of sorting globally.
    """
    counts = (
        points_de_vente(spark, sf_dir)
        .groupBy("catid", "magid")
        .agg(F.count(F.lit(1)).alias("n_ventes"))
    )
    w = Window.partitionBy("catid").orderBy(F.desc("n_ventes"), F.asc("magid"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .orderBy("catid", "rnk")
    )


def q_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sales counts over the full (catid, fabid) CUBE — all four
    grouping sets (both keys, each alone, grand total) in one Expand +
    hash-aggregate pass; completes the grouping-sets family next to
    the ROLLUP variant."""
    return (
        points_de_vente(spark, sf_dir)
        .cube("catid", "fabid")
        .agg(
            F.count(F.lit(1)).alias("n_ventes"),
            F.grouping_id("catid", "fabid").cast("long").alias("gid"),
        )
        .select("catid", "fabid", "n_ventes", "gid")
    )


def q_sales_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint dimension totals — per-category AND per-fabricant —
    in ONE pass via GROUPING SETS ((catid), (fabid)); completes the
    grouping-sets family next to ROLLUP (hierarchy) and CUBE (full
    lattice). ROLLUP/CUBE can't express this set list: it is the
    "two independent dashboard breakdowns, one fact scan" shape.

    Goes through the SQL surface (spark.sql with a DataFrame
    argument) because the DataFrame API exposes only rollup/cube;
    Catalyst plans it as the same single Expand + hash aggregate —
    each input row is replicated once per grouping set and aggregated
    map-side, so the fact table is still scanned exactly once.
    """
    return spark.sql(
        """
        SELECT catid, fabid,
               COUNT(*) AS n_ventes,
               CAST(COUNT(DISTINCT prodid) AS BIGINT) AS n_produits,
               CAST(grouping_id(catid, fabid) AS BIGINT) AS gid
        FROM {pv}
        GROUP BY GROUPING SETS ((catid), (fabid))
        """,
        pv=points_de_vente(spark, sf_dir),
    )


CAT_B = "Brand#5"


def q_stores_in_both_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stores with sales in BOTH the default category and CAT_B —
    INTERSECT semantics, completing the set-operation family next to
    the EXCEPT query (intersect plans as a left-semi hash join over
    the distinct sets; at scale both sides reduce before the join)."""
    pv = points_de_vente(spark, sf_dir)
    a = pv.filter(F.col("catid") == F.lit(DEFAULTS["cat_id"])).select("magid")
    b = pv.filter(F.col("catid") == F.lit(CAT_B)).select("magid")
    return a.intersect(b).orderBy("magid")
