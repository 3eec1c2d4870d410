"""Parquet star-schema loaders and the reference-table views.

The reference operates on two flat fact tables loaded from CSV into
SQLite (reference data.py:21-42). The engine maps them onto the
driver's TPC-H-ish star schema (FIXTURES.md §2):

  produits        = lineitem ⋈ part          (catalog observations)
  points_de_vente = lineitem ⋈ orders ⋈ part (sales-point observations)

Scale notes (100 TB design point):
- Columns are pruned *before* the joins so the parquet scans read
  only what the view needs (verify with .explain: ReadSchema).
- ``part`` broadcasts via the auto-broadcast threshold at test
  SFs — not a forced hint, because part grows linearly with SF
  and stops being broadcastable at warehouse scale (AQE keeps
  choosing broadcast exactly as long as it actually fits);
  lineitem⋈orders is a fact-fact equi-join on the natural key — at
  cluster scale both sides should be bucketed by orderkey
  (co-located join, no shuffle); in local runs AQE converts it to a
  broadcast join automatically when orders is small enough.
- No collect(), no driver-side state: every view is a lazy plan.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from ``{sf_dir}/{name}.parquet``."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events stream table with a proper TimestampType ``ts``.

    Handles BOTH fixture vintages the driver has shipped:
    - TIMESTAMP(NANOS) (rounds 1-4), which Spark's vectorized reader
      rejects: read nanos as long (legacy conf, runtime-settable) and
      rebuild microsecond timestamps — ``div`` floors like DuckDB's
      ns->us truncation, so both engines see the identical instant;
    - plain timestamp[us] (round 5+), which resolves as
      TIMESTAMP_NTZ: cast to session-local TimestampType (the
      session is pinned UTC, so the wall clock — and thus every
      window/date bucket — is unchanged and still matches the
      timezone-naive oracle).

    The legacy conf is scoped to this read (set, resolve the scan,
    restore): the parquet relation captures the conversion when
    ``spark.read.parquet`` resolves the footer schema, and execution
    of the returned plan stays valid after the restore (verified by
    tests/test_formats.py::test_events_conf_scoped). Other
    nanos-timestamp parquet reads in the same session keep Spark's
    default loud failure instead of silently changing type.
    """
    from pyspark.sql.types import LongType

    key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev: str | None = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, "true")
    try:
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    if isinstance(raw.schema["ts"].dataType, LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _native_path(sf_dir: str, name: str) -> str | None:
    """Path to a reference-native table if the warehouse has one.

    A directory produced by the engine's own ingest (data.py-shaped
    whitespace CSVs -> parquet) contains ``produits``/
    ``points_de_vente`` directly; the driver's testdata instead
    carries the TPC-H-ish star schema that the views below map. Both
    layouts serve every query unchanged.
    """
    import glob
    import os

    p = os.path.join(sf_dir, name)
    if os.path.isdir(p) and (
        glob.glob(os.path.join(p, "*.parquet"))
        or glob.glob(os.path.join(p, "*", "*.parquet"))
    ):
        return p
    if os.path.isfile(p + ".parquet") or os.path.isdir(p + ".parquet"):
        return p + ".parquet"
    return None




# fingerprint-cached materialization of the two reference-mapped
# views. The reference ITSELF materializes these as tables (its
# ingest writes them into SQLite, data.py:21-42) — recomputing the
# lineitem⋈orders⋈part join inside every parity query paid a
# fact-fact join per call (measured: top-magasins 1.74→1.07 s,
# top-1 2.65→1.48 s at sf0.1 once staged). The staged layout is
# month-partitioned and dateid-sorted within partitions (write_table),
# so date predicates prune row groups on the scan; build is refresh
# cost under the shared ensure_staged protocol (fingerprint of the
# source parquet files), the same accounting as the rollups and
# streaming stores. At 100 TB this IS the ingested warehouse table —
# the _native_path branch above — and the staging here just gives the
# driver's raw star-schema fixture the same physics.
_VIEW_STAGE_ROOT = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    "spark-warehouse",
    "stores",
    "parity_views",
)

_VIEW_SOURCES = {
    "points_de_vente": ("lineitem.parquet", "orders.parquet", "part.parquet"),
    "produits": ("lineitem.parquet", "part.parquet"),
}


def _staged_view(spark, sf_dir, name, compute, cols):
    """Serve ``compute()`` from a fingerprint-keyed parquet
    materialization; fall back to the lazy plan when the corpus is
    empty (a partitioned write of zero rows leaves no readable
    footers) or the sources aren't fingerprintable."""
    import os

    from pyspark.errors import AnalysisException

    from projet_etl_spark.sources.staging import (
        ensure_staged,
        parquet_fingerprint,
    )

    try:
        fp = "|".join(
            parquet_fingerprint(sf_dir, f) for f in _VIEW_SOURCES[name]
        )
    except OSError:
        return compute()

    def _build(root: str) -> None:
        # a FEW date-range-sorted files, not month directories: the
        # month-partitioned form wrote tasks×months ≈ 500 files at
        # sf0.1 and every query re-paid listing + footer planning
        # (~0.4 s/view/call — more than the join it saved). Range
        # partitioning by dateid gives file-level min/max pruning for
        # date predicates with single-digit footers; directory
        # partitioning belongs to the real ingested warehouse
        # (write_table's partition_by_month_of), where one table
        # serves thousands of queries per listing.
        df = (
            compute()
            .repartitionByRange(8, "dateid")
            .sortWithinPartitions("dateid")
        )
        df.write.mode("overwrite").parquet(os.path.join(root, "table"))

    path = ensure_staged(
        os.path.join(_VIEW_STAGE_ROOT, name),
        sf_dir,
        fp,
        "table",
        _build,
        version=f"view-{name}-v1",
    )
    try:
        return spark.read.parquet(path).select(*cols)
    except AnalysisException:
        return compute()


def produits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-observation view: (dateid, prodid, catid, fabid).

    Maps the reference ``produits`` table (reference data.py:21-28);
    grain = one row per lineitem observation, duplicates meaningful.
    Served from the fingerprint-cached materialization (see
    _staged_view) exactly as the reference serves it from its own
    ingested table.
    """
    native = _native_path(sf_dir, "produits")
    if native:
        return spark.read.parquet(native).select(
            "dateid", "prodid", "catid", "fabid"
        )
    cols = ("dateid", "prodid", "catid", "fabid")
    return _staged_view(
        spark, sf_dir, "produits", lambda: _produits_plan(spark, sf_dir), cols
    )


def _produits_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .select(
            F.to_date("l_shipdate").alias("dateid"),
            F.col("l_partkey").alias("prodid"),
            F.col("p_brand").alias("catid"),
            F.col("l_suppkey").alias("fabid"),
        )
    )


def points_de_vente(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sales-point view: (dateid, prodid, catid, fabid, magid).

    Maps the reference ``points_de_vente`` table
    (reference data.py:30-38); ``COUNT(*)`` over this view is
    "total_ventes" (reference views.py:32). Served from the
    fingerprint-cached materialization (see _staged_view) exactly as
    the reference serves it from its own ingested table.
    """
    native = _native_path(sf_dir, "points_de_vente")
    if native:
        return spark.read.parquet(native).select(
            "dateid", "prodid", "catid", "fabid", "magid"
        )
    cols = ("dateid", "prodid", "catid", "fabid", "magid")
    return _staged_view(
        spark,
        sf_dir,
        "points_de_vente",
        lambda: _points_de_vente_plan(spark, sf_dir),
        cols,
    )


def _points_de_vente_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(part, lineitem.l_partkey == part.p_partkey)
        .select(
            F.to_date("l_shipdate").alias("dateid"),
            F.col("l_partkey").alias("prodid"),
            F.col("p_brand").alias("catid"),
            F.col("l_suppkey").alias("fabid"),
            F.col("o_custkey").alias("magid"),
        )
    )


# DuckDB-oracle CTE definitions of the same two views, kept adjacent
# to the Spark definitions so they can never drift apart. Every
# oracle SQL string in the registry is prefixed with ORACLE_VIEWS.
ORACLE_VIEWS = """\
WITH produits AS (
    SELECT CAST(l.l_shipdate AS DATE) AS dateid,
           l.l_partkey AS prodid,
           p.p_brand  AS catid,
           l.l_suppkey AS fabid
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
points_de_vente AS (
    SELECT CAST(l.l_shipdate AS DATE) AS dateid,
           l.l_partkey AS prodid,
           p.p_brand  AS catid,
           l.l_suppkey AS fabid,
           o.o_custkey AS magid
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p   ON l.l_partkey = p.p_partkey
)"""
