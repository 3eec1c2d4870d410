"""Bucketed co-located join + salted aggregation: the plans must
show the shuffle actually disappearing / spreading."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_etl_spark.sources.warehouse import (
    bucketed_sales_join,
    bucketize_star,
    explain_has_shuffle_above_scan,
    salted,
    salted_count,
)
from tests.conftest import SF_SMALL


def test_bucketed_join_is_shuffle_free(spark):
    # managed tables land in ./spark-warehouse (gitignored);
    # spark.sql.warehouse.dir is static so it can't be pointed at tmp
    bucketize_star(spark, SF_SMALL, db="bucketed_t")
    # disable auto-broadcast so the planner exercises the bucketed
    # path (at 100 TB neither fact side would be broadcastable)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_sales_join(spark, db="bucketed_t")
        # co-located: no shuffle exchange anywhere in the join plan
        assert not explain_has_shuffle_above_scan(joined)
        base = (
            spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{SF_SMALL}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == base
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP DATABASE bucketed_t CASCADE")


def test_salted_count_matches_plain(spark):
    df = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select("l_suppkey")
    want = {
        (r.l_suppkey, r.n)
        for r in df.groupBy("l_suppkey").agg(F.count(F.lit(1)).cast("long").alias("n")).collect()
    }
    got = {
        (r.l_suppkey, r.n) for r in salted_count(df, "l_suppkey", n_salts=8).collect()
    }
    assert got == want


def test_salt_spreads_full_duplicate_rows(spark):
    # a hot key whose rows are bit-identical (a real grain here) must
    # still fan out over multiple salts — hashing the whole row would
    # put all 400 copies on one reducer
    df = spark.createDataFrame([(7, "same")] * 400, "k long, v string")
    n_salts = salted(df, "k", n_salts=8).select("_salt").distinct().count()
    assert n_salts >= 4
    counts = {(r.k, r.n) for r in salted_count(df, "k", n_salts=8).collect()}
    assert counts == {(7, 400)}