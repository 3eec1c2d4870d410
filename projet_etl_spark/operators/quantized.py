"""Int8-quantized embedding similarity.

At 100 TB the embedding store's bottleneck is bandwidth: float32
vectors cost 4 bytes/dim; symmetric int8 quantization cuts scan and
shuffle volume 4x at a small recall cost. The quantization here is
per-vector symmetric (scale = max|v_i| / 127), all arithmetic
deterministic (integer dot products, one double division at the
end), so the recall-vs-exact comparison is itself oracle-checkable.

Round-half-away-from-zero matches between Spark (HALF_UP) and DuckDB
for both signs, so quantized codes agree bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_etl_spark.functions.vectors import DIM
from projet_etl_spark.operators.similarity import N_QUERIES, TOP_K
from projet_etl_spark.sources.tables import load_table


def _qcode(v: str, i: int) -> Column:
    """Quantized code of element i: round(v_i / scale * 127)."""
    return F.round(
        F.element_at(F.col(v), i).cast("double") / F.col(f"{v}_scale") * F.lit(127.0),
        0,
    ).cast("long")


def _with_scale(df: DataFrame, v: str) -> DataFrame:
    """Per-vector symmetric scale = max(|v_i|)."""
    absmax = reduce(
        lambda a, b: F.greatest(a, b),
        [F.abs(F.element_at(F.col(v), i).cast("double")) for i in range(1, DIM + 1)],
    )
    return df.withColumn(f"{v}_scale", absmax)


def _qdot(a: str, b: str) -> Column:
    terms = [_qcode(a, i) * _qcode(b, i) for i in range(1, DIM + 1)]
    return reduce(lambda x, y: x + y, terms)


def _qnorm2(a: str) -> Column:
    terms = [_qcode(a, i) * _qcode(a, i) for i in range(1, DIM + 1)]
    return reduce(lambda x, y: x + y, terms)


def q_ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 per query vector under int8 cosine — integer dot
    products end-to-end, one double division at ranking time."""
    base = _with_scale(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").alias("v")
        ),
        "v",
    ).withColumn("qn2", _qnorm2("v"))
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("v_scale").alias("qv_scale"),
        F.col("qn2").alias("qn"),
    )
    c = base.select(
        F.col("vec_id").alias("cand_id"),
        F.col("v").alias("cv"),
        F.col("v_scale").alias("cv_scale"),
        F.col("qn2").alias("cn"),
    )
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("cand_id"))
    cos_q = F.round(
        _qdot("qv", "cv") / (F.sqrt(F.col("qn")) * F.sqrt(F.col("cn"))), 6
    )
    scored = pairs.select("query_id", "cand_id", cos_q.alias("cos_q"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_q"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cos_q", "rank")
    )
