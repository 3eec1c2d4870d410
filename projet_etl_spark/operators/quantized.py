"""Int8-quantized embedding similarity.

At 100 TB the embedding store's bottleneck is bandwidth: float32
vectors cost 4 bytes/dim; symmetric int8 quantization cuts scan and
shuffle volume 4x at a small recall cost. The quantization here is
per-vector symmetric (scale = max|v_i| / 127), all arithmetic
deterministic (integer dot products, one double division at the
end), so the recall-vs-exact comparison is itself oracle-checkable.

Round-half-away-from-zero matches between Spark (HALF_UP) and DuckDB
for both signs, so quantized codes agree bit-for-bit.

Plan shape: codes are materialized ONCE per vector as an array<long>
column (a map-only transform), and the per-pair work is a zip_with +
aggregate integer fold over the two code arrays. The earlier form
re-derived both vectors' codes inside every pair expression — 128
round()/division subtrees per pair — which both stalled whole-stage
codegen compilation (the measured ~25 s wide-expression cliff,
docs/SCALE.md) and multiplied the arithmetic by the pair count
instead of the vector count. Integer sums are associative, so the
fold's left-assoc order is bit-exact under any evaluation strategy.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_etl_spark.functions.vectors import DIM
from projet_etl_spark.operators.similarity import N_QUERIES, TOP_K
from projet_etl_spark.sources.tables import load_table


def _with_scale(df: DataFrame, v: str) -> DataFrame:
    """Per-vector symmetric scale = max(|v_i|)."""
    absmax = reduce(
        lambda a, b: F.greatest(a, b),
        [F.abs(F.element_at(F.col(v), i).cast("double")) for i in range(1, DIM + 1)],
    )
    return df.withColumn(f"{v}_scale", absmax)


def _qcodes(v: str) -> Column:
    """array<long> of quantized codes: round(v_i / scale * 127)."""
    return F.transform(
        F.col(v),
        lambda x: F.round(
            x.cast("double") / F.col(f"{v}_scale") * F.lit(127.0), 0
        ).cast("long"),
    )


def _int_fold_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two code arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def q_ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 per query vector under int8 cosine — integer dot
    products end-to-end, one double division at ranking time."""
    base = (
        _with_scale(
            load_table(spark, sf_dir, "embeddings").select(
                "vec_id", F.col("embedding").alias("v")
            ),
            "v",
        )
        .withColumn("qc", _qcodes("v"))
        .withColumn("qn2", _int_fold_dot(F.col("qc"), F.col("qc")))
        .select("vec_id", "qc", "qn2")
    )
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qc").alias("qa"),
        F.col("qn2").alias("qn"),
    )
    c = base.select(
        F.col("vec_id").alias("cand_id"),
        F.col("qc").alias("qb"),
        F.col("qn2").alias("cn"),
    )
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("cand_id"))
    cos_q = F.round(
        _int_fold_dot(F.col("qa"), F.col("qb"))
        / (F.sqrt(F.col("qn")) * F.sqrt(F.col("cn"))),
        6,
    )
    scored = pairs.select("query_id", "cand_id", cos_q.alias("cos_q"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_q"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cos_q", "rank")
    )


def q_embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much cosine the int8 codes give up, per label: the audit
    that justifies (or vetoes) serving ANN from quantized codes — run
    it before flipping a corpus to the 4x-cheaper representation, and
    per label because quantization error concentrates where vector
    scale varies (a label with outlier-magnitude components loses
    more precision than the corpus average suggests).

    cosine is scale-invariant, so cos(v, dequantized(v)) ==
    cos(v, codes) and the dequantization multiply drops out — the
    per-vector error is one mixed double/integer fold pair. The
    error integerizes to the 1e-9 grid (both engines compute the
    identical double, so the floor agrees bit-for-bit), making the
    per-label sums exact.

    Scale shape: map-only code + fold expressions (whole-stage
    codegen, no UDF), one |labels|-group aggregate.
    """
    from projet_etl_spark.functions.vectors import fold_dot, fold_norm2

    base = (
        _with_scale(
            load_table(spark, sf_dir, "embeddings").select(
                "vec_id", "label", F.col("embedding").alias("v")
            ),
            "v",
        )
        .withColumn("qc", _qcodes("v"))
    )
    cos = fold_dot("v", "qc") / (
        F.sqrt(fold_norm2("v"))
        * F.sqrt(_int_fold_dot(F.col("qc"), F.col("qc")).cast("double"))
    )
    err_nano = F.floor((F.lit(1.0) - cos) * F.lit(1e9) + F.lit(0.5)).cast("long")
    return (
        base.select(F.col("label").cast("long").alias("label"), err_nano.alias("e"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(
                F.sum("e").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("avg_err_nano"),
            F.max("e").cast("long").alias("max_err_nano"),
        )
        .orderBy("label")
    )


def q_ann_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured accuracy of the int8 path: per query, how many of the
    exact float-cosine top-K the quantized scorer returns — the
    audit convention applied to quantization (every approximation
    here ships with a measured-accuracy twin: IVF has ann-ivf-recall,
    LSH has dedup-lsh-recall, this is the int8 one; together with
    embedding-quantization-error it is the evidence read before
    flipping a corpus to the 4x-cheaper representation — error says
    how much cosine the codes give up, recall says whether the
    RANKING survived).

    Scale shape: both sides are the existing top-K results
    (N_QUERIES x TOP_K rows each); the comparison is a tiny
    equi-join + a |queries|-group aggregate.
    """
    from projet_etl_spark.operators.similarity import q_ann_cosine_topk

    brute = q_ann_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    quant = q_ann_quantized_topk(spark, sf_dir).select(
        "query_id", "cand_id", F.lit(1).alias("hit")
    )
    return (
        brute.join(quant, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            (F.col("n_hits").cast("double") / F.lit(float(TOP_K))).alias("recall"),
        )
        .orderBy("query_id")
    )
