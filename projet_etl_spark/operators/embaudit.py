"""Embedding-quality audits over the embeddings table — the vector
hygiene checks a training pipeline runs before trusting similarity
search or clustering (degenerate near-zero vectors, exploding norms,
per-class drift).

Float discipline (what makes these oracle-exact): distributed SUMs of
doubles are order-dependent, so no query here ever hash-aggregates a
raw float. `embedding-norm-extremes` only COMPARES per-row doubles
(identical expression → identical values → identical order in both
engines); `embedding-centroid-shift` quantizes components to 1e-6
fixed point and sums exact BIGINTs (the kmeans-clusters discipline,
operators/kmeans.py), dividing once per (label, dim) cell at the end;
the final distance folds the 64 dims in fixed order (the BM25 fold
discipline).

At 100 TB: the norm audit is a map-only expression plus two top-k
passes (TakeOrderedAndProject — never a global sort); the centroid
audit explodes to (label, dim) grain with map-side combine, so the
shuffle carries |labels| × 64 partials, not vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.functions.vectors import fold_norm2
from projet_etl_spark.sources.tables import load_table

NORM_EXTREME_K = 10
CENTROID_UNIT = 1_000_000  # 1e-6 fixed point, the kmeans grid


def q_embedding_norm_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NORM_EXTREME_K largest and smallest vectors by squared L2
    norm — the exploding/degenerate-vector audit. Rank-based, so the
    only cross-row operation is comparison of identically-computed
    doubles: no float aggregation anywhere.

    Scale shape: one map-only norm² expression (JVM fold, no UDF),
    then two TakeOrderedAndProject top-ks; the union is 2K rows.
    """
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", fold_norm2("embedding").alias("n2")
    )
    hi = (
        vecs.orderBy(F.desc("n2"), F.asc("vec_id"))
        .limit(NORM_EXTREME_K)
        .withColumn("side", F.lit("high"))
    )
    lo = (
        vecs.orderBy(F.asc("n2"), F.asc("vec_id"))
        .limit(NORM_EXTREME_K)
        .withColumn("side", F.lit("low"))
    )
    return (
        hi.unionByName(lo)
        .select("side", "vec_id", F.round("n2", 6).alias("norm2"))
        .orderBy("side", "vec_id")
    )


def q_embedding_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift from the global centroid (squared L2
    distance) — the class-balance / embedding-drift audit behind
    SemDeDup-style curation: a label whose centroid sits far from the
    corpus centre is a candidate domain shift.

    Exactness: components quantize to 1e-6 fixed point ONCE per value
    (floor(x·1e6 + 0.5), identical in DuckDB), all sums are exact
    BIGINTs, each centroid cell divides once to double, and the
    64-dim distance folds in ascending-dim order — every float op is
    a single deterministic expression shared with the oracle.

    Scale shape: posexplode → (label, dim) hash aggregate with
    map-side combine (shuffle carries |labels|×64 partials); global
    centroid re-aggregates those partials, never the vectors; the
    fold runs on |labels| rows.
    """
    cells = (
        load_table(spark, sf_dir, "embeddings")
        .select("label", F.posexplode("embedding").alias("dim", "x"))
        .select(
            "label",
            "dim",
            F.floor(
                F.col("x").cast("double") * F.lit(float(CENTROID_UNIT))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("u"),
        )
        .groupBy("label", "dim")
        .agg(F.sum("u").alias("su"), F.count(F.lit(1)).cast("long").alias("n"))
    )
    per_label = cells.select(
        "label",
        "dim",
        (
            F.col("su").cast("double")
            / F.col("n").cast("double")
            / F.lit(float(CENTROID_UNIT))
        ).alias("m"),
        "su",
        "n",
    )
    glob = (
        cells.groupBy("dim")
        .agg(F.sum("su").alias("gsu"), F.sum("n").alias("gn"))
        .select(
            "dim",
            (
                F.col("gsu").cast("double")
                / F.col("gn").cast("double")
                / F.lit(float(CENTROID_UNIT))
            ).alias("gm"),
        )
    )
    diffs = per_label.join(F.broadcast(glob), "dim").select(
        "label",
        "dim",
        ((F.col("m") - F.col("gm")) * (F.col("m") - F.col("gm"))).alias("d2"),
        "n",
    )
    return (
        diffs.groupBy("label")
        .agg(
            F.max("n").cast("long").alias("n_vecs"),  # same n for every dim
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("dim", "d2"))),
                    F.lit(0.0),
                    lambda acc, t: acc + t["d2"],
                ),
                6,
            ).alias("centroid_shift2"),
        )
        .select(F.col("label").cast("long").alias("label"), "n_vecs", "centroid_shift2")
        .orderBy("label")
    )


def q_embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean and variance of the embedding space — the
    feature-collapse audit: a dimension whose variance is ~0 carries
    no information (dead unit upstream), and a handful of dominant
    variances signals anisotropic collapse, the known failure mode
    that breaks cosine-similarity curation. Run before trusting ANN
    or SemDeDup decisions on a new embedding snapshot.

    Exactness: the centroid-shift discipline — components quantize
    to 1e-6 fixed point once, first and second moments accumulate as
    exact integers (the squared moment in DECIMAL(38,0): u² ≈ 1e12
    per row overflows a long sum past ~9e6 rows/dim, well inside
    100 TB range), and each (mean, variance) cell divides to double
    once, in the same expression order as the oracle.

    Scale shape: posexplode → (dim,) hash aggregate with map-side
    combine — the shuffle carries 64 partial rows per map task, and
    the output is |dims| rows regardless of corpus size.
    """
    cells = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("dim", "x"))
        .select(
            "dim",
            F.floor(
                F.col("x").cast("double") * F.lit(float(CENTROID_UNIT))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("u"),
        )
    )
    agg = cells.groupBy("dim").agg(
        F.sum("u").cast("decimal(38,0)").alias("su"),
        F.sum((F.col("u") * F.col("u")).cast("decimal(38,0)")).alias("squ"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    mean_u = F.col("su").cast("double") / F.col("n").cast("double")
    ex2 = F.col("squ").cast("double") / F.col("n").cast("double")
    unit = float(CENTROID_UNIT)
    return agg.select(
        F.col("dim").cast("long").alias("dim"),
        F.round(mean_u / F.lit(unit), 6).alias("mean_val"),
        F.round((ex2 - mean_u * mean_u) / F.lit(unit * unit), 6).alias("var_val"),
        "n",
    ).orderBy("dim")


def q_embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language embedding coverage of the document corpus: how
    many docs have a vector in the embeddings table (doc_id = vec_id
    by the fixture contract, FIXTURES.md) — the modality-coverage
    audit a multimodal/retrieval pipeline runs before relying on
    vector search, since uncovered slices silently vanish from ANN
    results. 100%-coverage rows are the healthy case; the query
    exists to catch the other ones after a partial embedding job.

    Plan: the embeddings side reduces to bare ids before a LEFT
    equi-join on the high-entropy key, then a |langs|-group aggregate
    of exact indicator sums — at warehouse scale both sides are
    id-sorted parquet, and the join is the textbook co-partitioned
    merge."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    vecs = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.col("vec_id").alias("doc_id"))
        .withColumn("has_vec", F.lit(1))
    )
    return (
        docs.join(vecs, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.coalesce(F.col("has_vec"), F.lit(0)))
            .cast("long")
            .alias("n_with_vec"),
        )
        .withColumn(
            "coverage_pct",
            F.round(
                (F.col("n_with_vec") * F.lit(100)).cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ),
        )
        .orderBy("lang")
    )
