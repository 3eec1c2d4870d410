"""Similarity search over the embeddings table (dim-64 floats).

- ``ann-cosine-topk``: brute-force exact top-k per query vector —
  the correctness baseline. A cross join + fold cosine (zip_with +
  aggregate — codegen cannot compile 64-term generated sums inside
  join projections and falls back to interpreted, measured 4-11x
  slower) + per-query top-k window. At 100 TB the cross join is
  the bottleneck by design; it exists to validate the pruned path.
- ``ann-ivf-topk``: the scale path — an IVF-style index built from
  deterministic medoid centroids (the lowest-vec_id vector of each
  label group). Every vector is assigned to its nearest centroid
  (coarse quantization); a query probes only the ``NPROBE`` nearest
  cells, turning the full scan into a partition-pruned scan.
  Centroid choice is arithmetic-deterministic (no averaging), so
  even this variant is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_etl_spark.cache import eager_persist, lazy_persist
from projet_etl_spark.functions.vectors import cosine, fold_dot, fold_norm2
from projet_etl_spark.sources.tables import load_table

N_QUERIES = 10  # vectors with vec_id < 10 act as the query set
TOP_K = 10
NPROBE = 2


def _emb_with_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("v")
    )
    return emb.withColumn("n2", fold_norm2("v"))


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 per query vector (vec_id < 10), brute force."""
    base = _emb_with_norm(spark, sf_dir)
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("n2").alias("qn")
    )
    c = base.select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"), F.col("n2").alias("cn")
    )
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("cand_id"))
    cos = F.round(cosine(fold_dot("qv", "cv"), F.col("qn"), F.col("cn")), 6)
    scored = pairs.select("query_id", "cand_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cos", "rank")
    )


def _centroids(base: DataFrame) -> DataFrame:
    """Deterministic medoid per label: the lowest-vec_id member.

    Medoids instead of mean centroids keep the index arithmetic
    exactly reproducible in ANSI SQL (no order-dependent float sums).
    min_by aggregation (partial+final hash agg) instead of a
    row_number window: same result, no per-partition sort.
    """
    return base.groupBy(F.col("label").alias("cell")).agg(
        F.min_by("v", "vec_id").alias("centv"),
        F.min_by("n2", "vec_id").alias("centn"),
    )


def coarse_assign(base: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, v, n2, cell): nearest-medoid coarse assignment — the
    IVF index build. Argmax via max_by over a (similarity, -cell)
    struct (deterministic tiebreak on the lower cell id), one hash
    aggregate instead of a sort window. Shared by the batch query and
    the streaming index-maintenance twin (streaming/ivf.py), so the
    two paths cannot drift."""
    sim_to_cent = F.round(
        cosine(fold_dot("v", "centv"), F.col("n2"), F.col("centn")), 6
    )
    return (
        base.crossJoin(cents)
        .withColumn("simc", sim_to_cent)
        .groupBy("vec_id")
        .agg(
            F.first("v").alias("v"),
            F.first("n2").alias("n2"),
            F.max_by(
                "cell", F.struct(F.col("simc"), (-F.col("cell")).alias("negc"))
            ).alias("cell"),
        )
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10: assign vectors to nearest medoid cell, probe the
    NPROBE nearest cells per query, exact re-rank inside them."""
    base = _emb_with_norm(spark, sf_dir)
    cents = F.broadcast(lazy_persist(_centroids(base)))

    # the assignment IS the IVF index — a built artifact feeding three
    # subtrees (query set, probe ranking, candidate lookup); persist
    # eagerly exactly as a real deployment materializes the index
    assigned = eager_persist(coarse_assign(base, cents))
    return ivf_topk_from_assignment(assigned, cents)


def ivf_topk_from_assignment(assigned: DataFrame, cents) -> DataFrame:
    """The IVF SERVE stage: (query_id, cand_id, cos, rank) from a
    materialized (vec_id, v, n2, cell) index — shared by the batch
    build above and the streaming-maintained index read
    (streaming/storequery.q_ann_ivf_store), so the two serve paths
    cannot drift."""
    # queries probe their NPROBE nearest cells
    queries = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("n2").alias("qn")
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("simq"), F.asc("cell"))
    probes = (
        queries.crossJoin(cents)
        .withColumn(
            "simq",
            F.round(cosine(fold_dot("qv", "centv"), F.col("qn"), F.col("centn")), 6),
        )
        .withColumn("prn", F.row_number().over(w_probe))
        .filter(F.col("prn") <= NPROBE)
        .select("query_id", "qv", "qn", "cell")
    )

    # exact re-rank within probed cells only
    cands = probes.join(
        assigned.select(
            F.col("vec_id").alias("cand_id"),
            F.col("v").alias("cv"),
            F.col("n2").alias("cn"),
            "cell",
        ),
        "cell",
    ).filter(F.col("query_id") != F.col("cand_id"))
    cos = F.round(cosine(fold_dot("qv", "cv"), F.col("qn"), F.col("cn")), 6)
    # no distinct needed: each vector lives in exactly one cell, so a
    # (query, candidate) pair can't repeat across probed cells
    scored = cands.select("query_id", "cand_id", cos.alias("cos"))
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cos", "rank")
    )


def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured accuracy of the IVF approximation: per query, how many
    of the exact brute-force top-K neighbors the NPROBE-pruned index
    returns — recall@K as an oracled query, so the cost of cell
    pruning is a number in the hard correctness signal, not a claim.
    (The engine's audit convention: every approximation ships with a
    measured-accuracy twin — CMS has overcount, the bloom filter has
    n_false_pos, the LSH candidate path has dedup-lsh-recall.)

    Scale shape: both sides are the existing top-K results (N_QUERIES
    x TOP_K rows each); the comparison is a tiny equi-join.
    """
    brute = q_ann_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    ivf = q_ann_ivf_topk(spark, sf_dir).select(
        "query_id", "cand_id", F.lit(1).alias("hit")
    )
    return (
        brute.join(ivf, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            (F.col("n_hits").cast("double") / F.lit(float(TOP_K))).alias("recall"),
        )
        .orderBy("query_id")
    )
