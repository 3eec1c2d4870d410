"""Dedup clustering: connected components over near-duplicate pairs.

Pairwise dedup (minhash/jaccard) yields edges; the operator users
actually need is the GROUP — every document labeled with its
component so one representative per component survives. Components
are computed with iterative min-label propagation:

  label(v) <- min(label(v), min over neighbors(label(u)))

repeated to fixpoint — O(diameter) rounds, each one join + groupBy.
Lineage is cut with localCheckpoint every round so 100 TB runs don't
accumulate a mile-deep plan (the classic iterative-algorithm trap);
convergence is detected with a changed-count aggregate.

Genuinely iterative -> no SQL oracle (driver records the rows-only
check); tests validate against a driver-side union-find instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.operators.dedup import q_dedup_minhash_lsh
from projet_etl_spark.sources.tables import load_table

MAX_ITERATIONS = 20


def connected_components(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """(vertex long) components from (src, dst) edges: every vertex
    labeled with the smallest vertex id reachable from it."""
    sym = (
        edges.select(F.col("src"), F.col("dst"))
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    labels = vertices.select(
        F.col("vertex"), F.col("vertex").alias("label")
    ).localCheckpoint()
    for _ in range(MAX_ITERATIONS):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.vertex)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        updated = (
            labels.join(neighbor_min, labels.vertex == neighbor_min.src, "left")
            .select(
                "vertex",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
                (
                    F.coalesce(F.col("nlabel"), F.col("label")) < F.col("label")
                ).alias("changed"),
            )
            .localCheckpoint()  # cut lineage every round
        )
        n_changed = updated.filter(F.col("changed")).count()
        labels = updated.select("vertex", "label")
        if n_changed == 0:
            break
    return labels


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents labeled with their near-dup cluster (min doc_id in
    the component); singleton docs label themselves."""
    pairs = q_dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vertex")
    )
    labels = connected_components(pairs, docs)
    return labels.select(
        F.col("vertex").alias("doc_id"), F.col("label").alias("cluster_id")
    )
