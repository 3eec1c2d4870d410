"""Distributed k-means (Lloyd's algorithm) over the embeddings table.

The iterative-refinement counterpart to the one-shot medoid centroids
the IVF index uses (operators/similarity.py): assignment is a
map-only pass against broadcast centroids, the update step is one
aggregation, and the loop runs driver-side over a model of size K —
the canonical "small model, big data" iteration shape (same family
as connected components in operators/clusters.py, but with a fixed
iteration count instead of a fixpoint test).

Scale design (100 TB):
- Centroids (K × DIM doubles) live driver-side and ride into the
  assignment expression as literals — broadcast by value, never a
  join. The per-iteration ``collect()`` is K × DIM aggregated sums,
  NOT data rows; the corpus is never collected.
- The assignment distance uses the fold form (zip_with + aggregate)
  per centroid: K generated 64-term sums per row would stall
  whole-stage codegen compilation (docs/SCALE.md wide-expression
  cliff), while K folds plan instantly and keep the same
  left-associated float order.
- The update step reduces the corpus to (cluster, dim) partial sums
  map-side; shuffle volume is K × DIM per partition regardless of
  corpus size.
- Ties and empty clusters are deterministic: argmin breaks ties
  toward the LOWEST cluster id (struct array_min), and a cluster
  that loses all members keeps its previous centroid.

No DuckDB oracle: the per-dimension means are float sums whose
merge order varies with partitioning, so cross-engine hash equality
is not defined for this op; correctness is pinned by
tests/test_kmeans.py against a NumPy reference implementation of the
identical algorithm (same init, same tie-break, same iteration
count) plus invariants (partition of the corpus, inertia
monotonicity over iterations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.functions.vectors import DIM
from projet_etl_spark.sources.tables import load_table

K_CLUSTERS = 8
KMEANS_ITERS = 3


def _dist2_to(centroid: list[float], v: str = "v") -> Column:
    """Squared euclidean distance from array column ``v`` to a
    centroid literal, as a fold (tiny expression tree)."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(
            F.col(v), c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def assign_clusters(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vec_id, v, cluster): nearest centroid, ties to lowest id."""
    scored = F.array(
        *[
            F.struct(
                _dist2_to(c).alias("d"), F.lit(i).cast("long").alias("c")
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_min(scored)
    return emb.select(
        "vec_id", "v", best.getField("c").alias("cluster"), best.getField("d").alias("dist2")
    )


def kmeans_fit(
    spark: SparkSession,
    sf_dir: str,
    k: int = K_CLUSTERS,
    iters: int = KMEANS_ITERS,
) -> tuple[list[list[float]], DataFrame]:
    """Run ``iters`` Lloyd iterations; returns (centroids, final
    assignment DataFrame). Init = the first ``k`` vectors by vec_id
    (deterministic, shared with the NumPy reference)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    centroids = [
        [float(x) for x in r.v]
        for r in emb.orderBy("vec_id").limit(k).collect()
    ]
    for _ in range(iters):
        assigned = assign_clusters(emb, centroids)
        # per-(cluster, dim) sums: posexplode then one hash agg;
        # K x DIM result rows — the model update, not a data collect
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum(F.col("x").cast("double")).alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters keep position
        acc: dict[int, list[float]] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r.cluster, [0.0] * DIM)[r.pos] = r.s
            cnt[r.cluster] = r.n
        for ci, vec in acc.items():
            new[ci] = [x / cnt[ci] for x in vec]
        centroids = new
    return centroids, assign_clusters(emb, centroids)


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster sizes and mean within-cluster squared distance after
    KMEANS_ITERS Lloyd iterations (rows-only: K rows, stable schema;
    float means are partition-order-dependent so no SQL oracle —
    see module docstring for the pytest contract)."""
    _, assigned = kmeans_fit(spark, sf_dir)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.round(F.avg("dist2"), 6).alias("mean_dist2"),
        )
        .orderBy("cluster")
    )
