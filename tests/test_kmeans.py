"""k-means: the distributed Lloyd implementation must reproduce a
NumPy reference of the identical algorithm (same deterministic init,
tie-break, and iteration count), and obey Lloyd's invariants."""

from __future__ import annotations

import numpy as np

from projet_etl_spark.operators.kmeans import (
    K_CLUSTERS,
    KMEANS_ITERS,
    kmeans_fit,
    q_kmeans_clusters,
)
from tests.conftest import SF_SMALL


def _numpy_lloyd(X: np.ndarray, k: int, iters: int):
    cents = X[:k].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin ties -> lowest index
        for ci in range(k):
            members = X[assign == ci]
            if len(members):
                cents[ci] = members.mean(axis=0)
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return cents, d.argmin(axis=1)


def test_kmeans_matches_numpy_reference(spark):
    emb = sorted(
        (r.vec_id, r.embedding)
        for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    )
    X = np.array([v for _, v in emb], dtype=np.float64)
    ref_cents, ref_assign = _numpy_lloyd(X, K_CLUSTERS, KMEANS_ITERS)

    cents, assigned = kmeans_fit(spark, SF_SMALL)
    got = {r.vec_id: r.cluster for r in assigned.collect()}

    # centroids agree to float accumulation-order tolerance
    assert np.allclose(np.array(cents), ref_cents, rtol=1e-9, atol=1e-12)
    # assignments identical (margins are far above the float noise)
    ids = [i for i, _ in emb]
    mismatches = [i for n, i in enumerate(ids) if got[i] != ref_assign[n]]
    assert not mismatches, mismatches[:10]


def test_kmeans_output_invariants(spark):
    out = q_kmeans_clusters(spark, SF_SMALL).collect()
    n_total = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    assert len(out) <= K_CLUSTERS
    assert sum(r.n_vectors for r in out) == n_total  # a partition of the corpus
    assert all(r.mean_dist2 >= 0 for r in out)


def test_kmeans_quantized_matches_float_assignments(spark):
    """The registered fixed-point twin must assign every vector to
    the same cluster as the float path: 1e-6 quantization noise is
    orders of magnitude below the assignment margins."""
    from projet_etl_spark.operators.kmeans import kmeans_fit_q

    _, assigned_f = kmeans_fit(spark, SF_SMALL)
    _, assigned_q = kmeans_fit_q(spark, SF_SMALL)
    f = {r.vec_id: r.cluster for r in assigned_f.collect()}
    q = {r.vec_id: r.cluster for r in assigned_q.collect()}
    assert f == q
