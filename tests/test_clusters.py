"""Connected-components dedup clustering vs a driver-side union-find
on the same edge set, plus deep-chain convergence (pointer doubling)
and loud non-convergence."""

from __future__ import annotations

import pytest

from projet_etl_spark.operators.clusters import connected_components, q_dedup_clusters
from projet_etl_spark.operators.dedup import q_dedup_minhash_lsh
from tests.conftest import SF_SMALL


def _union_find(n_edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in n_edges:
        union(a, b)
    return {x: find(x) for x in parent}


def test_clusters_match_union_find(spark):
    edges = [
        (r.doc_a, r.doc_b) for r in q_dedup_minhash_lsh(spark, SF_SMALL).collect()
    ]
    assert edges, "expected near-dup pairs in the synthetic corpus"
    want = _union_find(edges)
    got = {
        r.doc_id: r.cluster_id for r in q_dedup_clusters(spark, SF_SMALL).collect()
    }
    # every edge-touched doc gets its union-find root
    for doc, root in want.items():
        assert got[doc] == root, (doc, got[doc], root)
    # untouched docs are singletons labeling themselves
    touched = set(want)
    singles = [d for d, c in got.items() if d not in touched]
    assert all(got[d] == d for d in singles)
    # at least one real multi-doc cluster exists
    from collections import Counter

    sizes = Counter(got.values())
    assert max(sizes.values()) >= 2


def _chain(spark, n):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "src long, dst long"
    )
    vertices = spark.createDataFrame([(i,) for i in range(1, n + 1)], "vertex long")
    return edges, vertices


def test_deep_chain_converges_in_log_rounds(spark):
    # Diameter-63 chain: plain one-hop propagation needs >30 rounds
    # (the old 20-round cap silently mislabeled it); pointer doubling
    # must finish well inside 10.
    edges, vertices = _chain(spark, 64)
    labels = connected_components(edges, vertices, max_rounds=10)
    got = {r.vertex: r.label for r in labels.collect()}
    assert got == {v: 1 for v in range(1, 65)}


def test_unconverged_raises_instead_of_partial_labels(spark):
    edges, vertices = _chain(spark, 64)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, vertices, max_rounds=3)


def test_random_graphs_match_union_find(spark):
    """Pointer doubling on random graphs (including multi-component,
    self-loop and duplicate-edge shapes) must agree with union-find."""
    import random

    rng = random.Random(17)
    for trial in range(5):
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        edges = [
            (rng.randint(1, n), rng.randint(1, n)) for _ in range(m)
        ]
        e_df = spark.createDataFrame(edges, "src long, dst long")
        v_df = spark.createDataFrame([(v,) for v in range(1, n + 1)], "vertex long")
        got = {
            r.vertex: r.label for r in connected_components(e_df, v_df).collect()
        }
        want = _union_find(edges)
        for v in range(1, n + 1):
            assert got[v] == want.get(v, v), (trial, v, got[v], want.get(v, v))


def test_two_components_and_singletons(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    vertices = spark.createDataFrame(
        [(v,) for v in (1, 2, 3, 10, 11, 99)], "vertex long"
    )
    got = {r.vertex: r.label for r in connected_components(edges, vertices).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}
