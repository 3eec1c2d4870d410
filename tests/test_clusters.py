"""Connected-components dedup clustering vs a driver-side union-find
on the same edge set."""

from __future__ import annotations

from projet_etl_spark.operators.clusters import q_dedup_clusters
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
