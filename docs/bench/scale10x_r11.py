"""Round-11 scaling evidence (sf0.1 vs the /tmp/sf1equiv 10x
fixture, min-of-2 wall-times on a QUIET machine; method:
docs/SCALE.md round 6). Two groups:

1. The four NEW r11 queries (standard per-round protocol): the BPE
   merge-learning pair and the URL-grain pair.
2. The heavy FROM-SCRATCH builders the r10 verdict flagged as the
   remaining blank in the scaling ledger (item 6): semantic-clusters,
   dedup-clusters, dedup-prefix-filter, supplier-pagerank — their own
   10x curves, not just their staged consumers'.

Fixture builders (this script owns them; replicas are structure-
preserving isometries so the TRUE work grows linearly, never
quadratically):

- documents: 10x replicas with a per-replica LETTER-tag vocabulary
  relabeling (token w -> "z{a..i}" + w). Unlike r10's "r{r}" digit
  tags, letter tags keep every relabeled token inside the BPE
  learner's ^[A-Za-z]{2,}$ vocabulary filter, so the learned-vocab
  working set ALSO grows ~10x — the axis the bpe queries must be
  measured on. The map stays a bijection (within-replica
  shingle/near-dup structure exact, cross-replica overlap zero).
- embeddings: 10x replicas; replica r's vectors multiply by a
  deterministic per-replica ±1 dimension mask — an isometry, so
  within-replica cosines (and the semantic near-dup graph) are
  preserved exactly while cross-replica similarities decorrelate.
- orders/lineitem/supplier: 10x replicas with disjoint key offsets —
  ten disconnected copies of the customer-supplier graph, so
  PageRank's node/edge count grows 10x with no new coupling.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from projet_etl_spark.cache import release_caches  # noqa: E402
from projet_etl_spark.plans.registry import queries  # noqa: E402
from projet_etl_spark.session import get_spark  # noqa: E402

SRC_DIR = "/root/testdata/sf0.1"
DST_DIR = "/tmp/sf1equiv_r11"
REPLICAS = 10

NEW = [
    "bpe-learn-merges",
    "bpe-learned-count",
    "bpe-fertility-by-lang",
    "url-canonicalize",
    "dedup-exact-url",
    "url-canonical-fetches",
    "embedding-lsh-recall",
]
BUILDERS = [
    "dedup-clusters",
    "semantic-clusters",
    "dedup-prefix-filter",
    "supplier-pagerank",
    # reshaped this round (RP banding rebuild + streaming verify):
    # its own 10x curve belongs next to the builders'
    "dedup-embedding-lsh",
]


def _build_documents() -> None:
    import pandas as pd
    import pyarrow.parquet as pq

    base = pq.read_table(os.path.join(SRC_DIR, "documents.parquet")).to_pandas()
    n = int(base["doc_id"].max()) + 1
    parts = []
    for r in range(REPLICAS):
        d = base.copy()
        d["doc_id"] = d["doc_id"] + r * n
        if r:
            tag = "z" + chr(ord("a") + r - 1)  # za..zi: alpha-only
            d["text"] = d["text"].map(
                lambda s, tag=tag: " ".join(tag + w for w in s.split())
            )
        parts.append(d)
    pd.concat(parts, ignore_index=True).to_parquet(
        os.path.join(DST_DIR, "documents.parquet"), index=False
    )


def _build_embeddings() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SRC_DIR, "embeddings.parquet"))
    vec_id = t["vec_id"].to_numpy()
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    label = t["label"].to_numpy()
    n, dim = int(vec_id.max()) + 1, emb.shape[1]
    ids, vecs, labs = [], [], []
    for r in range(REPLICAS):
        rng = np.random.default_rng(r)
        mask = (
            np.ones(dim, dtype=np.float32)
            if r == 0
            else rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
        )
        ids.append(vec_id + r * n)
        vecs.append(emb * mask)
        labs.append(label)
    out = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in np.concatenate(vecs)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(np.concatenate(labs), type=pa.int32()),
        }
    )
    pq.write_table(out, os.path.join(DST_DIR, "embeddings.parquet"))


def _build_graph_tables() -> None:
    import pandas as pd
    import pyarrow.parquet as pq

    orders = pq.read_table(os.path.join(SRC_DIR, "orders.parquet")).to_pandas()
    li = pq.read_table(os.path.join(SRC_DIR, "lineitem.parquet")).to_pandas()
    supp = pq.read_table(os.path.join(SRC_DIR, "supplier.parquet")).to_pandas()
    n_ord = int(orders["o_orderkey"].max()) + 1
    n_cust = int(orders["o_custkey"].max()) + 1
    n_supp = int(supp["s_suppkey"].max()) + 1
    po, pl, ps = [], [], []
    for r in range(REPLICAS):
        o = orders.copy()
        o["o_orderkey"] = o["o_orderkey"] + r * n_ord
        o["o_custkey"] = o["o_custkey"] + r * n_cust
        po.append(o)
        x = li.copy()
        x["l_orderkey"] = x["l_orderkey"] + r * n_ord
        x["l_suppkey"] = x["l_suppkey"] + r * n_supp
        pl.append(x)
        s = supp.copy()
        s["s_suppkey"] = s["s_suppkey"] + r * n_supp
        ps.append(s)
    pd.concat(po, ignore_index=True).to_parquet(
        os.path.join(DST_DIR, "orders.parquet"), index=False
    )
    pd.concat(pl, ignore_index=True).to_parquet(
        os.path.join(DST_DIR, "lineitem.parquet"), index=False
    )
    pd.concat(ps, ignore_index=True).to_parquet(
        os.path.join(DST_DIR, "supplier.parquet"), index=False
    )


def build_fixture() -> None:
    os.makedirs(DST_DIR, exist_ok=True)
    _build_documents()
    _build_embeddings()
    _build_graph_tables()


def main() -> None:
    if not os.path.exists(os.path.join(DST_DIR, "supplier.parquet")):
        print("building 10x fixture ...", flush=True)
        build_fixture()

    spark = get_spark(app_name="scale10x-r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    out = {}
    for sf in (SRC_DIR, DST_DIR):
        for name in NEW + BUILDERS:
            best = 1e9
            for _ in range(2):
                release_caches(rollups=False)
                t0 = time.perf_counter()
                qs[name](spark, sf).collect()
                best = min(best, time.perf_counter() - t0)
            out.setdefault(name, {})[sf] = round(best, 2)
            print(name, sf, round(best, 2), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
