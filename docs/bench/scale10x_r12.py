"""Round-12 scaling evidence (sf0.1 vs the /tmp/sf1equiv_r12 10x
fixture, min-of-2 wall-times on a QUIET machine; method:
docs/SCALE.md round 6) for the four NEW r12 queries:

- dedup-embedding-lsh-hi / embedding-lsh-recall-hi: the deployment-
  threshold regime. The r11 verdict's item-2 gate is a ~LINEAR 10x
  point here — the true pair set is |N|/PLANT_MOD by construction
  (one planted twin per third vector), so unlike the fixture-
  threshold family (whose true pair set is itself quadratic, r11
  adjudication) the output tracks N and the banded equi-join's only
  superlinear term is the chance-collision mass
  RPHI_BANDS * C(N,2) / 2^RPHI_BAND_BITS, printed alongside the
  wall-times so the trade is measured, not asserted.
- semantic-exemplars-hi: the prune export — pointer-doubling CC
  over the hi pairs (edge count linear in N) reduced to exemplars.
- embedding-pairs-store / url-frontier-store: store SERVE cost (the ensure_staged build is
  refresh cost by the store accounting — the first timed call builds,
  the min-of-2 reads the serve path, exactly like daily-counts-store
  in the r9 ledger).

Fixture builders are the r11 isometries (docs/bench/scale10x_r11.py):
documents replicate with offset doc_ids (URL page identity keeps its
PAGE_MOD structure, so shared pages stay shared and singleton URLs
grow 10x — the frontier's row count grows ~linearly); embeddings
replicate under per-replica +/-1 dimension masks (within-replica
cosines exact, cross-replica decorrelated), and the plant device
keys on the OFFSET vec_ids so every replica contributes its own
planted twins — true hi-pairs grow exactly 10x.
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
DST_DIR = "/tmp/sf1equiv_r12"
REPLICAS = 10

NEW = [
    "dedup-embedding-lsh-hi",
    "embedding-lsh-recall-hi",
    "semantic-exemplars-hi",
    "embedding-pairs-store",
    "url-frontier-store",
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


def build_fixture() -> None:
    os.makedirs(DST_DIR, exist_ok=True)
    _build_documents()
    _build_embeddings()


def _candidate_stats(spark, sf: str) -> dict:
    """Measured candidate volume vs true pairs for the hi path — the
    chance-collision term the geometry comment prices."""
    from pyspark.sql import functions as F

    from projet_etl_spark.operators import dedup

    withn = dedup.planted_embeddings(spark, sf)
    bands = dedup._rphi_band_keys(withn)
    left = bands.select(F.col("vec_id").alias("vec_a"), "band", "key")
    right = bands.select(F.col("vec_id").alias("vec_b"), "band", "key")
    n_cand = (
        left.join(right, ["band", "key"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
        .count()
    )
    n = withn.count()
    return {"n_vectors": n, "n_candidates": n_cand, "n_true": n // (dedup.PLANT_MOD + 1)}


def main() -> None:
    if not os.path.exists(os.path.join(DST_DIR, "embeddings.parquet")):
        print("building 10x fixture ...", flush=True)
        build_fixture()

    spark = get_spark(app_name="scale10x-r12")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    out = {}
    for sf in (SRC_DIR, DST_DIR):
        for name in NEW:
            best = 1e9
            for _ in range(2):
                release_caches(rollups=False)
                t0 = time.perf_counter()
                qs[name](spark, sf).collect()
                best = min(best, time.perf_counter() - t0)
            out.setdefault(name, {})[sf] = round(best, 2)
            print(name, sf, round(best, 2), flush=True)
        out.setdefault("hi-candidates", {})[sf] = _candidate_stats(spark, sf)
        print("hi-candidates", sf, out["hi-candidates"][sf], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
