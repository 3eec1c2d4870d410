"""Round-13 scaling evidence (sf0.1 vs the /tmp/sf1equiv_r12 10x
fixture — the r12 isometries, reused verbatim; min-of-2 wall-times on
a QUIET machine, method: docs/SCALE.md round 6) for the four NEW r13
queries, plus the candidate-mass accounting that is the POINT of the
wide geometry (r12 verdict item 2):

- dedup-embedding-lsh-hi-wide / embedding-lsh-recall-hi-wide: the
  staircase knob RUN at the width it prescribes for the 10x corpus —
  RPHI_WIDE_BANDS x RPHI_WIDE_BAND_BITS = rphi_geometry_for(26,667)
  = 14 x 21 (asserted at startup, same pin as the pytest). The
  evidence the verdict ordered: at N = 26,667 the FIXTURE geometry's
  chance-collision mass (RPHI_BANDS * C(N,2) / 2^16 ~ 65k candidate
  pairs) dominates the ~6.7k true pairs ~10:1, while the WIDE
  geometry's (14 * C(N,2) / 2^21 ~ 2.4k) sits BELOW the true-pair
  density — candidate mass drops toward the true pairs, measured and
  printed for both geometries at both SFs, with the recall audit
  still >= RPHI_RECALL_TARGET at the wide geometry.
- dedup-embedding-lsh-hi-sharded / embedding-shard-recall: the
  staircase's OTHER prescription run — partition-disjoint sharding
  via SHARD_NPROBE-probe IVF medoid-cell replication, the banded
  join gaining `cell` as a leading key; the recall twin prices the
  sharding loss (1-probe co-location ~0.80 on this fixture, 2-probe
  >= 0.97) at both SFs.
- url-frontier-store-compacted / embedding-pairs-store-compacted:
  store SERVE cost over the compacted layouts (the ensure_staged
  build+compact is refresh cost by the store accounting — the first
  timed call builds, the min-of-2 reads the serve path, exactly like
  bm25-store-compacted in the r10 ledger).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale10x_r12 import DST_DIR, SRC_DIR, build_fixture  # noqa: E402

from projet_etl_spark.cache import release_caches  # noqa: E402
from projet_etl_spark.plans.registry import queries  # noqa: E402
from projet_etl_spark.session import get_spark  # noqa: E402

NEW = [
    "dedup-embedding-lsh-hi-wide",
    "embedding-lsh-recall-hi-wide",
    "dedup-embedding-lsh-hi-sharded",
    "embedding-shard-recall",
    "url-frontier-store-compacted",
    "embedding-pairs-store-compacted",
]


def _candidate_stats(spark, sf: str, bands_n: int, bits: int) -> dict:
    """Measured banded candidate volume vs true pairs at a geometry —
    the chance-collision term the staircase prices, as a number."""
    from pyspark.sql import functions as F

    from projet_etl_spark.operators import dedup

    withn = dedup.planted_embeddings(spark, sf)
    bands = dedup._rphi_band_keys(withn, bands_n, bits)
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
    return {
        "geometry": f"{bands_n}x{bits}",
        "n_vectors": n,
        "n_candidates": n_cand,
        "n_true": n // (dedup.PLANT_MOD + 1),
    }


def main() -> None:
    from projet_etl_spark.operators import dedup

    # the committed wide constants ARE the knob's choice for the 10x
    # corpus — same pin as tests/test_round13_ops.py
    assert (
        dedup.RPHI_WIDE_BANDS,
        dedup.RPHI_WIDE_BAND_BITS,
    ) == dedup.rphi_geometry_for(dedup.RPHI_WIDE_N)

    if not os.path.exists(os.path.join(DST_DIR, "embeddings.parquet")):
        print("building 10x fixture ...", flush=True)
        build_fixture()

    spark = get_spark(app_name="scale10x-r13")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    out = {"load_start": round(os.getloadavg()[0], 2)}
    for sf in (SRC_DIR, DST_DIR):
        for name in NEW:
            best = 1e9
            for _ in range(2):
                release_caches(rollups=False)
                t0 = time.perf_counter()
                df = qs[name](spark, sf)
                rows = df.collect()
                best = min(best, time.perf_counter() - t0)
            out.setdefault(name, {})[sf] = round(best, 2)
            print(name, sf, round(best, 2), flush=True)
            if name in ("embedding-lsh-recall-hi-wide", "embedding-shard-recall"):
                r = rows[0]
                key = (
                    "wide-recall"
                    if name == "embedding-lsh-recall-hi-wide"
                    else "shard-recall"
                )
                out.setdefault(key, {})[sf] = {
                    "n_true_pairs": r.n_true_pairs,
                    "n_found": r.n_found,
                    "recall": round(r.recall, 4),
                }
                print(" ", key, sf, out[key][sf], flush=True)
        for bands_n, bits in (
            (dedup.RPHI_BANDS, dedup.RPHI_BAND_BITS),
            (dedup.RPHI_WIDE_BANDS, dedup.RPHI_WIDE_BAND_BITS),
        ):
            st = _candidate_stats(spark, sf, bands_n, bits)
            out.setdefault("hi-candidates", {}).setdefault(sf, []).append(st)
            print("hi-candidates", sf, st, flush=True)
    out["load_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
