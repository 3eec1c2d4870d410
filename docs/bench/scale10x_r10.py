"""Round-10 scaling evidence: the four new domain-grain/incremental
queries at sf0.1 vs a local sf1-equivalent (10x) fixture, min-of-2
wall-times on a QUIET machine (method: docs/SCALE.md round 6; the
measured numbers land in SCALE.md's round-10 section).

This script also OWNS the 10x fixture build (earlier rounds built it
ad hoc and never committed the builder): documents replicate 10x
with doc_id offsets, and every replica r > 0 gets a per-replica
VOCABULARY RELABELING (each token w -> "r{r}" + w) — the text twin
of the embeddings sign-flip isometry: within-replica shingle/near-dup
structure is preserved EXACTLY (token map is a bijection), while
cross-replica shingle overlap is zero, so the true pair graph grows
linearly with data instead of quadratically. Only documents.parquet
is built — all four round-10 queries are document-grain.

Staged-label note: the first call at the 10x fixture pays the
fingerprint-keyed label build (refresh cost); min-of-2 reports the
serve path, which is what repeats in production — same accounting as
every staged table since round 8.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from projet_etl_spark.cache import release_caches  # noqa: E402
from projet_etl_spark.plans.registry import queries  # noqa: E402
from projet_etl_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1/documents.parquet"
DST_DIR = "/tmp/sf1equiv"
REPLICAS = 10

NEW = [
    "docs-domain-profile",
    "dedup-domain-attribution",
    "corpus-domain-budget",
    "dedup-incremental-rate",
    "quality-by-domain",
]


def build_fixture() -> None:
    import pandas as pd
    import pyarrow.parquet as pq

    base = pq.read_table(SRC).to_pandas()
    n = int(base["doc_id"].max()) + 1
    parts = []
    for r in range(REPLICAS):
        d = base.copy()
        d["doc_id"] = d["doc_id"] + r * n
        if r:
            tag = f"r{r}"
            d["text"] = d["text"].map(
                lambda s, tag=tag: " ".join(tag + w for w in s.split())
            )
        parts.append(d)
    os.makedirs(DST_DIR, exist_ok=True)
    pd.concat(parts, ignore_index=True).to_parquet(
        os.path.join(DST_DIR, "documents.parquet"), index=False
    )


def main() -> None:
    if not os.path.exists(os.path.join(DST_DIR, "documents.parquet")):
        print("building 10x fixture ...", flush=True)
        build_fixture()

    spark = get_spark(app_name="scale10x-r10")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    out = {}
    for sf in ("/root/testdata/sf0.1", DST_DIR):
        for name in NEW:
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
