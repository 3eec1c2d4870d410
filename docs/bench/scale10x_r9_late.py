"""Round-9 LATE-addition scaling evidence (the session after the
cold map landed): the six new queries plus the staged scored-pair
consumers, at sf0.1 vs the sf1-equivalent (10x) fixture at
/tmp/sf1equiv (method: docs/SCALE.md round 6). Min-of-2 wall-times,
tracked caches released before each timing; store/layout/staged
builds are fingerprint-cached refresh cost (timings measure the
serve path, which is what repeats in production). Run on a QUIET
machine only. The round-9 EARLY list lives in scale10x_r9.py; the
measured numbers for both are recorded in SCALE.md's round-9
sections."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from projet_etl_spark.cache import release_caches  # noqa: E402
from projet_etl_spark.plans.registry import queries  # noqa: E402
from projet_etl_spark.session import get_spark  # noqa: E402

NEW = [
    # round-9 late additions (SCALE.md "Round-9 late additions")
    "dsir-importance",
    "dsir-store",
    "dedup-source-attribution",
    "dedup-cluster-size-histogram",
    "ann-quantized-recall",
    "quality-model-calibration",
    # staged scored-pair consumers + the from-scratch builder
    "dedup-threshold-sweep",
    "split-leakage-audit",
    "dedup-minhash-lsh",
]

spark = get_spark(app_name="scale10x-r9-late")
spark.sparkContext.setLogLevel("ERROR")
qs = queries()
out = {}
for sf in ("/root/testdata/sf0.1", "/tmp/sf1equiv"):
    if not os.path.exists(sf):
        continue
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
