"""Round-9 scaling evidence: this round's new/reshaped queries at
sf0.1 vs the sf1-equivalent (10x) fixture at /tmp/sf1equiv (method:
docs/SCALE.md round 6). Min-of-2 wall-times, tracked caches released
before each timing; store/layout/staged-label builds are
fingerprint-cached refresh cost (the first call at each sf pays the
build; timings here measure the serve path, which is what repeats in
production). Run on a QUIET machine only."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from projet_etl_spark.cache import release_caches  # noqa: E402
from projet_etl_spark.plans.registry import queries  # noqa: E402
from projet_etl_spark.session import get_spark  # noqa: E402

NEW = [
    # round-9 additions
    "filter-agreement-kappa",
    "dedup-threshold-sweep",
    "pack-efficiency",
    "embedding-coverage-audit",
    # round-9 reshapes: fused single-scan plan / staged-label consumers
    "quality-rules-vs-model",
    "dedup-canonical",
    "dedup-mass-by-lang",
    "split-by-cluster",
    "corpus-survivorship",
    "pipeline-clean-corpus",
]

spark = get_spark(app_name="scale10x-r9")
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
