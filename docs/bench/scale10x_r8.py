"""Round-8 scaling evidence: the round's new queries at sf0.1 vs the
sf1-equivalent (10x) fixture at /tmp/sf1equiv (method: docs/SCALE.md
round 6). Min-of-2 wall-times, tracked caches released before each
timing; store/layout builds are fingerprint-cached refresh cost.
Run on a QUIET machine only."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from projet_etl_spark.cache import release_caches  # noqa: E402
from projet_etl_spark.plans.registry import queries  # noqa: E402
from projet_etl_spark.session import get_spark  # noqa: E402

NEW = [
    "split-by-cluster",
    "bottomk-store",
    "embedding-dim-variance",
    "vocab-coverage",
    "quality-rules-vs-model",
    "docs-pii-density",
    "corpus-survivorship",
    "docs-lang-margin",
    "ann-ivf-store",
    "docs-quality-rules",
]

spark = get_spark(app_name="scale10x-r8")
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
