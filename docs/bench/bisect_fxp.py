"""Round-8 bisect: cost of the fixed_point_agg runtime bound guard.

Runs a money-heavy headline subset at sf0.1 under one guard mode
(argv[1]: persum | combined | off) and prints min-of-reps timings.
Fresh process per mode because _GUARD_MODE is read at import.
"""

import json
import os
import sys
import time

mode = sys.argv[1]
os.environ["SPARK_GRAFT_FXP_GUARD"] = mode
sys.path.insert(0, "/root/repo")

from projet_etl_spark.plans.registry import queries  # noqa: E402
from projet_etl_spark.session import get_spark  # noqa: E402
from projet_etl_spark.cache import release_caches  # noqa: E402

SUBSET = [
    "pricing-summary",
    "revenue-by-nation",
    "top-unshipped-orders",
    "corr-qty-price",
    "top-magasins",
    "score-sante-touts-les-mois",
    "score-evolution",
    "daily-moving-avg",
]

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name=f"bisect-fxp-{mode}")
spark.sparkContext.setLogLevel("ERROR")
qs = queries()
qs[SUBSET[0]](spark, sf_dir).collect()  # warmup

samples = {n: [] for n in SUBSET}
for _ in range(4):
    release_caches(rollups=False)
    for n in SUBSET:
        t0 = time.perf_counter()
        qs[n](spark, sf_dir).collect()
        samples[n].append(time.perf_counter() - t0)

out = {n: round(min(ts), 4) for n, ts in samples.items()}
print(json.dumps({"mode": mode, "total": round(sum(out.values()), 4), "queries": out}))
spark.stop()
