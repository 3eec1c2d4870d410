"""Interleaved A/B probe for persist-placement changes (r13).

Cross-session timings on this host swing 2-3x (JIT warmup continues
for minutes; ambient load decays slowly), so persist-placement deltas
are only measurable INTERLEAVED in one session. The no-persist
variant is recovered by monkeypatching cache.eager_persist /
lazy_persist to identity (the r13 edits import them at call time), so
A and B run the identical plan modulo the persists, alternating
A B A B ... with caches released before every rep.

Usage: python docs/bench/ab_persist.py q1 q2 ... [--reps 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

from projet_etl_spark import cache  # noqa: E402
from projet_etl_spark.cache import release_caches  # noqa: E402
from projet_etl_spark.plans.registry import queries  # noqa: E402
from projet_etl_spark.session import get_spark  # noqa: E402

_REAL_EAGER = cache.eager_persist
_REAL_LAZY = cache.lazy_persist


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=6, help="reps PER variant")
    args = ap.parse_args()

    spark = get_spark(app_name="r13-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    qs["cat"](spark, "/root/testdata/sf0.1").collect()
    sf = "/root/testdata/sf0.1"

    for name in args.names:
        times: dict[str, list[float]] = {"persist": [], "nopersist": []}
        for rep in range(args.reps):
            for variant in ("persist", "nopersist"):
                if variant == "nopersist":
                    cache.eager_persist = lambda df: df
                    cache.lazy_persist = lambda df: df
                else:
                    cache.eager_persist = _REAL_EAGER
                    cache.lazy_persist = _REAL_LAZY
                release_caches(rollups=False)
                t0 = time.perf_counter()
                qs[name](spark, sf).write.format("noop").mode("overwrite").save()
                times[variant].append(time.perf_counter() - t0)
        cache.eager_persist = _REAL_EAGER
        cache.lazy_persist = _REAL_LAZY
        p, n = times["persist"], times["nopersist"]
        print(
            f"{name}: persist min={min(p):.3f} med={sorted(p)[len(p)//2]:.3f} | "
            f"nopersist min={min(n):.3f} med={sorted(n)[len(n)//2]:.3f} | "
            f"p={[round(t,2) for t in p]} n={[round(t,2) for t in n]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
