"""Full-registry certification sweep — the judge's independent
verification harness, promoted into the repo (round-9, verdict item 6)
so the per-round claim "all N registry queries value-match DuckDB at
both SFs under a non-UTC timezone" is reproducible by anyone.

Runs every ``queries()`` entry against its ``oracle_sql()`` twin with
the conftest canonical value compare (sorted columns, canonicalized
cells — the driver's hashing discipline), in THIS process's Spark
session configured with a deliberately non-UTC session timezone on
both engines, so any TZ-fragile oracle or plan fails here first.

Usage (fresh process per run; ~4 min at sf0.01, ~8 min at sf0.1 on
local[16]):

    python docs/bench/full_sweep.py                      # sf0.01
    python docs/bench/full_sweep.py /root/testdata/sf0.1
    SWEEP_TZ=Asia/Kolkata python docs/bench/full_sweep.py
    SWEEP_OUT=docs/bench/r13_sweep_sf001.json python docs/bench/full_sweep.py

Prints one line per mismatch and a final JSON summary line:
{"sf_dir": ..., "tz": ..., "total": N, "oracled": M, "matched": K,
 "rows_only": [...], "mismatched": [...], "sec": S}
Exit code 0 iff every oracled query value-matches.

Per-round artifact convention (r13, r12 verdict item 5): the driver
hard-checks only the first 50 ``queries()`` entries per round, so the
LRU rotation takes ~4 rounds to cycle the registry. To keep SOFT
whole-registry evidence at every HEAD, each round's certification
sweeps are committed as ``docs/bench/r{NN}_sweep_sf001.json`` /
``_sf01.json`` (``SWEEP_OUT=...``) next to the rotation they certify;
``rotation.py`` prints the latest committed sweep next to the ledger
histogram so staleness review reads both in one place.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    tz = os.environ.get("SWEEP_TZ", "America/New_York")
    cpus = os.environ.get("SWEEP_CPUS", "16")
    # TZ on BOTH engines: the python process env (DuckDB reads it)
    # and the Spark session conf. ensure_engine_conf resets Spark's
    # session TZ to UTC inside every query wrapper — the point of
    # setting a hostile TZ here is to certify that reset holds.
    os.environ["TZ"] = tz
    time.tzset()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as ent
    from tests.conftest import rows_canonical

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", tz)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = ent.queries(), ent.oracle_sql()
    t0 = time.time()
    rows_only, mismatched, matched = [], [], 0
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # a query that raises is a mismatch
            print(f"{name} SPARK-ERROR {type(e).__name__}: {e}", flush=True)
            mismatched.append(name)
            continue
        if name not in osql:
            rows_only.append(name)
            continue
        try:
            res = con.execute(osql[name])
            drows = res.fetchall()
            dcols = [d[0] for d in res.description]
        except Exception as e:  # an oracle that raises is a mismatch,
            # not a sweep abort — the summary must always cover every
            # remaining query (round-10 advisor item)
            print(f"{name} ORACLE-ERROR {type(e).__name__}: {e}", flush=True)
            mismatched.append(name)
            continue
        _, sc = rows_canonical(scols, srows)
        _, dc = rows_canonical(dcols, drows)
        if sorted(scols) == sorted(dcols) and sc == dc:
            matched += 1
        else:
            mismatched.append(name)
            print(
                f"{name} MISMATCH spark={len(srows)} oracle={len(drows)} "
                f"cols {sorted(scols) == sorted(dcols)}",
                flush=True,
            )
    summary = {
        "sf_dir": sf_dir,
        "tz": tz,
        "total": len(qs),
        "oracled": len(qs) - len(rows_only),
        "matched": matched,
        "rows_only": sorted(rows_only),
        "mismatched": sorted(mismatched),
        "sec": round(time.time() - t0, 1),
    }
    print(json.dumps(summary), flush=True)
    out = os.environ.get("SWEEP_OUT", "")
    if out:
        with open(out, "w", encoding="utf-8") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
            fh.write("\n")
    return 1 if mismatched else 0


if __name__ == "__main__":
    raise SystemExit(main())
