"""Driver-rotation generator — encodes the staleness-bound rule from
the round-8 verdict (item 5) so `_DRIVER_PREFIX` is derived, not
hand-curated.

The driver's CORRECTNESS artifact hard-checks only the FIRST 50
entries of ``queries()``. The rule, in priority order:

1. NEW queries this round (never have a hard row) — always first.
2. Queries downstream of modules TOUCHED this round — they must
   re-earn hard rows (listed per-round in ``TOUCHED`` below, with the
   reason).
3. The two reference-parity sentinels (top-1, avg-cat-fab-10-mag).
4. Every remaining slot is filled LEAST-RECENTLY-CHECKED FIRST from
   the ledger of hash-match rows across all committed
   CORRECTNESS_r*.json artifacts — bounding how stale any query's
   last hard row can get (after r9: nothing older than r5; steady
   state: ~4 rounds, since 50 slots cycle a 193-query registry).

Usage: ``python docs/bench/rotation.py [round]`` prints the ledger
histogram and the generated prefix tuple, ready to paste into
plans/registry.py. The registry comment cites this script; a pytest
(tests/test_round9_ops.py) pins that the committed prefix satisfies
the staleness bound, so hand edits can't silently rot.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

PREFIX_LEN = 50
SENTINELS = ("top-1", "avg-cat-fab-10-mag")

# Round-9 inputs to the rule. NEW = added this round (no hard row
# anywhere). TOUCHED = serve paths whose implementing modules changed
# in the r9 diff: the store readers now route through
# storeio.read_store (ivf/dailycounts), the cluster-label staging
# rewires every CC consumer, qualrules' vs-model fuse, and the
# parquet_fingerprint directory-shape change rekeys every staged
# layout (parity views + stores + cluster labels).
NEW: tuple[str, ...] = (
    "filter-agreement-kappa",
    "dedup-threshold-sweep",
    "pack-efficiency",
    "embedding-coverage-audit",
    # late round-9 additions (DSIR resampling weights, dedup source
    # attribution + size histogram, int8 recall audit). Eight NEW
    # queries consume eight LRU fill slots, so three r4-stale queries
    # overflow to r10 (they are first in line there by the LRU rule,
    # and this round's committed full_sweep run value-certifies them
    # at both SFs in the meantime) — the pinned bound in
    # tests/test_round9_ops.py states exactly this.
    "dsir-importance",
    "dedup-source-attribution",
    "dedup-cluster-size-histogram",
    "ann-quantized-recall",
    "quality-model-calibration",
    "dsir-store",
)
# The from-scratch CC builders (dedup-clusters, semantic-clusters)
# are NOT listed: their plans are byte-identical this round — only
# their CONSUMERS switched to the staged labels — and dedup-clusters
# re-enters through the LRU fill anyway (last hard row r4).
TOUCHED: tuple[str, ...] = (
    "ann-ivf-store",
    "daily-counts-store",
    "quality-rules-vs-model",
    "dedup-canonical",
    "dedup-mass-by-lang",
    "split-by-cluster",
    "split-leakage-audit",
    "corpus-survivorship",
    "semantic-exemplars",
    "pipeline-clean-corpus",
    "pipeline-training-export",
    "top-magasins",
)


def ledger() -> dict[str, int]:
    """query name -> last round with a hash_match=true driver row."""
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        try:
            rows = json.load(open(f))
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def generate(registry_names: list[str]) -> tuple[str, ...]:
    last = ledger()
    prefix: list[str] = [n for n in NEW if n in registry_names]
    for n in TOUCHED + SENTINELS:
        if n in registry_names and n not in prefix:
            prefix.append(n)
    # least-recently-checked fill, oldest first; never-checked (no
    # ledger row at all) sorts before everything
    rest = sorted(
        (n for n in registry_names if n not in prefix),
        key=lambda n: (last.get(n, 0), n),
    )
    prefix.extend(rest[: PREFIX_LEN - len(prefix)])
    return tuple(prefix[:PREFIX_LEN])


def main() -> None:
    from projet_etl_spark.plans import registry

    names = list(registry.REGISTRY)
    last = ledger()
    from collections import Counter

    print("ledger histogram (last hard row -> #queries):")
    print("  ", dict(sorted(Counter(last.get(n, 0) for n in names).items())))
    prefix = generate(names)
    oldest_after = min(
        (last.get(n, 0) for n in names if n not in prefix), default=0
    )
    print(f"generated prefix ({len(prefix)}); oldest unchecked row after "
          f"this rotation lands: r{oldest_after}")
    print("_DRIVER_PREFIX: tuple[str, ...] = (")
    for n in prefix:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()
