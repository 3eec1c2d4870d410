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
   the ledger of hash-match rows across the committed
   CORRECTNESS_r*.json artifacts — bounding how stale any query's
   last hard row can get (steady state: ~4 rounds, since 50 slots
   cycle a ~200-query registry).

Round-proofing (round-10, verdict item 1): ``generate`` takes the
artifact-round set EXPLICITLY. The committed prefix is generated from
the rounds that existed at commit time (``ROUNDS_AT_COMMIT``), so the
driver dropping the next round's artifact onto the tree can never
invalidate the pinned tuple — the r9 pin test failed at judging time
for exactly that reason (it globbed the ledger from disk, and the r9
artifact landed after commit).

Usage: ``python docs/bench/rotation.py`` prints the ledger histogram
and the generated prefix tuple (from ``ROUNDS_AT_COMMIT``), ready to
paste into plans/registry.py. The registry comment cites this script;
a pytest (tests/test_round10_ops.py) pins that the committed prefix
equals ``generate(names, rounds=ROUNDS_AT_COMMIT)`` and satisfies the
staleness bound, so hand edits can't silently rot.
"""

from __future__ import annotations

import json
import os
import sys
from collections.abc import Iterable

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

PREFIX_LEN = 50
SENTINELS = ("top-1", "avg-cat-fab-10-mag")

# The artifact rounds that exist in the tree when this round's prefix
# is committed. The r14 prefix is generated over the r01..r13 ledger;
# the driver's CORRECTNESS_r14.json lands AFTER commit and must not
# retroactively change what the committed tuple should have been.
ROUNDS_AT_COMMIT: tuple[int, ...] = tuple(range(1, 14))

# Round-14 inputs to the rule (optimization round 2 of 2 — no new
# queries; the registry is frozen at 226). NEW is therefore empty.
# TOUCHED = queries whose SERVE PATHS changed in the r14 optimization
# diff (every one re-proved against its DuckDB oracle at sf0.01 AND
# sf0.1 before commit — OPTIMIZATION_r14.md):
# - operators/graph.py: supplier-pagerank iteration restructure (no
#   per-iteration eager checkpoint; src-clustered persisted edges);
# - operators/dedup.py: dedup-prefix-filter candidate persist;
# - operators/qualrules.py: the fused rules+logit scan's logit fold
#   moved behind Arrow -> quality-rules-vs-model,
#   filter-agreement-kappa, quality-model-calibration re-earn;
# - operators/quality_model.py + operators/corpus.py: verdict-only
#   consumers switched to the Arrow scorer twin ->
#   corpus-quality-budget, pipeline-training-export,
#   corpus-survivorship re-earn.
NEW: tuple[str, ...] = ()
TOUCHED: tuple[str, ...] = (
    "supplier-pagerank",
    "dedup-prefix-filter",
    "quality-rules-vs-model",
    "filter-agreement-kappa",
    "quality-model-calibration",
    "corpus-quality-budget",
    "pipeline-training-export",
    "corpus-survivorship",
)


def ledger(rounds: Iterable[int] | None = None) -> dict[str, int]:
    """query name -> last round with a hash_match=true driver row.

    ``rounds`` restricts the ledger to those artifact rounds (the
    round-proof mode the pin test uses); None reads every
    CORRECTNESS_r*.json on disk (the exploratory CLI mode).
    """
    if rounds is None:
        import glob

        files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    else:
        files = [
            os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json") for r in rounds
        ]
    last: dict[str, int] = {}
    for f in files:
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        try:
            rows = json.load(open(f))
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def generate(
    registry_names: list[str], rounds: Iterable[int] | None = None
) -> tuple[str, ...]:
    """The prefix the rule produces over the given artifact rounds.

    Pass ``rounds`` explicitly when pinning (the committed tuple is
    ``generate(names, rounds=ROUNDS_AT_COMMIT)``); None falls back to
    whatever artifacts are on disk, which is NOT stable across the
    round boundary — a driver artifact landing after commit changes
    the LRU fill order.
    """
    last = ledger(rounds)
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


def latest_sweeps() -> list[str]:
    """One summary line per committed per-round sweep artifact of the
    NEWEST round present (docs/bench/r{NN}_sweep_*.json — the
    whole-registry SOFT evidence next to the driver's 50-query hard
    rows; r13, r12 verdict item 5)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    files = glob.glob(os.path.join(here, "r*_sweep_*.json"))
    rounds: dict[int, list[str]] = {}
    for f in files:
        m = re.match(r"r(\d+)_sweep_", os.path.basename(f))
        if m:
            rounds.setdefault(int(m.group(1)), []).append(f)
    if not rounds:
        return ["(no committed sweep artifacts)"]
    lines = []
    for f in sorted(rounds[max(rounds)]):
        try:
            s = json.load(open(f))
        except (OSError, ValueError):
            lines.append(f"{os.path.basename(f)}: unreadable")
            continue
        lines.append(
            f"{os.path.basename(f)}: {s.get('matched')}/{s.get('oracled')} "
            f"matched at {s.get('sf_dir')} (tz {s.get('tz')})"
        )
    return lines


def main() -> None:
    from projet_etl_spark.plans import registry

    names = list(registry.REGISTRY)
    last = ledger(ROUNDS_AT_COMMIT)
    from collections import Counter

    print("ledger histogram (last hard row -> #queries):")
    print("  ", dict(sorted(Counter(last.get(n, 0) for n in names).items())))
    print("latest committed whole-registry sweep (soft evidence):")
    for line in latest_sweeps():
        print("  ", line)
    prefix = generate(names, rounds=ROUNDS_AT_COMMIT)
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
