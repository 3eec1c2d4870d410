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
# is committed. The r13 prefix is generated over the r01..r12 ledger;
# the driver's CORRECTNESS_r13.json lands AFTER commit and must not
# retroactively change what the committed tuple should have been.
ROUNDS_AT_COMMIT: tuple[int, ...] = tuple(range(1, 13))

# Round-13 inputs to the rule. NEW = added this round (no hard row
# anywhere): the wide-geometry deployment-threshold pair (the
# rphi_geometry_for staircase RUN at the width it prescribes for the
# 10x corpus, plus its recall audit — r12 verdict item 2) and the two
# compacted store twins (frontier partial-merge fold, embdedup
# verbatim fold — item 3). TOUCHED = serve paths whose implementing
# modules changed in the r13 diff:
# - operators/dedup.py: _rphi_band_keys generalized to a
#   geometry-parameterized kernel and the hi query bodies refactored
#   behind it -> the whole hi family re-earns (dedup-embedding-
#   lsh-hi, embedding-lsh-recall-hi, semantic-exemplars-hi builds on
#   the hi pairs);
# - streaming/embdedup.py (history probe now storeio-disciplined,
#   r12 verdict item 4; + compaction) and streaming/frontier.py
#   (+compaction) and streaming/storequery.py (builders refactored,
#   version token folds PLANT_OFFSET — advisor low) ->
#   embedding-pairs-store and url-frontier-store re-earn;
# - sources/ingest.py's writer lease reworked again (hostname:pid
#   identity + write_tmp heartbeat, the two r12 advisor mediums; TTL
#   env knob, verdict item 6) -> attribution-store and dsir-store as
#   this round's store-reader representatives (r9 rotated
#   ann-ivf-store/daily-counts-store, r10 token-freq-cms/bm25-store,
#   r11 sessions-store/user-state-asof, r12 neardedup-pairs-store/
#   bottomk-store through the same mechanism).
NEW: tuple[str, ...] = (
    "dedup-embedding-lsh-hi-wide",
    "embedding-lsh-recall-hi-wide",
    "dedup-embedding-lsh-hi-sharded",
    "embedding-shard-recall",
    "url-frontier-store-compacted",
    "embedding-pairs-store-compacted",
)
TOUCHED: tuple[str, ...] = (
    "dedup-embedding-lsh-hi",
    "embedding-lsh-recall-hi",
    "semantic-exemplars-hi",
    "embedding-pairs-store",
    "url-frontier-store",
    "attribution-store",
    "dsir-store",
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
