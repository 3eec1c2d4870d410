"""Round-10 verdict/advice items.

1. The driver-rotation pin is ROUND-PROOF: the committed
   ``_DRIVER_PREFIX`` equals ``rotation.generate(names,
   rounds=ROUNDS_AT_COMMIT)`` — a pure function of the artifact
   rounds that existed at commit time, so the driver dropping
   CORRECTNESS_r10.json after commit can never invalidate it (the r9
   pin globbed the ledger from disk and went red at judging time for
   exactly that reason).
4. A broken extension surface fails LOUDLY instead of silently
   serving the 13-query parity registry, and the registry size is
   pinned so any accidental shrink (or unregistered growth) trips a
   test.
"""

from __future__ import annotations

import os
import sys
import time

import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "bench",
    ),
)

# updated per round when queries are added (verdict item 4: a broken
# transitive import in the extension surface used to shrink the
# registry to 13 parity queries behind `except ImportError: pass`)
EXPECTED_REGISTRY_SIZE = 203


def test_registry_size_is_pinned():
    from projet_etl_spark.plans.registry import REGISTRY

    assert len(REGISTRY) == EXPECTED_REGISTRY_SIZE


def test_broken_extensions_import_is_loud(monkeypatch):
    """A deliberately-broken extensions import must raise out of
    _build_registry, not serve a silently-shrunk registry."""
    import builtins

    from projet_etl_spark.plans import registry

    real_import = builtins.__import__

    def broken(name, *args, **kwargs):
        if name == "projet_etl_spark.plans.extensions" or (
            name == "projet_etl_spark.plans"
            and args
            and args[2]
            and "extensions" in args[2]
        ):
            raise ImportError("injected: transitive extension breakage")
        return real_import(name, *args, **kwargs)

    monkeypatch.delitem(
        sys.modules, "projet_etl_spark.plans.extensions", raising=False
    )
    monkeypatch.setattr(builtins, "__import__", broken)
    with pytest.raises(ImportError, match="registry"):
        registry._build_registry()


# --- verdict item 1: round-proof rotation pin ---------------------------


def test_driver_prefix_is_generated_by_rotation_rule():
    """The committed tuple == the generator over the EXPLICIT
    committed-artifact rounds (r01..r09), and the staleness bound
    holds: the five r4-stale overflows the r9 pin promised enter at
    the first LRU slots, and nothing left unchecked has a hard row
    older than r6."""
    import rotation

    from projet_etl_spark.plans import registry

    names = list(registry.REGISTRY)
    assert rotation.ROUNDS_AT_COMMIT == tuple(range(1, 10))
    assert registry._DRIVER_PREFIX == rotation.generate(
        names, rounds=rotation.ROUNDS_AT_COMMIT
    )
    last = rotation.ledger(rotation.ROUNDS_AT_COMMIT)
    checked = set(registry._DRIVER_PREFIX)
    # the r9 overflow promise: these five are checked THIS round
    for n in (
        "text-repetition",
        "text-rolling-hash",
        "text-scrub-pii",
        "text-token-count",
        "top-magasins-rollup",
    ):
        assert n in checked, f"r9 overflow query {n} missed the r10 prefix"
    oldest_left = min(last.get(n, 0) for n in names if n not in checked)
    assert oldest_left >= 6


# --- verdict item 6: read-path swap recovery is concurrency-safe --------
#
# r9's read path ran the MUTATING recover_swap on every read, which is
# only safe under a single-writer assumption readers shouldn't need.
# live_read_path mutates nothing while a publish is provably in
# flight (fresh ._swaplock): it serves the parked bytes instead.


def _make_store(spark, tmp_path, name):
    store = str(tmp_path / name)
    spark.createDataFrame(
        [(1, 10), (2, 20)], "vec_id long, cell long"
    ).write.parquet(store)
    return store


def _read_rows(spark, store):
    from projet_etl_spark.streaming.storeio import read_store

    df = read_store(spark, store, "vec_id long, cell long", ["vec_id", "cell"])
    return {(r["vec_id"], r["cell"]) for r in df.collect()}


def test_reader_serves_parked_bytes_under_inflight_swap(spark, tmp_path):
    """Mid-swap state with a FRESH lock (the publisher is between its
    two renames): the reader must return the full parked store and
    must not touch the publisher's artifacts."""
    store = _make_store(spark, tmp_path, "swap_inflight")
    os.rename(store, store + "._precompact")
    with open(store + "._swaplock", "w", encoding="utf-8") as fh:
        fh.write("4242")

    assert _read_rows(spark, store) == {(1, 10), (2, 20)}
    # no mutation: the swap is still exactly as the publisher left it
    assert os.path.exists(store + "._precompact")
    assert os.path.exists(store + "._swaplock")
    assert not os.path.exists(store)


def test_reader_recovers_stale_swap(spark, tmp_path):
    """Mid-swap state whose lock is STALE (crashed publisher): the r8
    guarantee holds — the reader restores the parked store instead of
    reading it as legitimately empty, and clears the dead lock."""
    from projet_etl_spark.sources.ingest import SWAP_LOCK_STALE_SEC

    store = _make_store(spark, tmp_path, "swap_stale")
    os.rename(store, store + "._precompact")
    lock = store + "._swaplock"
    with open(lock, "w", encoding="utf-8") as fh:
        fh.write("4242")
    old = time.time() - (SWAP_LOCK_STALE_SEC + 60)
    os.utime(lock, (old, old))

    assert _read_rows(spark, store) == {(1, 10), (2, 20)}
    assert os.path.exists(store)
    assert not os.path.exists(store + "._precompact")
    assert not os.path.exists(lock)


def test_reader_recovers_lockless_parked_store(spark, tmp_path):
    """A parked aside with NO lock (pre-lock-era or long-dead swap)
    still recovers — the original r8 crash-window case."""
    store = _make_store(spark, tmp_path, "swap_lockless")
    os.rename(store, store + "._precompact")
    assert _read_rows(spark, store) == {(1, 10), (2, 20)}
    assert os.path.exists(store)


def test_reader_never_touches_inflight_tmp(spark, tmp_path):
    """A ._compacting directory is writer-owned: the read path must
    not delete it (r9 recover_swap did)."""
    store = _make_store(spark, tmp_path, "swap_tmp")
    tmp = store + "._compacting"
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-0"), "w", encoding="utf-8") as fh:
        fh.write("writer in progress")

    assert _read_rows(spark, store) == {(1, 10), (2, 20)}
    assert os.path.exists(os.path.join(tmp, "part-0"))


def test_reader_prefers_live_dir_and_leaves_aside(spark, tmp_path):
    """Aside AND live dir present (finished swap whose cleanup died):
    the reader serves the live dir and leaves cleanup to the next
    writer instead of deleting the aside itself."""
    import shutil

    store = _make_store(spark, tmp_path, "swap_done")
    shutil.copytree(store, store + "._precompact")
    assert _read_rows(spark, store) == {(1, 10), (2, 20)}
    assert os.path.exists(store + "._precompact")


def test_swap_publish_leaves_no_artifacts(spark, tmp_path):
    """The happy-path publish cleans its lock, aside and tmp."""
    from projet_etl_spark.sources.ingest import swap_publish

    store = _make_store(spark, tmp_path, "swap_clean")

    def write_tmp(tmp):
        spark.createDataFrame([(3, 30)], "vec_id long, cell long").write.parquet(
            tmp
        )

    swap_publish(store, write_tmp)
    assert _read_rows(spark, store) == {(3, 30)}
    for suffix in ("._precompact", "._swaplock", "._compacting"):
        assert not os.path.exists(store + suffix)
