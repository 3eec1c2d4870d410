"""Round-13 tests: cross-host writer-lease identity, the write_tmp
heartbeat, the TTL env knob (r12 advisor mediums + verdict item 6),
store compaction for the frontier/embdedup stores (verdict item 3),
the storeio-disciplined embdedup history probe (item 4), and the
wide-band RPHI geometry the staircase knob prescribes (item 2).
"""

from __future__ import annotations

import os
import time

import pytest


def _mk_store(spark, tmp_path, name="store"):
    p = str(tmp_path / name)
    spark.range(10).toDF("v").coalesce(1).write.mode("overwrite").parquet(p)
    return p


# ---------------------------------------------------------------
# cross-host lease identity (r12 advisor, medium 1)
# ---------------------------------------------------------------


def test_lock_records_hostname_and_pid(tmp_path):
    from projet_etl_spark.sources import ingest

    p = str(tmp_path / "t")
    with ingest._writer_lock(p) as lk:
        host, pid = ingest._lock_ident(lk.lock)
        assert host == ingest._local_host()
        assert pid == os.getpid()
        # legacy accessor still answers with the pid
        assert ingest._writer_lock_holder(lk.lock) == os.getpid()
    assert not os.path.exists(p + "._writerlock")


def test_legacy_bare_pid_lock_parses_as_same_host(tmp_path):
    from projet_etl_spark.sources import ingest

    lock = str(tmp_path / "t._writerlock")
    with open(lock, "w", encoding="utf-8") as fh:
        fh.write("12345")
    assert ingest._lock_ident(lock) == (ingest._local_host(), 12345)


def test_foreign_host_live_pid_is_not_judged_by_local_pid_table(tmp_path):
    """The advisor's cross-host arm: a lock recorded on ANOTHER host
    must be governed by the TTL lease, not by probing the LOCAL pid
    table. A fresh foreign lock whose pid does not exist locally used
    to be judged dead (ProcessLookupError -> break) — it must now
    CONFLICT while fresh."""
    from projet_etl_spark.sources import ingest

    p = str(tmp_path / "t")
    lock = p + "._writerlock"
    # a pid that almost certainly does not exist in the local table
    with open(lock, "w", encoding="utf-8") as fh:
        fh.write("not-this-host:999999999")
    assert ingest._holder_live(lock)  # fresh mtime -> live via TTL
    with pytest.raises(ingest.StoreWriterConflict):
        with ingest._writer_lock(p):
            pass
    assert os.path.exists(lock)  # the remote writer's lease survived


def test_foreign_host_expired_lease_breaks(tmp_path):
    """TTL half for foreign locks: aged past the TTL, a foreign-host
    lease is expired and the next writer breaks it — even when the
    recorded pid IS live locally (pid tables are per-host; a local
    process with a coinciding pid must not keep a dead remote lease
    alive)."""
    from projet_etl_spark.sources import ingest

    p = str(tmp_path / "t")
    lock = p + "._writerlock"
    with open(lock, "w", encoding="utf-8") as fh:
        fh.write(f"not-this-host:{os.getpid()}")  # OUR live pid, wrong host
    old = os.path.getmtime(lock) - ingest.LEASE_TTL_SEC - 10
    os.utime(lock, (old, old))
    assert not ingest._holder_live(lock)
    with ingest._writer_lock(p) as lk:
        assert lk.owns()
    assert not os.path.exists(lock)


# ---------------------------------------------------------------
# TTL env knob (r12 verdict item 6) + write_tmp heartbeat (medium 2)
# ---------------------------------------------------------------


def test_lease_ttl_env_knob(monkeypatch):
    from projet_etl_spark.sources import ingest

    monkeypatch.delenv("SPARK_GRAFT_LEASE_TTL_SEC", raising=False)
    assert ingest._lease_ttl() == ingest.LEASE_TTL_SEC
    monkeypatch.setenv("SPARK_GRAFT_LEASE_TTL_SEC", "0.5")
    assert ingest._lease_ttl() == 0.5
    monkeypatch.setenv("SPARK_GRAFT_LEASE_TTL_SEC", "bogus")
    assert ingest._lease_ttl() == ingest.LEASE_TTL_SEC
    monkeypatch.setenv("SPARK_GRAFT_LEASE_TTL_SEC", "-3")
    assert ingest._lease_ttl() == ingest.LEASE_TTL_SEC


def test_short_ttl_breaks_wedged_holder_on_schedule(tmp_path, monkeypatch):
    """A wedged unobservable holder is broken after the CONFIGURED
    TTL, not the default: with a 0.2 s lease, a 0.4 s-old lock falls
    to the next writer."""
    from projet_etl_spark.sources import ingest

    monkeypatch.setattr(ingest, "_pid_alive", lambda pid: None)
    monkeypatch.setenv("SPARK_GRAFT_LEASE_TTL_SEC", "0.2")
    p = str(tmp_path / "t")
    lock = p + "._writerlock"
    with open(lock, "w", encoding="utf-8") as fh:
        fh.write("12345")
    assert ingest._holder_live(lock)  # fresh: still live
    time.sleep(0.4)
    assert not ingest._holder_live(lock)  # expired on the knob's clock
    with ingest._writer_lock(p) as lk:
        assert lk.owns()


def test_heartbeat_keeps_long_write_tmp_alive(spark, tmp_path, monkeypatch):
    """The advisor's medium 2: a publish whose write_tmp exceeds the
    TTL must keep its lease fresh throughout (heartbeat), so a
    contender mid-write CONFLICTS instead of breaking the lock and
    double-writing ._compacting."""
    from projet_etl_spark.sources import ingest

    monkeypatch.setattr(ingest, "_pid_alive", lambda pid: None)
    monkeypatch.setenv("SPARK_GRAFT_LEASE_TTL_SEC", "0.4")
    p = _mk_store(spark, tmp_path, "hb")
    lock = p + "._writerlock"
    observed = {}

    def write_tmp(tmp):
        # sleep well past the TTL: without the heartbeat the lease
        # would expire mid-write and a contender would break it
        time.sleep(1.2)
        observed["live_mid_write"] = ingest._holder_live(lock)
        with pytest.raises(ingest.StoreWriterConflict):
            with ingest._writer_lock(p):
                pass
        spark.range(3).toDF("v").coalesce(1).write.parquet(tmp)

    ingest.swap_publish(p, write_tmp)
    assert observed["live_mid_write"] is True
    assert spark.read.parquet(p).count() == 3
    assert not os.path.exists(lock)


def test_heartbeat_stops_touching_after_release(tmp_path, monkeypatch):
    """The heartbeat must never refresh a lock it no longer owns —
    losing the lease stops the toucher."""
    from projet_etl_spark.sources import ingest

    monkeypatch.setenv("SPARK_GRAFT_LEASE_TTL_SEC", "0.2")
    p = str(tmp_path / "t")
    lk = ingest._writer_lock(p)
    lk.__enter__()
    try:
        with lk.heartbeat():
            os.remove(lk.lock)  # lease stolen/removed mid-phase
            with open(lk.lock, "w", encoding="utf-8") as fh:
                fh.write("somewhere-else:4242")
            before = os.stat(lk.lock).st_mtime
            time.sleep(0.5)  # several heartbeat periods
            assert os.stat(lk.lock).st_mtime == before  # untouched
    finally:
        os.remove(lk.lock)
        lk._ident = None


# ---------------------------------------------------------------
# embdedup history probe through storeio (r12 verdict item 4)
# ---------------------------------------------------------------


def test_embdedup_absent_history_is_first_batch_path(spark, tmp_path):
    """A genuinely-absent bands store is the legitimate first-batch
    case: batch x batch pairs still emit, nothing raises."""
    from pyspark.sql import functions as F

    from projet_etl_spark.operators.dedup import planted_embeddings
    from projet_etl_spark.streaming.embdedup import (
        emb_dedup_batch,
        read_emb_pairs,
    )
    from tests.conftest import SF_SMALL

    store = str(tmp_path / "store")
    pairs = str(tmp_path / "pairs")
    corpus = planted_embeddings(spark, SF_SMALL)
    # one batch holding BOTH sides of a few true pairs: originals
    # 0,3,...,39 and their twins PLANT_OFFSET+0,+3,...,+39
    base = F.col("vec_id") % 10_000_000
    b0 = corpus.filter((base < 40) & (base % 3 == 0))
    emb_dedup_batch(b0, 0, store, pairs)
    got = read_emb_pairs(spark, pairs).collect()
    assert got  # batch x batch pairs found with no history store


def test_embdedup_drifted_history_raises_not_skips(spark, tmp_path):
    """The storeio discipline on the WRITER-side history probe: a
    bands store that exists but is schema-drifted (the stand-in for
    unreadable/corrupt) must RAISE — the old bare os.path.exists
    probe silently skipped history pairing, permanently missing
    cross-batch true pairs."""
    import os as _os

    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    from projet_etl_spark.operators.dedup import planted_embeddings
    from projet_etl_spark.streaming.embdedup import emb_dedup_batch
    from tests.conftest import SF_SMALL

    store = str(tmp_path / "store")
    pairs = str(tmp_path / "pairs")
    _os.makedirs(store, exist_ok=True)
    spark.createDataFrame([(1,)], "wrong long").write.parquet(
        _os.path.join(store, "bands")
    )
    b0 = planted_embeddings(spark, SF_SMALL).filter(
        (F.col("vec_id") % 3 == 0) & (F.col("vec_id") % 10_000_000 < 40)
    )
    with pytest.raises(AnalysisException):
        emb_dedup_batch(b0, 1, store, pairs)
