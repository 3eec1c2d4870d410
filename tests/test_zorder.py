"""Z-order layout: content invariance + measured file-skipping wins.

The pruning assertion uses real parquet footer statistics (what a
scan's file-level skipping actually consults), not the engine's own
bookkeeping: a file can be skipped for a predicate iff the
predicate's range misses the file's [min, max].
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from projet_etl_spark.sources.zorder import zorder_by, zorder_write
from tests.conftest import SF_SMALL

# 16 files = 4 Morton prefix bits -> BOTH dimensions split 4-ways,
# so a 1/8-width probe on either column expects ~4-6 files after
# range-boundary spill; 8 files would give the leading dimension a
# single split level and leave the half-files assertion at the mercy
# of repartitionByRange's sampling jitter
N_FILES = 16


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    """Per-file (min, max) of ``col`` from parquet row-group stats."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        if md.num_row_groups == 0:
            continue
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def _files_read(ranges, lo, hi) -> int:
    return sum(1 for a, b in ranges if not (b < lo or a > hi))


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("zorder"))
    df = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
    )
    linear = os.path.join(base, "linear")
    zord = os.path.join(base, "zorder")
    # linear baseline: perfectly clustered on partkey only
    (
        df.repartitionByRange(N_FILES, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zorder_write(df, zord, ["l_partkey", "l_suppkey"], n_files=N_FILES)
    return df, linear, zord


def test_layout_preserves_content(spark, layouts):
    df, _, zord = layouts
    back = spark.read.parquet(zord)
    assert back.count() == df.count()
    cols = ["l_partkey", "l_suppkey", "l_extendedprice"]
    a = sorted(map(tuple, df.select(*cols).collect()))
    b = sorted(map(tuple, back.select(*cols).collect()))
    assert a == b


def test_zorder_prunes_on_non_leading_dimension(spark, layouts):
    """A suppkey range predicate (~12% of the domain) skips no files
    under the partkey-linear layout but most files under z-order."""
    df, linear, zord = layouts
    lo_s, hi_s = [
        (r[0], r[1])
        for r in df.agg(F.min("l_suppkey"), F.max("l_suppkey")).collect()
    ][0]
    width = (hi_s - lo_s) // 8 or 1
    probe_lo, probe_hi = lo_s, lo_s + width
    lin = _files_read(_file_ranges(linear, "l_suppkey"), probe_lo, probe_hi)
    zrd = _files_read(_file_ranges(zord, "l_suppkey"), probe_lo, probe_hi)
    assert lin == N_FILES  # linear layout cannot skip on suppkey
    assert zrd <= N_FILES // 2  # z-order reads at most half


def test_zorder_keeps_pruning_on_leading_dimension(spark, layouts):
    """Z-order deliberately trades partkey locality for suppkey
    locality; a partkey range (~12%) must still skip at least a
    quarter of the files. (Expected ~4-6 of 16; the bound carries
    slack because repartitionByRange places boundaries by sampling,
    which jitters a boundary file either way run to run.)"""
    df, linear, zord = layouts
    lo_p, hi_p = [
        (r[0], r[1])
        for r in df.agg(F.min("l_partkey"), F.max("l_partkey")).collect()
    ][0]
    width = (hi_p - lo_p) // 8 or 1
    probe_lo, probe_hi = lo_p, lo_p + width
    lin = _files_read(_file_ranges(linear, "l_partkey"), probe_lo, probe_hi)
    zrd = _files_read(_file_ranges(zord, "l_partkey"), probe_lo, probe_hi)
    # the dedicated layout is near-perfect: a 1/8-width probe lands
    # in ~2 of 16 range files, +1 per boundary for sampling jitter
    assert lin <= 3
    assert zrd <= N_FILES * 3 // 4


def test_constant_column_degrades_gracefully(spark):
    df = spark.range(100).select(
        F.col("id").alias("x"), F.lit(7).alias("c")
    )
    keyed = zorder_by(df, ["x", "c"], bits=8)
    rows = keyed.orderBy("x").collect()
    # constant column quantizes to 0: key is monotone in x alone
    keys = [r["__zkey"] for r in rows]
    assert keys == sorted(keys)
