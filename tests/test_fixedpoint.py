"""Fixed-point exact-sum helper: bit-parity with DECIMAL sums,
construction invariants, and the on-grid data assumption it rests on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projet_etl_spark.functions.fixedpoint import (
    UnitSum,
    _block_bits,
    fixed_point_agg,
    units,
)

from tests.conftest import SF_SMALL

MONEY_2DP = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    # events-anomalies runs its z-score moments in fixed point
    "events": ["value"],
}


@pytest.mark.parametrize(
    "table,col", [(t, c) for t, cs in MONEY_2DP.items() for c in cs]
)
def test_money_columns_on_2dp_grid(spark, table, col):
    """The units() fast path assumes 2-dp money; pin it per column.

    If a future fixture breaks the grid, this fails loudly and the
    affected query must snap with an explicit decimal cast instead.
    """
    df = spark.read.parquet(f"{SF_SMALL}/{table}.parquet")
    off = df.filter(
        F.abs(F.col(col) * 100 - F.round(F.col(col) * 100)) > 1e-6
    ).count()
    assert off == 0


def test_units_parity_with_decimal_cast(spark):
    """units() == unscaled CAST(x AS DECIMAL(·,d)) on every row,
    including the product columns after their own decimal snap."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    chk = li.select(
        F.sum(
            (
                units("l_extendedprice")
                != (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                    "long"
                )
            ).cast("int")
        ).alias("bad")
    ).collect()[0]
    assert chk.bad == 0


def test_grouped_sum_bit_parity(spark):
    """Two-level integer-unit sums == single DECIMAL sums, bitwise,
    for both the raw column and a derived product."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    e2, d2 = units("l_extendedprice"), units("l_discount")
    got = (
        fixed_point_agg(
            li,
            ["l_returnflag"],
            [
                UnitSum("sum_price", e2 * 100, 4, 10**11),
                UnitSum("sum_disc_price", e2 * (100 - d2), 4, 10**11),
            ],
            counts=[("n", None)],
        )
        .select(
            "l_returnflag",
            F.col("sum_price").cast("double").alias("sum_price"),
            F.col("sum_disc_price").cast("double").alias("sum_disc_price"),
            "n",
        )
        .collect()
    )
    want = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_price"),
            F.sum(
                (
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                ).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_parity_at_every_parallelism(spark):
    """Block assignment must not leak into results: 1, 7, and 32
    partitions give identical bits."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    outs = []
    for n in (1, 7, 32):
        df = li.repartition(n)
        outs.append(
            sorted(
                map(
                    tuple,
                    fixed_point_agg(
                        df,
                        ["l_returnflag"],
                        [UnitSum("s", units("l_extendedprice") * 100, 4, 10**11)],
                    )
                    .select("l_returnflag", F.col("s").cast("double"))
                    .collect(),
                )
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_nulls_skipped_like_decimal_sum(spark):
    df = spark.createDataFrame(
        [("a", 1.25), ("a", None), ("b", None)], "k string, v double"
    )
    got = fixed_point_agg(
        df,
        ["k"],
        [UnitSum("s", units("v") * 100, 4, 10**6)],
        counts=[("n", None), ("n_v", F.col("v").isNotNull())],
    ).collect()
    by_k = {r.k: r for r in got}
    assert float(by_k["a"].s) == 1.25 and by_k["a"].n == 2 and by_k["a"].n_v == 1
    assert by_k["b"].s is None and by_k["b"].n == 1 and by_k["b"].n_v == 0


def test_negative_values_exact(spark):
    df = spark.createDataFrame(
        [("a", -1.07), ("a", -2.93), ("a", 0.50)], "k string, v double"
    )
    got = fixed_point_agg(
        df, ["k"], [UnitSum("s", units("v") * 100, 4, 10**6)]
    ).collect()
    assert float(got[0].s) == -3.50


def test_empty_input_global_and_grouped(spark):
    df = spark.createDataFrame([], "k string, v double")
    grouped = fixed_point_agg(
        df, ["k"], [UnitSum("s", units("v"), 2, 10**6)]
    ).collect()
    assert grouped == []
    glob = fixed_point_agg(
        df, [], [UnitSum("s", units("v"), 2, 10**6)], counts=[("n", None)]
    ).collect()
    assert len(glob) == 1 and glob[0].s is None and glob[0].n == 0


def test_rollup_final_matches_decimal_rollup(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    got = (
        fixed_point_agg(
            li,
            ["l_returnflag", "l_linestatus"],
            [UnitSum("s", units("l_quantity") * 100, 4, 10**8)],
            final="rollup",
        )
        .select("l_returnflag", "l_linestatus", F.col("s").cast("double"))
        .collect()
    )
    want = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
        )
        .collect()
    )
    assert sorted(map(tuple, got), key=str) == sorted(map(tuple, want), key=str)


def test_min_max_passthrough(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    got = fixed_point_agg(
        li,
        [],
        [UnitSum("s", units("l_quantity"), 2, 10**6)],
        mins=[("lo", F.col("l_quantity"))],
        maxs=[("hi", F.col("l_quantity"))],
    ).collect()[0]
    want = li.agg(
        F.min("l_quantity").alias("lo"), F.max("l_quantity").alias("hi")
    ).collect()[0]
    assert (got.lo, got.hi) == (want.lo, want.hi)


def test_block_bits_bounds():
    # small units -> capped at the id layout's 33 sequence bits
    assert _block_bits([UnitSum("a", F.lit(1), 0, 100)]) == 33
    # price^2 moments at scale 4: 1e14 units -> ~12-row-bit blocks
    b = _block_bits([UnitSum("a", F.lit(1), 4, 10**14)])
    assert 0 < b < 20 and (1 << b) * 10**14 <= 1 << 60
    with pytest.raises(ValueError):
        _block_bits([UnitSum("a", F.lit(1), 0, 1 << 62)])
    with pytest.raises(ValueError):
        _block_bits([UnitSum("a", F.lit(1), 0, 0)])


# --- property tests --------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# values stay within ±1e5 so pairwise PRODUCTS stay under the
# ~4.5e11 snap-parity ceiling (functions/fixedpoint.py docstring):
# above it the DOUBLE product's own rounding error exceeds the
# half-grid radius and integer-exact vs decimal-snap legitimately
# diverge — outside the engine's domain, so outside the test's
_money = st.integers(min_value=-(10**7), max_value=10**7).map(
    lambda c: c / 100.0
)
_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.one_of(st.none(), _money),
        _money,
    ),
    min_size=0,
    max_size=60,
)


@given(rows=_rows, parts=st.sampled_from([1, 3, 8]))
@settings(
    max_examples=25, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_fixed_point_equals_decimal_sum_on_random_data(spark, rows, parts):
    """For arbitrary 2-dp data (negatives, nulls, any partitioning):
    the fixed-point path is bitwise-equal to the DECIMAL-sum path,
    for both a raw column sum and a product-of-columns sum."""
    df = spark.createDataFrame(
        rows, "k string, v double, w double"
    ).repartition(parts)
    got = sorted(
        map(
            tuple,
            fixed_point_agg(
                df,
                ["k"],
                [
                    UnitSum("sv", units("v") * 100, 4, 10**11),
                    UnitSum("svw", units("v") * units("w"), 4, 10**17),
                ],
                counts=[("n", None)],
            )
            .select(
                "k",
                F.col("sv").cast("double"),
                F.col("svw").cast("double"),
                "n",
            )
            .collect(),
        ),
        key=str,
    )
    want = sorted(
        map(
            tuple,
            df.groupBy("k")
            .agg(
                F.sum(F.col("v").cast("decimal(18,4)")).cast("double"),
                F.sum((F.col("v") * F.col("w")).cast("decimal(18,4)")).cast(
                    "double"
                ),
                F.count(F.lit(1)),
            )
            .collect(),
        ),
        key=str,
    )
    assert got == want


def test_star_unit_bounds_hold(spark):
    """The domain bounds star.py feeds fixed_point_agg must dominate
    the data: lineitem prices under E2_MAX cents, order totals and
    balances under TP2_MAX cents."""
    from projet_etl_spark.operators.star import E2_MAX, TP2_MAX

    checks = [
        ("lineitem", "l_extendedprice", E2_MAX),
        ("orders", "o_totalprice", TP2_MAX),
        ("customer", "c_acctbal", TP2_MAX),
        ("supplier", "s_acctbal", TP2_MAX),
        # events-anomalies' usxx bound (10**10 scale-4 units) needs
        # value <= $1000 -> 1e5 hundredths
        ("events", "value", 10**5),
    ]
    for table, col, bound in checks:
        mx = (
            spark.read.parquet(f"{SF_SMALL}/{table}.parquet")
            .agg(F.max(F.abs(F.col(col))))
            .collect()[0][0]
        )
        assert mx * 100 < bound, (table, col, mx)
