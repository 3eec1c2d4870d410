"""dq-expectations must COUNT violations, not just report zeros.

The production fixture is clean, so the parity test alone would also
pass for a broken sweep that hard-codes zero violations. This test
stages a deliberately corrupted copy of sf0.001 — duplicated primary
keys, null foreign/not-null columns, orphaned child rows,
out-of-range values — and asserts the sweep reports EXACTLY the
seeded counts, with "checked" tracking the inflated table sizes.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from projet_etl_spark.operators.dq import q_dq_expectations, q_orders_upsert_type1
from tests.conftest import SF_SMALL

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def corrupt_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corrupt_tables"))
    for t in TABLES:
        tab = pq.read_table(f"{SF_SMALL}/{t}.parquet")
        if t == "orders":
            # 3 duplicated pks + 2 null custkeys + 1 dangling custkey
            head = tab.slice(0, 3)
            # fresh pks on the null/dangling rows so each constraint's
            # seeded count stays independent of the pk-unique seed
            nulls = tab.slice(3, 2).set_column(
                tab.schema.get_field_index("o_custkey"),
                "o_custkey",
                pa.array([None, None], type=pa.int64()),
            ).set_column(
                tab.schema.get_field_index("o_orderkey"),
                "o_orderkey",
                pa.array([77_000_001, 77_000_002], type=pa.int64()),
            )
            dangling = tab.slice(5, 1).set_column(
                tab.schema.get_field_index("o_custkey"),
                "o_custkey",
                pa.array([99_999_999], type=pa.int64()),
            ).set_column(
                tab.schema.get_field_index("o_orderkey"),
                "o_orderkey",
                pa.array([77_000_003], type=pa.int64()),
            )
            tab = pa.concat_tables([tab, head, nulls, dangling])
        elif t == "lineitem":
            # 2 orphans + 1 qty out of range + 1 negative discount
            orphan = tab.slice(0, 2).set_column(
                tab.schema.get_field_index("l_orderkey"),
                "l_orderkey",
                pa.array([88_888_888, 88_888_889], type=pa.int64()),
            )
            badqty = tab.slice(2, 1).set_column(
                tab.schema.get_field_index("l_quantity"),
                "l_quantity",
                pa.array([0.0], type=pa.float64()),
            )
            baddisc = tab.slice(3, 1).set_column(
                tab.schema.get_field_index("l_discount"),
                "l_discount",
                pa.array([-0.05], type=pa.float64()),
            )
            tab = pa.concat_tables([tab, orphan, badqty, baddisc])
        elif t == "customer":
            # 1 null acctbal
            nullbal = tab.slice(0, 1).set_column(
                tab.schema.get_field_index("c_acctbal"),
                "c_acctbal",
                pa.array([None], type=pa.float64()),
            )
            tab = pa.concat_tables([tab, nullbal])
        pq.write_table(tab, f"{root}/{t}.parquet")
    return root


def test_dq_counts_seeded_violations(spark, corrupt_root):
    rows = {
        r["expectation"]: r.asDict()
        for r in q_dq_expectations(spark, corrupt_root).collect()
    }
    n_orders = 1500 + 6
    n_lineitem = 6000 + 4
    n_customer = 150 + 1
    assert rows["orders.pk-unique"]["violations"] == 3
    assert rows["orders.pk-unique"]["checked"] == n_orders
    assert rows["orders.custkey-not-null"]["violations"] == 2
    # dangling custkey + the 2 nulls (NULL keys never match a dim row)
    assert rows["orders.fk-customer"]["violations"] == 3
    # the seeded duplicate customer double-matches its orders, so the
    # fk check's "checked" exceeds the raw parent count — join
    # semantics, asserted so a silent dedup would fail here
    assert rows["orders.fk-customer"]["checked"] >= n_orders
    assert rows["lineitem.fk-orders"]["violations"] == 2
    # the duplicated-pk orders rows double-match their lineitems, so
    # the fk check's "checked" exceeds the raw child count — join
    # semantics, asserted so a silent dedup would fail here
    assert rows["lineitem.fk-orders"]["checked"] > n_lineitem
    assert rows["lineitem.qty-range"]["violations"] == 1
    assert rows["lineitem.discount-range"]["violations"] == 1
    assert rows["lineitem.qty-range"]["checked"] == n_lineitem
    assert rows["customer.acctbal-not-null"]["violations"] == 1
    assert rows["customer.acctbal-not-null"]["checked"] == n_customer
    for r in rows.values():
        assert r["violation_rate"] == round(r["violations"] / r["checked"], 6)


def test_upsert_preserves_untouched_and_replaces_updated(spark):
    """Post-merge totals decompose exactly: every base status keeps
    its non-updated orders; 'U' carries the updated orders plus fees;
    'N' mirrors the cloned inserts."""
    from pyspark.sql import functions as F

    from projet_etl_spark.sources.tables import load_table

    base = load_table(spark, SF_SMALL, "orders")
    out = {
        r["o_orderstatus"]: r.asDict()
        for r in q_orders_upsert_type1(spark, SF_SMALL).collect()
    }
    upd = base.filter(F.col("o_orderkey") % 10 == 3)
    ins = base.filter(F.col("o_orderkey") % 97 == 0)
    assert out["N"]["n_orders"] == ins.count()
    assert out["U"]["n_orders"] == upd.count()
    exp_u_cents = upd.select(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5) + 1000)
    ).collect()[0][0]
    assert out["U"]["revenue"] == round(exp_u_cents / 100.0, 2)
    for status in set(out) - {"N", "U"}:
        keep = base.filter(
            (F.col("o_orderstatus") == status) & (F.col("o_orderkey") % 10 != 3)
        )
        assert out[status]["n_orders"] == keep.count()
