"""SURVEY.md §2.10.6 edge cases on a crafted micro star schema:
stores missing from stage-2 (left-join default 0), months with no
data inside the spine (gap fill + exclusion from the overall avg),
and score ties at the top-k boundary — each checked Spark-vs-DuckDB
on the same parquet files, plus direct value assertions.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from projet_etl_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMALL, TABLES, assert_matches_oracle

CAT = "Brand#4"
FAB = 42


def _write_micro_star(spark, root):
    """3 stores x 2 months of data inside a 6-month window.

    - store 1: products from fab 42 and fab 7
    - store 2: products only from fab 7  -> nb_produits_fab = 0 (J2)
    - store 3: identical rows to store 2 -> exact score tie (O4)
    - all activity in 1996-01 and 1996-03; 1996-02 and 1996-04..06
      are empty months inside the epoch..as_of spine (M3 gap fill)
    """
    d1 = datetime.datetime(1996, 1, 10)
    d3 = datetime.datetime(1996, 3, 10)
    # lineitem: (orderkey, partkey, suppkey, linenumber, qty, price,
    #            disc, tax, rflag, lstatus, shipdate)
    li = []
    orders = []

    def add(orderkey, store, partkey, supp, when):
        orders.append((orderkey, store, "O", 100.0, when, "1-URGENT"))
        li.append(
            (orderkey, partkey, supp, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", when)
        )

    add(1, 1, 101, FAB, d1)
    add(2, 1, 102, 7, d1)
    add(3, 1, 103, FAB, d3)
    add(4, 2, 104, 7, d1)
    add(5, 2, 105, 7, d3)
    add(6, 3, 104, 7, d1)  # mirrors store 2 -> tie on every count
    add(7, 3, 105, 7, d3)
    part = [(p, f"part{p}", CAT, "t", 1, 1.0) for p in (101, 102, 103, 104, 105)]

    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/lineitem.parquet")
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/orders.parquet")
    spark.createDataFrame(
        part,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/part.parquet")


@pytest.fixture(scope="module")
def micro(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("micro_star"))
    _write_micro_star(spark, root)
    con = duckdb.connect()
    for t in ("lineitem", "orders", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{root}/{t}.parquet/*.parquet')"
        )
    for t in TABLES:
        if t not in ("lineitem", "orders", "part"):
            con.execute(f"CREATE VIEW {t} AS SELECT 1 AS dummy")
    yield root, con
    con.close()


@pytest.mark.parametrize(
    "name",
    [
        "top-magasins-cat",
        "avg-cat-fab-10-mag",
        "avg-cat-fab-10-mag-avg",
        "score-sante-touts-les-mois",
        "score-sante-touts-les-mois-avg",
        "score-evolution",
    ],
)
def test_micro_star_matches_oracle(spark, micro, name):
    root, con = micro
    spec = REGISTRY[name]
    assert_matches_oracle(spec.fn(spark, root), con, spec.oracle, f"micro:{name}")


def test_m2_left_join_default_zero(spark, micro):
    root, _ = micro
    rows = {r.magid: r for r in REGISTRY["avg-cat-fab-10-mag"].fn(spark, root).collect()}
    assert rows[1].nb_produits_fab == 2  # parts 101, 103 from fab 42
    assert rows[2].nb_produits_fab == 0  # store without the fab: default 0
    assert rows[3].nb_produits_fab == 0
    assert rows[2].percentage == 0.0
    # average still counts the zero stores (denominator nonzero):
    # (2/3*100 + 0 + 0) / 3
    avg = REGISTRY["avg-cat-fab-10-mag-avg"].fn(spark, root).collect()[0].average
    assert abs(avg - (2 / 3 * 100) / 3) < 1e-6


def test_m3_gap_months_emit_zero_but_dont_count(spark, micro):
    root, _ = micro
    # pin the window to 1996-01..1996-06 via the month spine defaults:
    # use the operator directly with explicit epoch/as_of
    from projet_etl_spark.operators.composite import (
        q_score_sante_mois,
        q_score_sante_mois_avg,
    )

    months = {
        r.mois_annee: r.avg_percentage
        for r in q_score_sante_mois(
            spark, root, epoch="1996-01-01", as_of="1996-06-30"
        ).collect()
    }
    assert len(months) == 6
    assert months["1996-02"] == 0.0  # gap month emitted as 0.0
    assert months["1996-04"] == 0.0
    assert months["1996-01"] > 0 and months["1996-03"] > 0
    # overall avg over ONLY the 2 non-empty months
    avg = (
        q_score_sante_mois_avg(spark, root, epoch="1996-01-01", as_of="1996-06-30")
        .collect()[0]
        .average
    )
    assert abs(avg - (months["1996-01"] + months["1996-03"]) / 2) < 1e-6


def test_topk_tie_broken_by_magid(spark, micro):
    root, _ = micro
    rows = REGISTRY["top-magasins-cat"].fn(spark, root).collect()
    tied = [r for r in rows if r.magid in (2, 3)]
    assert tied[0].score == tied[1].score  # genuine tie
    order = [r.magid for r in rows if r.magid in (2, 3)]
    assert order == [2, 3]  # deterministic asc tiebreak


def test_funnel_order_constraint(spark):
    """Funnel counts only in-order progressions: a click BEFORE the
    first signup doesn't advance the user; a purchase before the
    qualifying click doesn't either."""
    from projet_etl_spark.operators.funnel import (
        q_funnel_signup_click_purchase,
    )

    t = datetime.datetime
    rows = [
        # u1: full in-order funnel
        (1, "signup", t(2024, 1, 1)), (1, "click", t(2024, 1, 2)),
        (1, "purchase", t(2024, 1, 3)),
        # u2: click precedes signup -> stalls at signup
        (2, "click", t(2024, 1, 1)), (2, "signup", t(2024, 1, 2)),
        # u3: purchase before its click -> stalls at click
        (3, "signup", t(2024, 1, 1)), (3, "purchase", t(2024, 1, 2)),
        (3, "click", t(2024, 1, 3)),
        # u4: never signs up -> not counted anywhere
        (4, "click", t(2024, 1, 1)), (4, "purchase", t(2024, 1, 2)),
    ]
    df = spark.createDataFrame(
        [(u, e, ts, 1.0) for u, e, ts in rows],
        "user_id long, event_type string, ts timestamp, value double",
    )
    import projet_etl_spark.operators.funnel as fu
    import projet_etl_spark.sources.tables as tb

    orig = tb.events
    try:
        fu.events = lambda _s, _d: df
        out = {r.stage: r.n_users for r in
               q_funnel_signup_click_purchase(spark, "unused").collect()}
    finally:
        fu.events = orig
    assert out == {"1_signup": 3, "2_click_after": 2, "3_purchase_after": 1}


def test_moving_avg_frame(spark):
    """7-day frame averages exactly the rows present in the frame
    (ROWS, not RANGE: gaps in the calendar are not zero-filled)."""
    from projet_etl_spark.operators import stats as st

    t = datetime.datetime
    df = spark.createDataFrame(
        [("click", t(2024, 1, d, 12), 1.0) for d in (1, 2, 10)]
        + [("click", t(2024, 1, 10, 13), 1.0)],
        "event_type string, ts timestamp, value double",
    )
    orig = st.events
    try:
        st.events = lambda _s, _d: df.selectExpr(
            "event_type", "ts", "value"
        )
        rows = st.q_daily_moving_avg(spark, "unused").collect()
    finally:
        st.events = orig
    by_day = {r.day: r for r in rows}
    assert by_day["2024-01-10"].n == 2
    # frame holds the three distinct days present, not ten calendar days
    assert by_day["2024-01-10"].avg_7d == pytest.approx((1 + 1 + 2) / 3)
    assert by_day["2024-01-10"].cume_n == 4


def test_anomalies_degenerate_stratum_no_nan(spark, tmp_path):
    """A constant stratum whose naive variance lands BELOW zero in
    doubles (catastrophic cancellation: 0.01 x 3 gives -1.4e-20) must
    produce no anomaly rows — without the greatest(var,0) clamp +
    var>0 pre-filter, Spark emits NaN z rows (NaN compares greater
    than 3) while DuckDB's sqrt(negative) errors out (ADVICE r3)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from projet_etl_spark.operators.stats import q_events_anomalies
    from projet_etl_spark.plans.extensions import _ANOMALY_SQL

    rows = [("flat", 0.01)] * 3 + [("mix", 1.0)] * 30 + [("mix", 100.0)]
    n = len(rows)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [1_700_000_000_000_000_000 + i for i in range(n)],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array([t for t, _ in rows]),
            "value": pa.array([v for _, v in rows], pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    df = q_events_anomalies(spark, str(tmp_path))
    got = df.collect()
    assert got, "the genuine mix-stratum outlier must still be flagged"
    assert all(r.event_type == "mix" for r in got), got
    assert not any(math.isnan(r.z) for r in got), got

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    try:
        assert_matches_oracle(df, con, _ANOMALY_SQL, name="anomalies-degenerate")
    finally:
        con.close()


def test_round5_text_ops_match_oracle_on_edge_corpus(spark, tmp_path):
    """The fixture corpus never exercises degenerate documents; pin
    cross-engine parity of the round-5 text operators on a corpus of
    empties, whitespace-only, single tokens, CJK, punctuation runs
    and heavy repetition (tokenization edge semantics: Spark split or
    DuckDB regexp_split_to_array of an empty string both yield [''],
    and every md5 below hashes the same bytes)."""
    import duckdb

    from projet_etl_spark.plans.registry import REGISTRY

    docs = [
        (0, "", "en"),
        (1, "   ", "en"),
        (2, "one", "en"),
        (3, "早安 世界 早安 世界 早安", "zh"),
        (4, "!!! ??? ... !!!", "fr"),
        (5, "the the the the the the the the", "en"),
        (6, "a b c d e f g h i j a b c d e f g h i j", "de"),
        (7, "a b c d e f g h i j k l m n o p", "es"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the file glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    try:
        for name in (
            "text-quality-model-jvm",
            "text-quality-model",
            "corpus-quality-budget",
            "dedup-longest-span",
            "token-freq-cms",
            "sample-stratified-n",
        ):
            spec = REGISTRY[name]
            assert_matches_oracle(
                spec.fn(spark, str(tmp_path)), con, spec.oracle, f"{name}-edge"
            )
    finally:
        con.close()


def test_event_transitions_tiebreak_on_simultaneous_events(spark, tmp_path):
    """The fixture rarely has same-microsecond events per user; pin
    the (ts, event_id) successor tie-break on a crafted corpus where
    one user fires three simultaneous events (order must come from
    event_id in BOTH engines) and another has no successor at all."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from projet_etl_spark.operators.funnel import q_event_transitions
    from projet_etl_spark.plans.extensions import _TRANSITIONS_SQL

    t0 = 1_700_000_000_000_000  # us
    rows = [
        # user 1: three events at the SAME instant + one later
        (10, t0, 1, "signup"),
        (11, t0, 1, "click"),
        (12, t0, 1, "view"),
        (13, t0 + 5_000_000, 1, "purchase"),
        # user 2: a single event — contributes no transition
        (20, t0, 2, "error"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    df = q_event_transitions(spark, str(tmp_path))
    got = {(r.from_type, r.to_type): r.n for r in df.collect()}
    # event_id order: signup(10) -> click(11) -> view(12) -> purchase(13)
    assert got == {
        ("signup", "click"): 1,
        ("click", "view"): 1,
        ("view", "purchase"): 1,
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    try:
        assert_matches_oracle(df, con, _TRANSITIONS_SQL, "transitions-edge")
    finally:
        con.close()


# --- empty-input robustness -----------------------------------------

# fails LOUDLY on empty input by design: Lloyd seeding needs K rows —
# an empty index is a configuration error, not a late partition
_EMPTY_EXCLUDED = {"kmeans-clusters"}

# queries whose empty-input result is legitimately NON-empty: grand
# aggregates (one zero/NULL row), the dense month spine (a row per
# month at 0.0), funnel stage scaffolding, and audits that emit their
# one summary row
_EMPTY_NONEMPTY_OK = {
    "mag-cat",
    "fab-cat",
    "avg-prod-per-fab",
    "avg-cat-fab-10-mag-avg",
    "score-sante-touts-les-mois",
    "score-sante-touts-les-mois-avg",
    "funnel-signup-click-purchase",
    "dedup-lsh-recall",
    "embedding-lsh-recall",
    # grand aggregate over the (empty) planted corpus: (0, 0, NULL)
    "embedding-lsh-recall-hi",
    # same aggregate shape, wide-geometry banded path (r13)
    "embedding-lsh-recall-hi-wide",
    # and the sharded path's audit (r13)
    "embedding-shard-recall",
    "lineitem-corr-matrix",
    "forecast-revenue-change",
    "promo-revenue-share",
    "disjunctive-parts-revenue",
    "token-zipf-fit",
    "parts-pareto",
    # global aggregate: one (null, 0) row on empty input by SQL rule
    "small-order-revenue",
    # column census: one row per column, zero counts, NULL extremes
    "events-profile",
    # constraint sweep: one row per expectation, zero counts, NULL rate
    "dq-expectations",
    # grand-aggregate summary: one (0, NULL, NULL) row on empty input,
    # same as the DuckDB oracle's aggregate-without-GROUP-BY rule
    "orders-theilsen-trend",
    # rule battery: one row per rule with zero failures on empty input
    "docs-quality-rules",
    # grand-aggregate agreement stat: one all-NULL-margins row with
    # kappa degenerating to 1.0 (identical in the DuckDB oracle)
    "filter-agreement-kappa",
}


def _write_empty(root):
    """Schema-only twins of ALL ten fixture tables, cloned from the
    real fixtures' parquet footers so physical types (timestamp
    vintage, decimals, binary) match the production layout exactly."""
    import pyarrow.parquet as pq

    for t in TABLES:
        schema = pq.read_schema(f"{SF_SMALL}/{t}.parquet")
        pq.write_table(schema.empty_table(), f"{root}/{t}.parquet")


@pytest.fixture(scope="module")
def empty_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("empty_tables"))
    _write_empty(root)
    return root


@pytest.mark.parametrize("name", sorted(set(REGISTRY) - _EMPTY_EXCLUDED))
def test_queries_survive_empty_inputs(spark, empty_root, name):
    """EVERY registry query (minus the documented loud-failure set)
    must run to completion on schema-only tables, never crash — the
    contract a scheduled production job relies on when an upstream
    partition lands late. Queries outside _EMPTY_NONEMPTY_OK must
    additionally return zero rows."""
    rows = REGISTRY[name].fn(spark, empty_root).collect()
    if name == "funnel-signup-click-purchase":
        # the funnel emits its stage rows with zero counts
        assert all(r[-1] == 0 for r in rows)
    elif name not in _EMPTY_NONEMPTY_OK:
        assert rows == []
