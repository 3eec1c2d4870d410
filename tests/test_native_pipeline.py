"""The migrating user's path, end to end: whitespace CSVs shaped
exactly like the reference's inputs (reference data.py:5-14) ->
distributed ingest -> month-partitioned parquet warehouse -> the
same registry queries, oracle-compared by DuckDB on the NATIVE
tables (catid as integer, no star-schema mapping anywhere)."""

from __future__ import annotations

import random

import duckdb
import pytest

from projet_etl_spark.api import run_query
from projet_etl_spark.schemas import POINTS_DE_VENTE_SCHEMA, PRODUITS_SCHEMA
from projet_etl_spark.sources.ingest import read_whitespace_csv, write_table
from tests.conftest import assert_matches_oracle


def _make_csvs(tmp):
    """Synthesize data.py-shaped inputs: header + variable-width
    whitespace, dateid as yyyyMMdd ints, mixed-case header."""
    rng = random.Random(7)
    days = [f"2022{m:02d}{d:02d}" for m in (1, 2, 3) for d in (3, 14, 25)]
    prod_lines = ["DateID  ProdID CatID  FabID"]
    pv_lines = ["dateID ProdID  CatID FabID   MagID"]
    for _ in range(400):
        d = rng.choice(days)
        prodid = rng.randint(1, 40)
        catid = 1 + prodid % 5
        fabid = 1 + prodid % 7
        prod_lines.append(f"{d}  {prodid}   {catid} {fabid}")
        for _ in range(rng.randint(1, 3)):
            magid = rng.randint(1, 12)
            pv_lines.append(f"{d} {prodid}  {catid}   {fabid}  {magid}")
    (tmp / "produits-tous.csv").write_text("\n".join(prod_lines) + "\n")
    (tmp / "pointsDeVente-tous.csv").write_text("\n".join(pv_lines) + "\n")


@pytest.fixture(scope="module")
def native_wh(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native")
    _make_csvs(tmp)
    wh = tmp / "warehouse"
    prod = read_whitespace_csv(spark, str(tmp / "produits-tous.csv"), PRODUITS_SCHEMA)
    pv = read_whitespace_csv(
        spark, str(tmp / "pointsDeVente-tous.csv"), POINTS_DE_VENTE_SCHEMA
    )
    write_table(prod, str(wh / "produits"), partition_by_month_of="dateid")
    write_table(pv, str(wh / "points_de_vente"), partition_by_month_of="dateid")
    con = duckdb.connect()
    for t in ("produits", "points_de_vente"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT dateid, prodid, catid, fabid"
            + (", magid" if t == "points_de_vente" else "")
            + f" FROM read_parquet('{wh}/{t}/*/*.parquet')"
        )
    yield str(wh), con
    con.close()


# oracle templates against the NATIVE tables (no star mapping, no
# ORACLE_VIEWS prefix); catid is an integer here, as in the reference
_NATIVE_ORACLES = {
    "top-magasins-cat": """
        SELECT magid,
               COUNT(DISTINCT fabid) AS total_fabricants,
               COUNT(DISTINCT prodid) AS total_produits,
               COUNT(*) AS total_ventes,
               (COUNT(DISTINCT fabid) * CAST(0.1 AS DOUBLE)
                + COUNT(DISTINCT prodid) * CAST(0.3 AS DOUBLE)
                + COUNT(*) * CAST(0.6 AS DOUBLE)) AS score
        FROM points_de_vente
        WHERE catid = 3 AND dateid BETWEEN DATE '2022-01-01' AND DATE '2022-03-31'
        GROUP BY magid ORDER BY score DESC, magid LIMIT 10
    """,
    "nb-mag-cat-date": """
        SELECT strftime(dateid, '%Y-%m') AS mois,
               COUNT(DISTINCT magid) AS nbmag
        FROM points_de_vente
        WHERE catid = 3 AND EXTRACT(year FROM dateid) = 2022
        GROUP BY 1 ORDER BY mois
    """,
    "avg-prod-per-fab": """
        SELECT AVG(product_count) AS avg_products_per_fab
        FROM (SELECT fabid, COUNT(DISTINCT prodid) AS product_count
              FROM produits
              WHERE catid = 3
                AND dateid BETWEEN DATE '2022-01-01' AND DATE '2022-03-31'
              GROUP BY fabid) s
    """,
}


def test_native_top_magasins_cat(spark, native_wh):
    wh, con = native_wh
    df = run_query(
        spark, wh, "top-magasins-cat", catID=3, debut="2022-01-01", fin="2022-03-31"
    )
    assert_matches_oracle(df, con, _NATIVE_ORACLES["top-magasins-cat"], "native:topk")


def test_native_nb_mag_cat_date(spark, native_wh):
    wh, con = native_wh
    df = run_query(spark, wh, "nb-mag-cat-date", catID=3, annee=2022)
    assert_matches_oracle(df, con, _NATIVE_ORACLES["nb-mag-cat-date"], "native:ts")


def test_native_avg_prod_per_fab(spark, native_wh):
    wh, con = native_wh
    df = run_query(
        spark, wh, "avg-prod-per-fab", catID=3, debut="2022-01-01", fin="2022-03-31"
    )
    assert_matches_oracle(df, con, _NATIVE_ORACLES["avg-prod-per-fab"], "native:avg")
