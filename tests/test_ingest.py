"""Whitespace-CSV ingest (SURVEY.md §2.1 S1-S5): regex delimiter,
mixed-case headers, %Y%m%d date parsing, parquet round-trip."""

from __future__ import annotations

import datetime

from projet_etl_spark.schemas import POINTS_DE_VENTE_SCHEMA, PRODUITS_SCHEMA
from projet_etl_spark.sources.ingest import (
    read_whitespace_csv,
    table_exists,
    write_table,
)

CSV = """DateID   ProdID  CatID FabID
20220101  1   10  100
20220102   2  20      200
20220103 3 10 100
"""


def test_whitespace_csv_roundtrip(spark, tmp_path):
    src = tmp_path / "produits-tous.csv"
    src.write_text(CSV)
    df = read_whitespace_csv(spark, str(src), PRODUITS_SCHEMA)
    rows = sorted(df.collect(), key=lambda r: r.prodid)
    assert [f.name for f in df.schema.fields] == ["dateid", "prodid", "catid", "fabid"]
    assert rows[0].dateid == datetime.date(2022, 1, 1)
    assert [r.catid for r in rows] == [10, 20, 10]

    out = str(tmp_path / "warehouse" / "produits")
    write_table(df, out, partition_by_month_of="dateid")
    assert table_exists(spark, out)
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert "month" in back.columns  # partition column materialized

    assert not table_exists(spark, str(tmp_path / "nope"))


def test_header_validation(spark, tmp_path):
    src = tmp_path / "bad.csv"
    src.write_text("dateid prodid WAT\n20220101 1 2\n")
    try:
        read_whitespace_csv(spark, str(src), POINTS_DE_VENTE_SCHEMA)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "wat" in str(e)
