"""Python Data Source connector (wscsv): equivalence with the
JVM text-scan ingest path, per-file parallelism, by-name header
mapping, and PERMISSIVE malformed-cell handling."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from projet_etl_spark.sources.pyds import register

SCHEMA = T.StructType(
    [
        T.StructField("dateid", T.DateType()),
        T.StructField("prodid", T.LongType()),
        T.StructField("magid", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    root = tmp_path_factory.mktemp("wscsv")
    (root / "a.txt").write_text(
        "DATEID  PRODID MAGID SCORE\n"
        "20240115 7 101 1.5\n"
        "20240116 8 102 2.25\n"
        "\n"
        "20240117 9 101 0.0\n"
    )
    # different column order + a malformed numeric cell
    (root / "b.txt").write_text(
        "PRODID DATEID SCORE MAGID\n"
        "11 20240201 9.75 103\n"
        "12 20240202 oops 104\n"
    )
    return str(root)


def test_reads_and_types(spark, staged):
    register(spark)
    df = spark.read.format("wscsv").schema(SCHEMA).load(staged)
    rows = sorted(df.collect(), key=lambda r: (r.dateid, r.prodid))
    assert len(rows) == 5
    assert str(rows[0].dateid) == "2024-01-15" and rows[0].prodid == 7
    assert rows[1].score == 2.25
    # by-name mapping across the reordered header in b.txt
    assert rows[3].magid == 103 and rows[3].score == 9.75
    # PERMISSIVE: malformed double -> NULL, row kept
    assert rows[4].prodid == 12 and rows[4].score is None


def test_one_partition_per_file(spark, staged):
    register(spark)
    df = spark.read.format("wscsv").schema(SCHEMA).load(staged)
    assert df.rdd.getNumPartitions() == 2


def test_matches_jvm_ingest_on_uniform_headers(spark, tmp_path):
    """Same header in every file -> connector == read_whitespace_csv."""
    from projet_etl_spark.sources.ingest import read_whitespace_csv

    for i in range(3):
        (tmp_path / f"s{i}.txt").write_text(
            "DATEID PRODID MAGID SCORE\n"
            + "".join(
                f"2024020{i + 1} {10 * i + j} {100 + j} {j}.5\n"
                for j in range(4)
            )
        )
    register(spark)
    got = sorted(
        map(
            tuple,
            spark.read.format("wscsv")
            .schema(SCHEMA)
            .load(str(tmp_path))
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            read_whitespace_csv(spark, str(tmp_path), SCHEMA).collect(),
        )
    )
    assert got == want and len(got) == 12


def test_unknown_header_column_raises(spark, tmp_path):
    (tmp_path / "bad.txt").write_text("DATEID WAT\n20240101 1\n")
    register(spark)
    df = spark.read.format("wscsv").schema(SCHEMA).load(str(tmp_path))
    with pytest.raises(Exception, match="not in schema"):
        df.collect()


def test_schema_required(spark, staged):
    register(spark)
    with pytest.raises(Exception, match="explicit schema"):
        spark.read.format("wscsv").load(staged).collect()


def test_write_round_trip(spark, tmp_path):
    register(spark)
    src = spark.createDataFrame(
        [
            ("2024-01-15", 7, 101, 1.5),
            ("2024-01-16", None, 102, 2.25),
            ("2024-01-17", 9, 103, None),
        ],
        "d string, prodid long, magid long, score double",
    ).selectExpr("CAST(d AS DATE) AS dateid", "prodid", "magid", "score")
    out = str(tmp_path / "out")
    src.write.format("wscsv").mode("overwrite").save(out)
    import os

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = spark.read.format("wscsv").schema(SCHEMA).load(out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_write_overwrite_replaces(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "out")
    a = spark.createDataFrame([(1,)], "prodid long")
    b = spark.createDataFrame([(2,)], "prodid long")
    a.write.format("wscsv").mode("overwrite").save(out)
    b.write.format("wscsv").mode("overwrite").save(out)
    got = (
        spark.read.format("wscsv")
        .schema("prodid long")
        .load(out)
        .collect()
    )
    assert [r.prodid for r in got] == [2]


def test_write_refuses_whitespace_strings(spark, tmp_path):
    register(spark)
    df = spark.createDataFrame([("two words",)], "name string")
    with pytest.raises(Exception, match="whitespace"):
        df.write.format("wscsv").mode("overwrite").save(
            str(tmp_path / "bad")
        )


def test_boolean_nulls_round_trip(spark, tmp_path):
    register(spark)
    src = spark.createDataFrame(
        [(1, True), (2, False), (3, None)], "k long, flag boolean"
    )
    out = str(tmp_path / "bools")
    src.write.format("wscsv").mode("overwrite").save(out)
    back = spark.read.format("wscsv").schema("k long, flag boolean").load(out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_failed_overwrite_preserves_old_data(spark, tmp_path):
    """Overwrite must not destroy the previous dataset when a task
    fails: old files are deleted only at commit time."""
    register(spark)
    out = str(tmp_path / "keep")
    good = spark.createDataFrame([("ok",)], "name string")
    good.write.format("wscsv").mode("overwrite").save(out)
    bad = spark.createDataFrame([("two words",)], "name string")
    with pytest.raises(Exception, match="whitespace"):
        bad.write.format("wscsv").mode("overwrite").save(out)
    back = spark.read.format("wscsv").schema("name string").load(out)
    assert [r.name for r in back.collect()] == ["ok"]


def test_append_commit_leaves_foreign_temps(spark, tmp_path):
    """An append commit may sweep only its OWN job's temp files: a
    concurrent append job's in-flight `.part-<otherjob>-*.tmp` is not
    ours to delete (that job's commit still has to rename it).
    Overwrite asserts exclusive directory ownership and reclaims
    every orphaned temp."""
    import os

    register(spark)
    out = str(tmp_path / "conc")
    first = spark.createDataFrame([(1,)], "prodid long")
    first.write.format("wscsv").mode("overwrite").save(out)
    # simulate another job's in-flight task temp
    foreign = os.path.join(out, ".part-deadbeef0000-abc.txt.tmp")
    with open(foreign, "w", encoding="utf-8") as fh:
        fh.write("PRODID\n99\n")

    spark.createDataFrame([(2,)], "prodid long").write.format("wscsv").mode(
        "append"
    ).save(out)
    assert os.path.exists(foreign)  # append left it for its owner
    got = spark.read.format("wscsv").schema("prodid long").load(out)
    assert sorted(r.prodid for r in got.collect()) == [1, 2]

    spark.createDataFrame([(3,)], "prodid long").write.format("wscsv").mode(
        "overwrite"
    ).save(out)
    assert not os.path.exists(foreign)  # overwrite reclaimed the orphan
    got = spark.read.format("wscsv").schema("prodid long").load(out)
    assert [r.prodid for r in got.collect()] == [3]
