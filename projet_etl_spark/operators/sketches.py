"""Deterministic mergeable sketches: count-min token frequencies.

The sketch family a 100 TB curation pipeline leans on when exact
aggregation state stops fitting: bounded-memory summaries whose
partials merge associatively map-side. The engine's HLL twins are
library helpers (engine-native estimates can't be oracle-checked);
the sketches HERE are built from the portable md5 hash
(functions/text.py), so the sketch *contents* are bit-identical
across Spark, DuckDB and any future engine — an oracle-exact sketch,
which is also what you want operationally (a sketch persisted by one
engine must be readable by another).

``q_token_freq_cms`` is the heavy-hitters audit: a CMS_ROWS x
CMS_WIDTH count-min sketch over every token occurrence, probed for
the exact top-CMS_TOP_K tokens, reporting estimate vs truth and the
overcount (the collision tax). The CMS guarantee est >= exact holds
by construction and is pinned in pytest.

Scale shape: building the sketch is ONE hash aggregation whose
result is bounded at CMS_ROWS x CMS_WIDTH cells regardless of corpus
size (the map-side partial IS a partial sketch — this is exactly the
mergeability argument); the probe joins the bounded cell table
(broadcast) against the top-k list. The exact side exists to audit
the sketch at test scale; a production run keeps only the sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.functions.text import h30, tokens
from projet_etl_spark.sources.tables import load_table

CMS_ROWS = 4
CMS_WIDTH = 1024
CMS_TOP_K = 50


def cms_bucket(r: Column, tok: Column) -> Column:
    """Cell column of token ``tok`` in sketch row ``r``: md5-derived,
    so identical in every engine."""
    return h30(F.concat(r.cast("string"), F.lit("#"), tok)) % F.lit(CMS_WIDTH)


def _row_ids() -> Column:
    return F.array(*[F.lit(r) for r in range(CMS_ROWS)])


def q_token_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs count-min estimated frequency for the corpus's
    top-CMS_TOP_K tokens: (tok, exact_n, cms_n, overcount)."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("tok")
    )
    occ = toks.select("tok", F.explode(_row_ids()).alias("r"))
    cells = (
        occ.select("r", cms_bucket(F.col("r"), F.col("tok")).alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    topk = exact.orderBy(F.desc("exact_n"), F.asc("tok")).limit(CMS_TOP_K)
    probes = topk.select(
        "tok", "exact_n", F.explode(_row_ids()).alias("r")
    ).select(
        "tok",
        "exact_n",
        "r",
        cms_bucket(F.col("r"), F.col("tok")).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("c").alias("cms_n"))
    )
    return est.select(
        "tok",
        F.col("exact_n").cast("long").alias("exact_n"),
        F.col("cms_n").cast("long").alias("cms_n"),
        (F.col("cms_n") - F.col("exact_n")).cast("long").alias("overcount"),
    ).orderBy(F.desc("exact_n"), F.asc("tok"))
