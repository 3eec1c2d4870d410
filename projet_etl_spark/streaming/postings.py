"""Streaming inverted-postings maintenance — the incremental index
behind BM25 retrieval over a document stream.

Each micro-batch of (doc_id, text) reduces to its own postings
partial (doc_id, token, tf) plus per-doc lengths (doc_id, dl) and
lands idempotently under its batch partition (the replay-safe layout
shared with streaming/sketch.py). Documents arrive in exactly one
batch, so the union of partials IS the full index — no folding
arithmetic at all; the serving read is a plain union, and BM25 over
the store reuses the batch query's scoring code verbatim
(operators/retrieval.bm25_rank), which is what makes store→query
parity a driver-checkable fact rather than a pytest-only claim.

At 100 TB: per-batch state is the batch's own vocabulary-sized
partial; the store grows with the corpus (it IS the index) but every
BM25 read prunes it to query terms before anything aggregates. A
long-lived stream compacts per-batch partitions with the same
small-files discipline as the neardedup store (token-bucketed files
would add scan pruning; out of scope here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from projet_etl_spark.functions.text import tokens
from projet_etl_spark.streaming.neardedup import _write_batch_partition

POSTINGS_SCHEMA = "doc_id long, token string, tf long"
DOCLEN_SCHEMA = "doc_id long, dl long"


def postings_of_batch(batch_docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(postings, doclen) partials of one (doc_id, text) micro-batch
    — identical tokenization to the batch operator."""
    docs = batch_docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    post = (
        docs.select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    doclen = docs.select("doc_id", F.size("toks").cast("long").alias("dl"))
    return post, doclen


def upsert_postings_batch(
    batch_docs: DataFrame, batch_id: int, store_path: str
) -> None:
    """foreachBatch body: land this batch's postings + doclen under
    their own partitions (idempotent on replay)."""
    import os

    docs = batch_docs.select("doc_id", "text").localCheckpoint()
    if docs.isEmpty():
        return
    post, doclen = postings_of_batch(docs)
    _write_batch_partition(post, os.path.join(store_path, "postings"), batch_id)
    _write_batch_partition(doclen, os.path.join(store_path, "doclen"), batch_id)


def stream_postings(
    docs_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Wire a (doc_id, text) stream into the incremental index."""

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        upsert_postings_batch(batch_df, batch_id, store_path)

    writer = docs_stream.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_postings(spark: SparkSession, store_path: str) -> DataFrame:
    import os

    try:
        return spark.read.parquet(os.path.join(store_path, "postings")).select(
            "doc_id", "token", "tf"
        )
    except Exception:
        return spark.createDataFrame([], POSTINGS_SCHEMA)


def read_doclen(spark: SparkSession, store_path: str) -> DataFrame:
    import os

    try:
        return spark.read.parquet(os.path.join(store_path, "doclen")).select(
            "doc_id", "dl"
        )
    except Exception:
        return spark.createDataFrame([], DOCLEN_SCHEMA)


def bm25_from_store(spark: SparkSession, store_path: str) -> DataFrame:
    """BM25 top-k served from the incremental index — the exact
    scoring code of the batch query over the store's postings."""
    from projet_etl_spark.operators.retrieval import bm25_rank

    return bm25_rank(
        spark, read_postings(spark, store_path), read_doclen(spark, store_path)
    )
