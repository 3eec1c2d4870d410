"""Sparse text retrieval over the documents corpus: BM25 top-k.

The training-data loop uses retrieval constantly — "find the
documents most similar to this benchmark prompt" (contamination
triage beyond exact n-gram hits), "pull the docs matching this
failure query" (error analysis), seed selection for targeted
crawls. ANN answers the dense-embedding form (similarity.py); this
is the sparse lexical form.

Scale shape (the inverted-index join, no index structure needed):

- the query set is tiny and rides a broadcast; postings are PRUNED
  to query terms by a broadcast semi-join on the token BEFORE any
  aggregation, so the data-sized work is one filtered pass over the
  exploded tokens — at 100 TB this is a scan minus everything the
  term filter drops at the map side;
- tf, per-term df, and per-doc length are hash aggregates over that
  pruned posting set (df over query terms only — never a
  vocabulary-sized aggregate);
- corpus stats (N, Σdl) are a 1-row broadcast;
- the per-(query, doc) score folds its ≤|query| term contributions
  in token-sorted order (float addition is not associative — the
  fold fixes the order, embed-score discipline), and top-k per
  query is a row_number window over docs that MATCH at least one
  term, never the full corpus.

Determinism: contributions are per-row double expressions written
with identical association in Spark and the DuckDB oracle; the only
rounding is the presentation ROUND(6) before ranking (ties broken
by doc_id) — the tfidf-top-terms discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.functions.text import SQL_TOKENS, tokens
from projet_etl_spark.sources.tables import load_table

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
# queries over the fixture's vocabulary; tokens deduped in order
BM25_QUERIES: list[tuple[int, str]] = [
    (1, "hash join merge"),
    (2, "stream window batch"),
    (3, "fast scan filter column"),
]


def _query_terms() -> list[tuple[int, str]]:
    return [
        (qid, tok)
        for qid, q in BM25_QUERIES
        for tok in dict.fromkeys(q.split())
    ]


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents per query by BM25 (k1=1.2, b=0.75,
    idf = ln((N - df + 0.5)/(df + 0.5) + 1))."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    doclen = docs.select("doc_id", F.size("toks").alias("dl"))
    qterms = spark.createDataFrame(_query_terms(), "qid long, token string")
    terms = docs.select("doc_id", F.explode("toks").alias("token"))
    post = terms.join(
        F.broadcast(qterms.select("token").distinct()), "token", "left_semi"
    )
    tf = post.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    return bm25_rank(spark, tf, doclen)


def bm25_rank(spark: SparkSession, tf: DataFrame, doclen: DataFrame) -> DataFrame:
    """BM25 top-k from pre-aggregated inputs — shared by the batch
    query (pruned postings computed from text) and the streaming
    postings store read (streaming/postings.py), so store->query
    parity is literally the same scoring code over a different
    postings source.

    ``tf``: (doc_id, token, tf) covering AT LEAST the query terms —
    extra tokens are pruned here, and per-term df over the pruned
    postings equals df over the full index (pruning doesn't change
    which docs contain a query term). ``doclen``: (doc_id, dl) for
    the WHOLE corpus (N and avgdl are corpus stats).
    """
    qterms = spark.createDataFrame(_query_terms(), "qid long, token string")
    # prune to query terms (a no-op when the caller pre-pruned, as
    # the batch query does before aggregating tf — the semi-join on
    # an already-tiny tf costs nothing and keeps this function safe
    # for FULL postings sources like the streaming store)
    tf = tf.join(
        F.broadcast(qterms.select("token").distinct()), "token", "left_semi"
    )
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    dfq = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    contrib = (
        idf
        * (F.col("tf") * F.lit(BM25_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (
                F.lit(1.0)
                - F.lit(BM25_B)
                + F.lit(BM25_B) * F.col("dl") / avgdl
            )
        )
    )
    per_term = (
        tf.join(F.broadcast(dfq), "token")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qterms), "token")
        .select("qid", "doc_id", "token", contrib.alias("c"))
    )
    # token-sorted left fold: float addition order is pinned
    score = F.round(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("token", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ),
        6,
    )
    scored = per_term.groupBy("qid", "doc_id").agg(score.alias("score"))
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= BM25_TOPK)
        .orderBy("qid", "rnk")
    )


def _values_sql() -> str:
    return ", ".join(f"({qid}, '{tok}')" for qid, tok in _query_terms())


BM25_ORACLE_SQL = f"""
WITH queries(qid, token) AS (VALUES {_values_sql()}),
docs AS (
    SELECT doc_id, {SQL_TOKENS.format(col="text")} AS toks FROM documents
),
doclen AS (SELECT doc_id, len(toks) AS dl FROM docs),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM doclen),
terms AS (SELECT doc_id, unnest(toks) AS token FROM docs),
post AS (
    SELECT doc_id, token FROM terms
    WHERE token IN (SELECT token FROM queries)
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM post GROUP BY 1, 2),
dfq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM post GROUP BY 1),
contrib AS (
    SELECT q.qid, tf.doc_id, tf.token,
           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * {BM25_K1 + 1.0!r})
           / (tf + {BM25_K1!r} * (1.0 - {BM25_B!r}
              + {BM25_B!r} * dl
                / (CAST(sum_dl AS DOUBLE) / n_docs))) AS c
    FROM tf
    JOIN dfq USING (token)
    JOIN doclen USING (doc_id)
    JOIN queries q USING (token), stats
),
scored AS (
    SELECT qid, doc_id,
           round(list_reduce(
               list_prepend(0.0, list(c ORDER BY token)),
               (a, b) -> a + b), 6) AS score
    FROM contrib GROUP BY qid, doc_id
),
ranked AS (
    SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY qid ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
    FROM scored
)
SELECT CAST(qid AS BIGINT) AS qid, doc_id, score, rnk
FROM ranked WHERE rnk <= {BM25_TOPK}
ORDER BY qid, rnk
"""
