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
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    # r13 (guide §2.3, aggregate before you expand): the sketch cells
    # used to be built from every token OCCURRENCE exploded CMS_ROWS
    # ways (4 x |occurrences| md5 bucket hashes through the cell
    # aggregate); summing the per-token exact counts into the cells
    # instead needs only 4 x |vocabulary| hashes — the cell values
    # are identical (sum of per-token counts per cell == occurrence
    # count per cell), and the token aggregate is the exact side's
    # subtree anyway (one ReusedExchange serves both). Interleaved
    # A/B and oracle equality in OPTIMIZATION_r13.md.
    occ = exact.select("tok", "exact_n", F.explode(_row_ids()).alias("r"))
    cells = (
        occ.select(
            "r", cms_bucket(F.col("r"), F.col("tok")).alias("bucket"), "exact_n"
        )
        .groupBy("r", "bucket")
        .agg(F.sum("exact_n").alias("c"))
    )
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


# --- KMV (k-minimum-values) distinct sketch -------------------------

KMV_K = 64


def q_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimate from a K-minimum-values
    sketch, audited against the exact count: (event_type, n_exact,
    n_est, rel_err).

    The KMV estimator — est = (K-1)/u_(K), with u_(K) the K-th
    smallest normalized hash of the key — is the oracle-able
    counterpart of the engine's HLL helpers: built on the portable
    md5 hash, the sketch CONTENTS (the K minima) are bit-identical
    across engines, so unlike HLL the estimate itself passes a hard
    value gate. When a group holds fewer than K distinct hashes the
    sketch is exact by the standard small-set rule.

    Scale shape: the sketch state is K hashes per group (mergeable:
    union then re-take K minima — the map-side partial IS a partial
    sketch); here the K-th minimum comes from one per-group window
    over pre-deduped (type, hash) rows, both shuffles on the group
    key. The exact side exists to audit the estimate; production
    keeps only the sketch.
    """
    from pyspark.sql import Window

    from projet_etl_spark.functions.text import portable_hash60
    from projet_etl_spark.sources.tables import events

    ev = events(spark, sf_dir).select("event_type", "user_id")
    hashes = ev.select(
        "event_type",
        portable_hash60(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = hashes.withColumn("rn", F.row_number().over(w))
    per_type = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hashes"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("h"))).alias("h_k"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    u_k = F.col("h_k").cast("double") / F.lit(float(1 << 60))
    est = F.when(
        F.col("n_hashes") < KMV_K, F.col("n_hashes").cast("double")
    ).otherwise(F.lit(float(KMV_K - 1)) / u_k)
    return (
        per_type.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.round(est, 6).alias("n_est"),
            F.round(
                F.abs(est - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


# --- bottom-k-by-hash sample quantiles ------------------------------

QSAMPLE_K = 1024
QSAMPLE_QS = [round(0.1 * i, 1) for i in range(1, 10)]


def q_quantiles_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile estimates of the events value distribution from a
    deterministic bottom-K-by-hash row sample — the quantile sketch
    that, unlike t-digest/KLL, passes a hard value gate: the K rows
    with the smallest portable md5 hashes are a uniform sample BOTH
    engines select identically, so the estimates themselves are
    oracle-exact while remaining estimates of the true quantiles
    (accuracy pinned with tolerance in tests/test_sketches_extra.py).

    Mergeable like distinct-kmv: bottom-K of a union is the bottom-K
    of the per-partition bottom-Ks, so the map-side partial is a
    partial sketch and the state is K rows at any data size.

    Scale shape: the sample selection plans as TakeOrdered by the
    hash (per-partition heaps, zero exchange before the K-row
    gather — the sample-weighted-n discipline); ranking and the
    quantile pick run on the K-row sample (the single-partition
    window is bounded at K by construction); rank->quantile mapping
    is a higher-order-function filter, no join. Exact quantiles at
    extreme cardinality are the documented swap the other way
    (value-percentiles / approx_percentile); this is the bounded-
    state path.
    """
    from projet_etl_spark.functions.text import portable_hash60
    from projet_etl_spark.sources.tables import events

    ev = events(spark, sf_dir).select("event_id", "value")
    sample = (
        ev.select(
            "value",
            portable_hash60(F.col("event_id").cast("string")).alias("hk"),
        )
        .orderBy("hk", "value")
        .limit(QSAMPLE_K)
    )
    return decile_estimates(sample)


def decile_estimates(sample: DataFrame) -> DataFrame:
    """(q, est, n_sample) discrete-order-statistic deciles of a
    (hk, value) sample frame — shared by the batch operator and the
    streaming store read (streaming/quantiles.py), so store->query
    parity is the same code path plus a merged sample."""
    from pyspark.sql import Window

    w = Window.orderBy("value", "hk")
    ranked = sample.withColumn(
        "rn", F.row_number().over(w).cast("long")
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
    qarr = F.array(*[F.lit(float(q)) for q in QSAMPLE_QS])
    hit = F.filter(
        qarr, lambda x: F.ceil(x * F.col("n")) == F.col("rn")
    )
    return (
        ranked.select(
            F.explode(hit).alias("q"),
            F.col("value").alias("est"),
            F.col("n").cast("long").alias("n_sample"),
        )
        .orderBy("q")
    )


QSAMPLE_ORACLE_SQL = f"""
WITH sample AS (
    SELECT value,
           ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
               AS hk
    FROM events ORDER BY hk, value LIMIT {QSAMPLE_K}
),
ranked AS (
    SELECT value,
           CAST(row_number() OVER (ORDER BY value, hk) AS BIGINT) AS rn,
           COUNT(*) OVER () AS n
    FROM sample
)
SELECT unnest(list_filter(CAST({QSAMPLE_QS!r} AS DOUBLE[]),
                          x -> CAST(ceil(x * n) AS BIGINT) = rn)) AS q,
       value AS est,
       CAST(n AS BIGINT) AS n_sample
FROM ranked
ORDER BY q
"""


# --- KMV set algebra: intersection estimates -------------------------


def q_distinct_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-user INTERSECTION estimates between event
    types from K-minimum-values sketches, audited against the exact
    counts — the sketch-algebra completion of distinct-kmv: two KMV
    sketches answer |A ∪ B| (bottom-K of the sketch union IS the
    union's sketch) and Jaccard (fraction of the union sketch present
    in both sides), so |A ∩ B| ≈ J x U with no second pass over the
    data. Like every sketch here, the contents are portable md5
    minima, so estimates are bit-identical across engines and pass a
    hard value gate; when the union holds fewer than K hashes the
    small-set rule makes them exact.

    Scale shape: per-type sketches are K rows each (the same bounded
    state distinct-kmv maintains — mergeable map-side); all pair
    arithmetic runs on type_pairs x K rows, independent of corpus
    size. The exact side (a user-grain self-join) exists to audit
    the estimate at test scale; production keeps only the sketches.
    """
    from pyspark.sql import Window

    from projet_etl_spark.functions.text import portable_hash60
    from projet_etl_spark.sources.tables import events

    ev = events(spark, sf_dir).select("event_type", "user_id").distinct()
    hashes = ev.select(
        "event_type",
        portable_hash60(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "h")
    )
    types = sk.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .crossJoin(
            F.broadcast(types.select(F.col("event_type").alias("type_b")))
        )
        .filter(F.col("type_a") < F.col("type_b"))
    )
    ua = pairs.join(
        sk.select(F.col("event_type").alias("type_a"), "h"), "type_a"
    ).select("type_a", "type_b", "h")
    ub = pairs.join(
        sk.select(F.col("event_type").alias("type_b"), "h"), "type_b"
    ).select("type_a", "type_b", "h")
    union = ua.unionByName(ub).distinct()
    wp = Window.partitionBy("type_a", "type_b").orderBy("h")
    kept = union.withColumn("rn", F.row_number().over(wp)).filter(
        F.col("rn") <= KMV_K
    )
    in_a = kept.join(
        sk.select(F.col("event_type").alias("type_a"), "h"),
        ["type_a", "h"],
        "left_semi",
    ).select("type_a", "type_b", "h")
    in_both = in_a.join(
        sk.select(F.col("event_type").alias("type_b"), "h"),
        ["type_b", "h"],
        "left_semi",
    )
    matches = in_both.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_match")
    )
    stats = kept.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("k_u"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("h"))).alias("h_k"),
    )
    exact = (
        ev.select(F.col("event_type").alias("type_a"), "user_id")
        .join(
            ev.select(F.col("event_type").alias("type_b"), "user_id"),
            "user_id",
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    )
    union_est = F.when(
        F.col("k_u") < KMV_K, F.col("k_u").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1))
        / (F.col("h_k").cast("double") / F.lit(float(1 << 60)))
    )
    jacc = F.col("n_match").cast("double") / F.col("k_u").cast("double")
    est = jacc * union_est
    return (
        stats.join(matches, ["type_a", "type_b"], "left")
        .withColumn("n_match", F.coalesce(F.col("n_match"), F.lit(0)))
        .join(exact, ["type_a", "type_b"], "left")
        .withColumn("n_exact", F.coalesce(F.col("n_exact"), F.lit(0)))
        .select(
            "type_a",
            "type_b",
            "n_exact",
            F.round(est, 6).alias("n_est"),
            F.round(
                F.abs(est - F.col("n_exact").cast("double"))
                / F.greatest(F.col("n_exact").cast("double"), F.lit(1.0)),
                6,
            ).alias("rel_err"),
        )
        .orderBy("type_a", "type_b")
    )


KMV_INTERSECT_ORACLE_SQL = f"""
WITH ev AS (SELECT DISTINCT event_type, user_id FROM events),
hashes AS (
    SELECT DISTINCT event_type,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
    FROM ev
),
sk AS (
    SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM hashes) WHERE rn <= {KMV_K}
),
types AS (SELECT DISTINCT event_type FROM sk),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b
    FROM types a, types b WHERE a.event_type < b.event_type
),
un AS (
    SELECT DISTINCT type_a, type_b, h FROM (
        SELECT p.type_a, p.type_b, s.h
        FROM pairs p JOIN sk s ON s.event_type = p.type_a
        UNION ALL
        SELECT p.type_a, p.type_b, s.h
        FROM pairs p JOIN sk s ON s.event_type = p.type_b)
),
kept AS (
    SELECT * FROM (
        SELECT type_a, type_b, h,
               row_number() OVER (
                   PARTITION BY type_a, type_b ORDER BY h) AS rn
        FROM un) WHERE rn <= {KMV_K}
),
matches AS (
    SELECT k.type_a, k.type_b, COUNT(*) AS n_match
    FROM kept k
    WHERE EXISTS (SELECT 1 FROM sk WHERE event_type = k.type_a AND h = k.h)
      AND EXISTS (SELECT 1 FROM sk WHERE event_type = k.type_b AND h = k.h)
    GROUP BY 1, 2
),
stats AS (
    SELECT type_a, type_b, COUNT(*) AS k_u,
           MAX(CASE WHEN rn = {KMV_K} THEN h END) AS h_k
    FROM kept GROUP BY 1, 2
),
exact AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(DISTINCT a.user_id) AS n_exact
    FROM ev a JOIN ev b ON a.user_id = b.user_id
    WHERE a.event_type < b.event_type
    GROUP BY 1, 2
),
est AS (
    SELECT s.type_a, s.type_b,
           COALESCE(e.n_exact, 0) AS n_exact,
           (CAST(COALESCE(m.n_match, 0) AS DOUBLE) / CAST(s.k_u AS DOUBLE))
           * (CASE WHEN s.k_u < {KMV_K} THEN CAST(s.k_u AS DOUBLE)
                   ELSE CAST({KMV_K - 1} AS DOUBLE)
                        / (CAST(s.h_k AS DOUBLE)
                           / CAST({float(1 << 60)} AS DOUBLE)) END)
               AS raw_est
    FROM stats s
    LEFT JOIN matches m ON s.type_a = m.type_a AND s.type_b = m.type_b
    LEFT JOIN exact e ON s.type_a = e.type_a AND s.type_b = e.type_b
)
SELECT type_a, type_b,
       CAST(n_exact AS BIGINT) AS n_exact,
       round(raw_est, 6) AS n_est,
       round(abs(raw_est - CAST(n_exact AS DOUBLE))
             / greatest(CAST(n_exact AS DOUBLE), 1.0), 6) AS rel_err
FROM est
ORDER BY type_a, type_b
"""
