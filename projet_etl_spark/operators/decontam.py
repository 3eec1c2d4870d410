"""Benchmark decontamination: flag training documents that share long
word n-grams with an evaluation set.

The canonical pre-training hygiene step: any training document that
contains a verbatim k-gram from a benchmark/eval suite leaks the
benchmark into the training corpus and must be dropped or scrubbed.
Output is one row per contaminated training doc with the number of
distinct eval k-grams it contains (the evidence strength).

The fixture has no separate benchmark table, so the lowest
``EVAL_DOCS`` doc_ids play the eval suite — at test scale this still
exercises the real signal (the corpus's near-duplicate copies of
those docs are exactly what gets flagged).

100 TB design: the eval-set shingle table is tiny relative to the
corpus (benchmark suites are thousands of documents; the corpus is
billions), so it BROADCASTS and the probe over training shingles is
a map-side hash join — the only shuffle is the per-doc rollup of
hits, whose input is just the matching shingles. k = 5 rather than
the dedup family's 3-grams: short grams over-flag common phrases
(measured: 3-grams flag 79% of this corpus, 5-grams flag the three
actual near-copies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.functions.text import portable_hash60, shingles_k, tokens
from projet_etl_spark.sources.tables import load_table

EVAL_DOCS = 20  # doc_id < EVAL_DOCS stands in for the benchmark set
CONTAM_K = 5


def _shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", tokens(F.col("text")).alias("t")).select(
        "doc_id", F.explode(shingles_k(F.col("t"), CONTAM_K)).alias("s")
    )


def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_overlap) for every training doc sharing at least one
    distinct eval 5-gram with the eval set.

    r13: examined for a persist of the shingle frame (it feeds the
    eval and training sides) — interleaved A/B showed the persist
    LOSES (0.73 s vs 1.00 s): Spark's ReusedExchange already dedups
    the identical subtree and the eager persist adds a count job +
    cache write. Left unpersisted deliberately."""
    sh = _shingle_sets(spark, sf_dir)
    ev = sh.filter(F.col("doc_id") < EVAL_DOCS).select("s").distinct()
    return (
        sh.filter(F.col("doc_id") >= EVAL_DOCS)
        .join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        # per-doc shingles and the eval set are both distinct, so each
        # (doc, gram) hit appears exactly once
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


# --- Bloom-filter variant --------------------------------------------
#
# At 100 TB the exact broadcast of the eval gram STRINGS can already
# be heavy (a large eval suite times long grams); the production
# shape broadcasts a BLOOM FILTER of the eval grams instead — fixed
# BLOOM_BITS bits however large the suite — and pays for the
# compression with a tunable false-positive rate on the probe side.
# The filter is built from BLOOM_HASHES md5-derived bit positions per
# gram (portable across engines, so the whole path oracle-checks);
# no false negatives by construction (every exact hit is also a
# bloom hit — pinned in pytest), and the query reports the
# false-positive tax per doc so the cost of the compression is
# visible rather than silent.

# sized at the standard ~10 bits per element for the fixture's eval
# gram count (~12k grams): k=5 hashes at 2^17 bits gives a per-gram
# false-positive rate ~6e-5, so per-DOC flagging (hundreds of gram
# probes each) stays clean — an undersized filter floods doc-level
# results even when the per-gram rate looks acceptable (measured:
# 4096 bits / 3 hashes bloom-flagged 464/480 docs, nearly all false)
BLOOM_BITS = 1 << 17
BLOOM_HASHES = 5


def _bloom_bit_col(i, s):
    """Bit position of gram ``s`` under hash index column ``i``:
    h30 of the salted gram reduced mod BLOOM_BITS."""
    from projet_etl_spark.functions.text import h30

    return h30(F.concat(i.cast("string"), F.lit("#"), s)) % F.lit(BLOOM_BITS)


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per flagged training doc: bloom-positive gram count, exact
    overlap count, and the false-positive difference.

    Probe: a training gram is bloom-positive iff ALL BLOOM_HASHES of
    its bit positions are set in the eval filter — i.e. its
    BLOOM_HASHES probe rows all survive the equi-join against the
    (<= BLOOM_BITS row) set-bit table, counted per gram.

    r13: a persist of the shingle frame was A/B'd and LOSES (2.46 s
    unpersisted vs 2.90 s persisted, interleaved in one session) —
    ReusedExchange dedups what the persist would, cheaper. The win
    here is structural (below): the probe side no longer explodes
    into BLOOM_HASHES rows per gram or shuffles them back.
    """
    sh = _shingle_sets(spark, sf_dir)
    ev = sh.filter(F.col("doc_id") < EVAL_DOCS).select("s").distinct()
    hash_ids = F.array(*[F.lit(i) for i in range(BLOOM_HASHES)])
    bits = (
        ev.select(F.explode(hash_ids).alias("i"), "s")
        .select(_bloom_bit_col(F.col("i"), F.col("s")).alias("bit"))
        .distinct()
    )
    # r13 (guide §3.2, the manual bloom-filter shape): fold the set
    # bits into an actual BITMAP — BLOOM_BITS/64 = 2048 long words,
    # 16 KiB at ANY corpus size (the filter's size is a compile-time
    # constant; that is the point of a bloom filter) — and evaluate
    # the 5-hash membership as a map-only expression over the probe
    # row. The previous shape exploded every training gram into
    # BLOOM_HASHES probe rows, broadcast-joined them against the
    # set-bit table and hash-aggregated the matches back to
    # (doc_id, s) grain: a 5x row explosion plus a shuffle, all to
    # compute a per-row predicate. The driver round-trip is bounded
    # by the constant word count (<= 2048 rows — the k-means-seed /
    # DSIR-table bounded-collect class), never by data. Bit
    # positions, hash math and the all-5-set predicate are unchanged
    # integer ops, so the flagged set is identical (same oracle).
    # single-bit masks as a 64-long literal (python's 1 << 63 wraps to
    # long-min like the JVM's) — the Python shiftleft/shiftright API
    # only takes literal shift amounts, so bit tests go through an
    # element_at lookup instead of a column-valued shift
    pow2 = F.lit(
        [(1 << k) if k < 63 else -(1 << 63) for k in range(64)]
    )
    word_rows = (
        bits.select(
            F.expr("cast(div(bit, 64) as int)").alias("w"),
            F.element_at(pow2, (F.col("bit") % 64).cast("int") + 1).alias(
                "m"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
        .collect()
    )
    bitmap = [0] * (BLOOM_BITS // 64)
    for r in word_rows:
        bitmap[r["w"]] = r["mask"]
    words = F.lit(bitmap)
    train = sh.filter(F.col("doc_id") >= EVAL_DOCS)

    def _is_set(i: int):
        # p is non-negative (h30 % BLOOM_BITS), so p >> 6 == p div 64
        p = _bloom_bit_col(F.lit(i), F.col("s"))
        word = F.element_at(words, F.shiftright(p, 6).cast("int") + F.lit(1))
        mask = F.element_at(pow2, (p % 64).cast("int") + 1)
        return word.bitwiseAND(mask) != F.lit(0)

    all_set = F.lit(True)
    for i in range(BLOOM_HASHES):
        all_set = all_set & _is_set(i)
    bloom_pos = train.filter(all_set).select("doc_id", "s")
    exact_pos = train.join(F.broadcast(ev), "s").select("doc_id", "s")
    per_doc = (
        bloom_pos.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bloom_hits"))
        .join(
            exact_pos.groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("n_exact_hits")
            ),
            "doc_id",
            "left",
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_bloom_hits").cast("long").alias("n_bloom_hits"),
        F.coalesce(F.col("n_exact_hits"), F.lit(0)).cast("long").alias("n_exact_hits"),
        (
            F.col("n_bloom_hits") - F.coalesce(F.col("n_exact_hits"), F.lit(0))
        )
        .cast("long")
        .alias("n_false_pos"),
    ).orderBy("doc_id")


# --- semantic (embedding) decontamination ----------------------------
#
# Verbatim n-grams miss PARAPHRASED benchmark leakage; the semantic
# variant flags training vectors whose embedding lies too close to
# any eval-set embedding. Completes the decontamination triple:
# exact grams (q_decontaminate_ngram), sketched grams
# (q_decontaminate_bloom), and meaning (this).

EVAL_VECS = 32  # vec_id < EVAL_VECS stands in for the benchmark set
SEM_CONTAM_THRESHOLD = 0.4


def q_decontaminate_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, max_cos, n_eval_hits) for every training vector whose
    cosine against ANY eval vector reaches SEM_CONTAM_THRESHOLD —
    paraphrase-level benchmark leakage the n-gram probes cannot see.

    100 TB design: the eval block is benchmark-sized (thousands),
    bounded and broadcast — the training side streams through ONE
    map-side expansion of |eval| rows per vector and reduces
    immediately to (vec_id, max, count); no shuffle touches the
    pairwise grid. The cosine is the fold dot/norm (bit-identical
    left-associated order to the oracle's generated sum) rounded to
    6 dp BEFORE the threshold, so both engines flag identical
    vectors. At real scale swap the broadcast block for the
    IVF-pruned probe (similarity.py) — contract unchanged.
    """
    from projet_etl_spark.functions.vectors import cosine, fold_dot, fold_norm2

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    ev = (
        emb.filter(F.col("vec_id") < EVAL_VECS)
        .select(F.col("v").alias("evec"))
        .withColumn("ne", fold_norm2("evec"))
    )
    tr = emb.filter(F.col("vec_id") >= EVAL_VECS).withColumn("nt", fold_norm2("v"))
    pairs = tr.crossJoin(F.broadcast(ev)).select(
        "vec_id",
        F.round(cosine(fold_dot("v", "evec"), F.col("nt"), F.col("ne")), 6).alias(
            "cos"
        ),
    )
    return (
        pairs.groupBy("vec_id")
        .agg(
            F.max("cos").alias("max_cos"),
            F.sum(
                F.when(F.col("cos") >= SEM_CONTAM_THRESHOLD, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_eval_hits"),
        )
        .filter(F.col("max_cos") >= SEM_CONTAM_THRESHOLD)
        .orderBy("vec_id")
    )


# --- train/test split leakage audit -----------------------------------

SPLIT_BUCKETS = 10
SPLIT_TRAIN = 8  # buckets [0, SPLIT_TRAIN) train, rest test: 80/20


def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate leakage ACROSS a train/test split: hash-split
    the corpus 80/20 on a portable content-independent key hash,
    then flag every TEST document with a minhash-LSH near-duplicate
    (jaccard >= the dedup family's threshold) on the TRAIN side —
    the audit every eval split needs before its numbers mean
    anything (a test doc whose near-copy was trained on measures
    memorization, not generalization).

    Composition, not re-derivation: the pair set IS
    q_dedup_minhash_lsh's output (banded candidates, exact-jaccard
    verification, df-capped buckets), so the audit inherits that
    query's oracle-checked semantics and its 100 TB design — the
    only additions are two broadcast-sized split joins and a
    test-grain rollup.

    100 TB design: the split frame is (doc_id, bucket) — key-hash
    arithmetic, no text — and joins the pair list on its natural
    keys; pairs are the near-dup output (tiny relative to the
    corpus), so this stage costs O(|near-dup pairs|) regardless of
    corpus size.
    """
    from projet_etl_spark.functions.text import portable_hash60
    from projet_etl_spark.operators.dedup import (
        JACCARD_THRESHOLD as _J,
        scored_pairs,
    )

    # the >= threshold slice of the staged scored-pair table IS
    # q_dedup_minhash_lsh's output (same shingles, candidates and
    # verification — one extra filter); reading the staged bytes
    # keeps the audit's cost at O(|pairs|) even cold (round-9)
    pairs = scored_pairs(spark, sf_dir).filter(F.col("jaccard") >= F.lit(_J))
    split = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (
            portable_hash60(F.col("doc_id").cast("string"))
            % F.lit(SPLIT_BUCKETS)
            < F.lit(SPLIT_TRAIN)
        ).alias("is_train"),
    )
    sa = split.select(
        F.col("doc_id").alias("doc_a"), F.col("is_train").alias("train_a")
    )
    sb = split.select(
        F.col("doc_id").alias("doc_b"), F.col("is_train").alias("train_b")
    )
    crossing = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("train_a") != F.col("train_b"))
    )
    test_doc = F.when(F.col("train_a"), F.col("doc_b")).otherwise(F.col("doc_a"))
    return (
        crossing.select(test_doc.alias("test_doc_id"), "jaccard")
        .groupBy("test_doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train_dups"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        )
        .orderBy("test_doc_id")
    )


# --- leakage-free split assignment (the fix the audit motivates) -------

CLUSTER_SPLIT_BUCKETS = 10
CLUSTER_SPLIT_TRAIN = 8  # buckets [0,8) train, 8 val, 9 test: 80/10/10


def q_split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test assignment: hash the near-dup
    CLUSTER label, not the document — every near-duplicate class
    lands in one split whole, so the leakage q_split_leakage_audit
    measures for doc-level hash splits is zero BY CONSTRUCTION
    (pinned by tests: no minhash pair ever crosses splits).

    This is the standard eval-hygiene discipline for LLM training
    corpora: doc-level random splits put near-copies of eval docs in
    train, and the audit can only report the damage after the fact;
    assigning by dedup-cluster removes the channel.

    Composition: cluster labels ARE q_dedup_clusters' output
    (pointer-doubling connected components over the oracle-checked
    minhash pair graph), so this query inherits that subtree's
    semantics and scale design; the only additions are one portable
    key hash and a CASE — map-only at corpus grain, no new shuffle.

    100 TB: split assignment is a pure function of the cluster label
    (no coordination, no split-size state), deterministic across
    reruns and engines — the property that lets train/val/test be
    recomputed from the corpus at any time instead of stored.
    """
    from projet_etl_spark.operators.clusters import cluster_labels

    labels = cluster_labels(spark, sf_dir)
    b = portable_hash60(F.col("cluster_id").cast("string")) % F.lit(
        CLUSTER_SPLIT_BUCKETS
    )
    split = (
        F.when(b < F.lit(CLUSTER_SPLIT_TRAIN), F.lit("train"))
        .when(b == F.lit(CLUSTER_SPLIT_TRAIN), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return labels.select(
        "doc_id", "cluster_id", split.alias("split")
    ).orderBy("doc_id")
