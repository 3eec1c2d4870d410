"""Round-13 optimization pins.

The r13 optimization round restructured several query internals with
the contract that RESULTS are bit-identical. These tests pin the
equivalences that the restructures rely on, on the real fixture data:

1. the Arrow block-audit kernel (_block_pair_cos_arrow) emits exactly
   the crossJoin + interpreted-fold pair set it replaced, cosine
   doubles included (dedup-embedding-cosine and the recall audits'
   exact side);
2. the vocabulary-grain CMS cell build equals the occurrence-grain
   build it replaced (token-freq-cms);
3. the bitmap-expression bloom probe flags exactly the
   explode + join + count set it replaced (decontaminate-bloom).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_block_pair_cos_arrow_equals_fold(spark):
    from projet_etl_spark.functions.vectors import cosine, fold_dot, fold_norm2
    from projet_etl_spark.operators.dedup import (
        AUDIT_BLOCK,
        COSINE_THRESHOLD,
        _block_pair_cos_arrow,
    )
    from projet_etl_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    block = emb.orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    ).limit(AUDIT_BLOCK)
    withn = block.withColumn("n2", fold_norm2("v"))

    a = withn.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("n2").alias("na"),
    )
    b = withn.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("n2").alias("nb"),
    )
    cos = cosine(fold_dot("va", "vb"), F.col("na"), F.col("nb"))
    fold_rows = sorted(
        (
            a.crossJoin(F.broadcast(b))
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b", F.round(cos, 6).alias("cos"))
            .filter(F.col("cos") >= COSINE_THRESHOLD)
        ).collect()
    )
    kernel_rows = sorted(
        _block_pair_cos_arrow(withn, COSINE_THRESHOLD).collect()
    )
    assert len(fold_rows) > 0  # fixture must exercise the path
    # bit-identical: same pairs, same rounded cosine DOUBLES
    assert [tuple(r) for r in kernel_rows] == [tuple(r) for r in fold_rows]


def test_cms_cells_vocab_grain_equals_occurrence_grain(spark):
    from projet_etl_spark.functions.text import tokens
    from projet_etl_spark.operators.sketches import _row_ids, cms_bucket
    from projet_etl_spark.sources.tables import load_table

    toks = load_table(spark, SF_SMALL, "documents").select(
        F.explode(tokens(F.col("text"))).alias("tok")
    )
    occ_cells = sorted(
        (
            toks.select("tok", F.explode(_row_ids()).alias("r"))
            .select("r", cms_bucket(F.col("r"), F.col("tok")).alias("bucket"))
            .groupBy("r", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        ).collect()
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    vocab_cells = sorted(
        (
            exact.select("tok", "exact_n", F.explode(_row_ids()).alias("r"))
            .select(
                "r",
                cms_bucket(F.col("r"), F.col("tok")).alias("bucket"),
                "exact_n",
            )
            .groupBy("r", "bucket")
            .agg(F.sum("exact_n").cast("long").alias("c"))
        ).collect()
    )
    assert len(occ_cells) > 0
    assert [tuple(r) for r in vocab_cells] == [tuple(r) for r in occ_cells]


def test_bloom_bitmap_probe_equals_join_count_probe(spark):
    from projet_etl_spark.operators.decontam import (
        BLOOM_HASHES,
        EVAL_DOCS,
        _bloom_bit_col,
        _shingle_sets,
    )

    sh = _shingle_sets(spark, SF_SMALL)
    ev = sh.filter(F.col("doc_id") < EVAL_DOCS).select("s").distinct()
    hash_ids = F.array(*[F.lit(i) for i in range(BLOOM_HASHES)])
    bits = (
        ev.select(F.explode(hash_ids).alias("i"), "s")
        .select(_bloom_bit_col(F.col("i"), F.col("s")).alias("bit"))
        .distinct()
    )
    train = sh.filter(F.col("doc_id") >= EVAL_DOCS)
    # the pre-r13 probe: explode x BLOOM_HASHES, join the set-bit
    # table, count matches per gram
    probes = train.select("doc_id", "s", F.explode(hash_ids).alias("i")).select(
        "doc_id", "s", _bloom_bit_col(F.col("i"), F.col("s")).alias("bit")
    )
    join_pos = sorted(
        (
            probes.join(F.broadcast(bits), "bit")
            .groupBy("doc_id", "s")
            .agg(F.count(F.lit(1)).alias("n_bits"))
            .filter(F.col("n_bits") == BLOOM_HASHES)
            .select("doc_id", "s")
        ).collect()
    )
    # the r13 probe, reproduced via the registry query's own internals
    # by re-running just the flagging slice of q_decontaminate_bloom:
    from projet_etl_spark.operators import decontam

    full = decontam.q_decontaminate_bloom(spark, SF_SMALL)
    # n_bloom_hits per doc must equal the join-probe's per-doc counts
    per_doc_join = {}
    for r in join_pos:
        per_doc_join[r["doc_id"]] = per_doc_join.get(r["doc_id"], 0) + 1
    got = {
        r["doc_id"]: r["n_bloom_hits"]
        for r in full.collect()
        if r["n_bloom_hits"] > 0
    }
    assert got == per_doc_join
    assert len(got) > 0
