"""Host/domain-grain curation rollups (round-10, verdict item 7).

The FineWeb-style curation loop prices duplication and assigns
mixing budgets at REGISTRABLE-DOMAIN grain, not raw source/host/URL
grain — a publisher's subdomains are one supply of text, and a
per-domain cap is the standard guard against any single site
dominating the training mix. These four queries are that loop's
report tables, composed from pieces that already carry green rows:

- the staged near-dup cluster labels (operators/clusters.py) price
  duplicate mass and pick canonical docs,
- functions/web.py extracts the registrable domain with a Spark
  Column builder and a DuckDB mirror built from the SAME regex
  strings (URL-literal parity pytest in tests/test_round10_ops.py),
- all counters are exact BIGINT sums; ratios are integer ppm
  (floor division on both engines) or ROUND(..., 6) doubles.

Scale shape (the 100 TB argument): every query is one map over the
documents scan (URL → domain is regexp work inside whole-stage
codegen), at most two high-entropy equi-joins against REDUCED
projections (labels are two longs per doc; the canonical side is the
same 3-column frame), and a |domains|-group hash aggregate with
map-side combine — |registrable domains| is millions at web scale,
comfortably shuffle-able. The budget query broadcasts ONE 1-row
grand total (allowlisted with the default 1-row executed-plan bound
in tests/test_plan_invariants.py). Nothing here introduces a new
join topology: it is the q_dedup_source_attribution /
q_dedup_mass_by_lang scale class re-grained to domains.

Reference parity note: the reference app (views.py) aggregates at
magasin/fabricant grain only; domain-grain curation is part of the
beyond-reference LLM-pipeline surface SURVEY.md §6 calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_etl_spark.functions import web
from projet_etl_spark.operators.clusters import cluster_labels
from projet_etl_spark.sources.tables import load_table

# mixing cap: no single registrable domain may supply more than
# CAP_PPM parts-per-million of the deduplicated character mass; the
# sampling rate that enforces it is itself reported in ppm. 20000
# (2%) binds for the heavy domains at every fixture SF (the fixture
# has ~80 domains, so the mean share is ~12500 ppm) while leaving
# the light tail uncapped — both CASE branches stay exercised.
CAP_PPM = 20_000

# inter-snapshot audit: documents are assigned round-robin (doc_id
# mod SNAPSHOTS) to an ordered sequence of ingestion snapshots. At
# deployment the snapshot id is a real crawl/ingest column; the
# round-robin device is fixture-only and — unlike a content-hash
# split — keeps copies of the same text in DIFFERENT snapshots, so
# cross-snapshot duplication actually occurs.
SNAPSHOTS = 4


def docs_with_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents projected to (doc_id, lang, n_chars, host, domain).

    One narrow map over the scan: URL derivation (fixture device,
    web.doc_url) then host/registrable-domain extraction — all
    regexp/concat expressions that stay inside whole-stage codegen.
    """
    url = web.doc_url(F.col("source"), F.col("doc_id"))
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        web.host_of(url).alias("host"),
        web.registrable_domain(url).alias("domain"),
    )


def q_docs_domain_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus profile: doc/host/language counts and
    character mass — the first table a domain-grain curation report
    shows (which publishers supply the corpus, how concentrated the
    supply is, whether a domain spans languages).

    Scale shape: map (domain extraction) + one |domains|-group
    aggregate; the two COUNT(DISTINCT)s expand to the standard
    two-level aggregate at (domain, host/lang) grain — both
    high-entropy keys, never a global gather.
    """
    return (
        docs_with_domain(spark, sf_dir)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("host").cast("long").alias("n_hosts"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(
                F.sum("n_chars").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_chars"),
        )
        .orderBy("domain")
    )


def q_dedup_domain_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate mass per registrable domain, split within- vs
    cross-domain — q_dedup_source_attribution re-grained to the
    publisher level: a domain whose duplicates are mostly
    CROSS-domain is mirroring someone else's text, so capping or
    dropping it costs little unique supply; ``dup_chars`` prices the
    redundant bytes it contributes to the mix.

    Composition: staged near-dup labels (oracle-checked
    q_dedup_clusters output) + one doc_id equi-join for the member's
    domain/chars + one cluster_id equi-join for the canonical doc's
    domain (labels ARE doc_ids), then a |domains|-group aggregate of
    exact indicator/char sums.
    """
    labels = cluster_labels(spark, sf_dir)
    docs = docs_with_domain(spark, sf_dir).select("doc_id", "domain", "n_chars")
    canon = docs.select(
        F.col("doc_id").alias("cluster_id"),
        F.col("domain").alias("canon_domain"),
    )
    dup = (F.col("doc_id") != F.col("cluster_id")).cast("long")
    xdup = (
        (F.col("doc_id") != F.col("cluster_id"))
        & (F.col("domain") != F.col("canon_domain"))
    ).cast("long")
    return (
        labels.join(docs, "doc_id")
        .join(canon, "cluster_id")
        .select(
            "domain",
            dup.alias("dup"),
            xdup.alias("xdup"),
            (dup * F.col("n_chars")).alias("dup_chars"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dup").cast("long").alias("n_dups"),
            F.sum("xdup").cast("long").alias("n_cross_dups"),
            F.sum("dup_chars").cast("long").alias("dup_chars"),
        )
        .select(
            "domain",
            "n_docs",
            "n_dups",
            "n_cross_dups",
            "dup_chars",
            F.round(
                F.col("n_dups").cast("double")
                * 100.0
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_pct"),
        )
        .orderBy("domain")
    )


def q_corpus_domain_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain mixing-budget table: each domain's DEDUPLICATED
    character supply, its ppm share of the corpus, and the sampling
    rate that caps any domain at CAP_PPM of the mix — the table a
    training-data pipeline joins against at export time to decide,
    per document, the probability it is kept.

    Arithmetic contract: shares and rates are integer ppm via exact
    floor division — identical on both engines, no float
    accumulation order to disagree on. The ``uniq_chars * 1_000_000``
    intermediates are 128-bit wide (Spark DECIMAL(38,0) through the
    exact IntegralDivide, DuckDB HUGEINT through ``//``) so the
    arithmetic stays exact up to ~9.2e18 chars per domain — the
    BIGINT column bound itself — instead of silently wrapping past
    9.2e12 on the Spark side while the oracle raised (advisor r10:
    the asymmetric-failure guard). The quotients (share_ppm ≤ 1e6,
    budget_chars ≤ uniq_chars) fit BIGINT structurally, so the final
    narrowing cast can never itself wrap.

    Scale shape: canonical filter on the staged labels (doc_id ==
    cluster_id), one doc_id equi-join, |domains|-group aggregate,
    then ONE 1-row grand-total broadcast (allowlisted, bound 1 row)
    to turn absolute mass into shares.
    """
    labels = cluster_labels(spark, sf_dir)
    docs = docs_with_domain(spark, sf_dir).select("doc_id", "domain", "n_chars")
    per = (
        labels.filter(F.col("doc_id") == F.col("cluster_id"))
        .join(docs, "doc_id")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_uniq"),
            F.sum("n_chars").cast("long").alias("uniq_chars"),
        )
    )
    tot = per.agg(F.sum("uniq_chars").cast("long").alias("t"))
    shared = per.crossJoin(F.broadcast(tot)).withColumn(
        "share_ppm",
        F.expr("CAST(uniq_chars AS DECIMAL(38,0)) * 1000000 div t").cast(
            "long"
        ),
    )
    rate = (
        F.when(
            F.col("share_ppm") > CAP_PPM,
            F.expr(f"{CAP_PPM}L * 1000000L div share_ppm"),
        )
        .otherwise(F.lit(1_000_000))
        .cast("long")
    )
    return (
        shared.withColumn("sample_rate_ppm", rate)
        .select(
            "domain",
            "n_uniq",
            "uniq_chars",
            "share_ppm",
            "sample_rate_ppm",
            F.expr(
                "CAST(uniq_chars AS DECIMAL(38,0)) * sample_rate_ppm"
                " div 1000000"
            )
            .cast("long")
            .alias("budget_chars"),
        )
        .orderBy("domain")
    )


def q_quality_by_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality filter rate: how much of each publisher's
    supply survives the published web-corpus rule battery — the
    spam-domain detector a curation run reads next to the mixing
    budget (a domain with a high duplicate rate AND a low rules-pass
    rate is the first candidate to drop entirely; ``kept_chars``
    prices what a domain actually contributes post-filter).

    Reports the full per-rule FAIL decomposition at domain grain
    (not just the conjunctive gate): on a strict battery most
    corpora fail mostly ONE rule, and which rule it is differs by
    publisher — that per-rule signature is what distinguishes "spam
    domain" (symbols/alpha) from "short-form content" (word count),
    and it stays informative even where the all-rules gate passes
    almost nothing (this fixture included).

    One FUSED scan (the qualrules discipline): domain extraction,
    the five rule counters, the per-rule flags and the pass gate are
    all computed in a single projection over documents — no
    self-join, no second scan — then one |domains|-group aggregate
    of exact indicator/char sums. Rule definitions come from
    qualrules.rule_fail_exprs(), the same single source the corpus
    sweep and the rules_pass gate fold from, so this rollup can
    never disagree with the other rules consumers (the oracle
    reuses the shared rules-CTE constants the same way).
    """
    from projet_etl_spark.functions.text import tokens
    from projet_etl_spark.operators.qualrules import (
        _counter_cols,
        rule_fail_exprs,
        rules_pass_col,
    )

    url = web.doc_url(F.col("source"), F.col("doc_id"))
    base = load_table(spark, sf_dir, "documents").select(
        web.registrable_domain(url).alias("domain"),
        "n_chars",
        tokens(F.col("text")).alias("t"),
        "text",
    )
    per = base.select("domain", "n_chars", *_counter_cols())
    flags = per.select(
        "domain",
        "n_chars",
        rules_pass_col().alias("p"),
        *[e.cast("long").alias(n) for n, e in rule_fail_exprs()],
    )
    fail_names = [n for n, _ in rule_fail_exprs()]
    return (
        flags.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            *[F.sum(n).cast("long").alias(n) for n in fail_names],
            F.sum(F.col("p").cast("long")).cast("long").alias("n_pass"),
            F.sum(
                F.when(F.col("p"), F.col("n_chars")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("kept_chars"),
        )
        .select(
            "domain",
            "n_docs",
            *fail_names,
            "n_pass",
            "kept_chars",
            F.round(
                F.col("n_pass").cast("double")
                * 100.0
                / F.col("n_docs").cast("double"),
                6,
            ).alias("pass_pct"),
        )
        .orderBy("domain")
    )


def q_dedup_incremental_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-snapshot incremental dedup-rate audit: for each
    ingestion snapshot in order, how many of its documents were
    already covered by EARLIER snapshots (the hit rate the
    incremental near-dedup store — streaming/neardedup.py's contract
    — would have served), how many duplicate within their own
    snapshot, and how many new distinct contents the snapshot
    contributes. A rising ``hist`` rate across snapshots is the
    expected signature of a healthy incremental pipeline (the store
    absorbs more of each new crawl); a FLAT one means the crawls
    barely overlap and incremental dedup is not paying for itself.

    Content identity is the NEAR-dup equivalence class (the staged,
    oracle-checked cluster labels), not the exact fingerprint — the
    incremental question a crawl pipeline actually asks is "have we
    seen this text, modulo boilerplate edits", and exact-fp identity
    is its degenerate all-singletons case on a clean fixture.

    Scale shape: everything aggregates at cluster grain before
    anything else — one hash aggregate to (cluster_id, snap) counts,
    one to per-cluster first-snapshot, one high-entropy equi-join
    between the two reduced frames, then a |SNAPSHOTS|-row final
    aggregate. No windows, no per-row history scan: the audit is
    O(distinct clusters), a table the label store already
    materializes.
    """
    labels = cluster_labels(spark, sf_dir).select(
        "cluster_id",
        (F.col("doc_id") % SNAPSHOTS).cast("long").alias("snap"),
    )
    g = labels.groupBy("cluster_id", "snap").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    f = g.groupBy("cluster_id").agg(F.min("snap").alias("first_snap"))
    j = g.join(f, "cluster_id")
    hist = F.when(F.col("snap") > F.col("first_snap"), F.col("n")).otherwise(
        F.lit(0)
    )
    batch = F.when(
        F.col("snap") == F.col("first_snap"), F.col("n") - F.lit(1)
    ).otherwise(F.lit(0))
    new_c = F.when(F.col("snap") == F.col("first_snap"), F.lit(1)).otherwise(
        F.lit(0)
    )
    return (
        j.groupBy("snap")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.sum(hist).cast("long").alias("n_hist_dups"),
            F.sum(batch).cast("long").alias("n_batch_dups"),
            F.sum(new_c).cast("long").alias("n_new_contents"),
        )
        .select(
            "snap",
            "n_docs",
            "n_hist_dups",
            "n_batch_dups",
            "n_new_contents",
            F.round(
                (F.col("n_hist_dups") + F.col("n_batch_dups")).cast("double")
                * 100.0
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_pct"),
        )
        .orderBy("snap")
    )


# ---------------------------------------------------------------
# URL grain (r11) — the crawl-pipeline step upstream of content
# dedup: canonicalize fetch URLs, then dedup at exact-URL grain
# with the same within-/cross-snapshot attribution the content
# audit above reports. No reference counterpart (reference is the
# retail OLAP app, views.py); the canonicalization rules are the
# public crawl-pipeline set (scheme/port/tracking-param/fragment/
# slash normalization).
# ---------------------------------------------------------------


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document URL normalization table: the noisy fetch URL
    (fixture device, web.noisy_doc_url — at deployment the real
    stored URL), its canonical form, and the registrable domain OF
    the canonical form, tying the URL grain into the domain-grain
    rollups above.

    Scale shape: one narrow map over the scan — regex extraction
    and literal concat only, whole-stage codegen, no shuffle but the
    output sort.
    """
    url = web.noisy_doc_url(F.col("source"), F.col("doc_id"))
    canon = web.canonical_url(url)
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            url.alias("url"),
            canon.alias("canonical_url"),
            web.registrable_domain(canon).alias("domain"),
        )
        .orderBy("doc_id")
    )


def q_dedup_exact_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-URL dedup audit per crawl snapshot: of each snapshot's
    fetches, how many hit a canonical URL already fetched in an
    EARLIER snapshot (refetch the crawler should have skipped), how
    many duplicate within their own snapshot (frontier dedup gap),
    and how many new URLs the snapshot contributes — the URL-grain
    twin of q_dedup_incremental_rate, which answers the same question
    one step LATER at content grain (a URL dup is caught before the
    fetch; a content dup only after).

    Scale shape (the content twin's exactly): aggregate to
    (canonical_url, snap) counts first, reduce to per-URL first
    snapshot, one high-entropy equi-join between the two reduced
    frames, then a |SNAPSHOTS|-row aggregate. No windows, no
    all-pairs — cost is O(distinct URLs).
    """
    fetches = load_table(spark, sf_dir, "documents").select(
        web.canonical_url(web.crawl_url(F.col("doc_id"))).alias("url"),
        (F.col("doc_id") % SNAPSHOTS).cast("long").alias("snap"),
    )
    g = fetches.groupBy("url", "snap").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    f = g.groupBy("url").agg(F.min("snap").alias("first_snap"))
    j = g.join(f, "url")
    hist = F.when(F.col("snap") > F.col("first_snap"), F.col("n")).otherwise(
        F.lit(0)
    )
    batch = F.when(
        F.col("snap") == F.col("first_snap"), F.col("n") - F.lit(1)
    ).otherwise(F.lit(0))
    new_u = F.when(F.col("snap") == F.col("first_snap"), F.lit(1)).otherwise(
        F.lit(0)
    )
    return (
        j.groupBy("snap")
        .agg(
            F.sum("n").cast("long").alias("n_fetches"),
            F.sum(hist).cast("long").alias("n_hist_dups"),
            F.sum(batch).cast("long").alias("n_batch_dups"),
            F.sum(new_u).cast("long").alias("n_new_urls"),
        )
        .select(
            "snap",
            "n_fetches",
            "n_hist_dups",
            "n_batch_dups",
            "n_new_urls",
            F.round(
                (F.col("n_hist_dups") + F.col("n_batch_dups")).cast("double")
                * 100.0
                / F.col("n_fetches").cast("double"),
                6,
            ).alias("dup_pct"),
        )
        .orderBy("snap")
    )


def q_url_canonical_fetches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-first-fetch export at URL grain: one row per
    canonical URL with its kept fetch (the earliest doc_id), fetch
    count and snapshot spread — the URL-grain twin of
    ``dedup-canonical`` (content grain), and the table a crawler's
    frontier actually consults before refetching.

    Scale shape: one |distinct URLs|-group hash aggregate over the
    canonicalized fetch log; no joins, no windows.
    """
    fetches = load_table(spark, sf_dir, "documents").select(
        web.canonical_url(web.crawl_url(F.col("doc_id"))).alias("url"),
        "doc_id",
        (F.col("doc_id") % SNAPSHOTS).cast("long").alias("snap"),
    )
    return (
        fetches.groupBy("url")
        .agg(
            F.min("doc_id").cast("long").alias("first_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_fetches"),
            F.countDistinct("snap").cast("long").alias("n_snapshots"),
        )
        .orderBy("url")
    )
