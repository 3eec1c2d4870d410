"""Sketch-family invariants: the guarantees that make a sketch usable
operationally, beyond the oracle equality test_parity already runs —
count-min never undercounts, and the bloom decontamination path has
no false negatives against the exact gram join."""

from __future__ import annotations

from projet_etl_spark.operators.decontam import (
    q_decontaminate_bloom,
    q_decontaminate_ngram,
)
from projet_etl_spark.operators.sketches import q_token_freq_cms
from tests.conftest import SF_SMALL


def test_cms_never_undercounts(spark):
    rows = q_token_freq_cms(spark, SF_SMALL).collect()
    assert rows, "top-k probe must return tokens"
    for r in rows:
        assert r.cms_n >= r.exact_n, (r.tok, r.exact_n, r.cms_n)
        assert r.overcount == r.cms_n - r.exact_n


def test_bloom_has_no_false_negatives(spark):
    exact = {
        r.doc_id: r.n_overlap
        for r in q_decontaminate_ngram(spark, SF_SMALL).collect()
    }
    bloom = {
        r.doc_id: (r.n_bloom_hits, r.n_exact_hits)
        for r in q_decontaminate_bloom(spark, SF_SMALL).collect()
    }
    assert exact, "fixture must contain contaminated docs"
    for doc_id, n in exact.items():
        assert doc_id in bloom, f"doc {doc_id} lost by the bloom probe"
        n_bloom, n_ex = bloom[doc_id]
        assert n_ex == n
        assert n_bloom >= n
