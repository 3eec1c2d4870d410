"""Weighted-score column expressions.

The reference computes a per-store "score" as a weighted sum of
distinct-counts and row count, with two weight profiles:

  4-term (reference views.py:34-37):
      cd(fabid)*0.1 + cd(catid)*0.2 + cd(prodid)*0.3 + COUNT(*)*0.4
  3-term (reference views.py:51-53 and 175-177):
      cd(fabid)*0.1 + cd(prodid)*0.3 + COUNT(*)*0.6
  3-term, top-1 ordering (reference views.py:175-177):
      cd(prodid)*0.3 + COUNT(*)*0.6 + cd(fabid)*0.1

The term *order* is preserved per call site so the double arithmetic
associates identically to the DuckDB oracle (bit-exact floats).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def score4(fab: Column, cat: Column, prod: Column, ventes: Column) -> Column:
    return fab * F.lit(0.1) + cat * F.lit(0.2) + prod * F.lit(0.3) + ventes * F.lit(0.4)


def score3(fab: Column, prod: Column, ventes: Column) -> Column:
    return fab * F.lit(0.1) + prod * F.lit(0.3) + ventes * F.lit(0.6)


def score3_top1(prod: Column, ventes: Column, fab: Column) -> Column:
    # term order matches reference views.py:175-177 exactly
    return prod * F.lit(0.3) + ventes * F.lit(0.6) + fab * F.lit(0.1)
