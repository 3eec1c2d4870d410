"""Pinned default query parameters.

The reference parameterizes queries from the HTTP query string
(reference views.py:102-110) and hardcodes a 2022-01-01 epoch and
DATE('now') upper bound (views.py:85,128,131,307). The driver
testdata spans 1995-01..2001-11, and correctness runs must be
reproducible, so the engine threads explicit ``epoch``/``as_of``
parameters (SURVEY.md §2.10.10) with the pinned defaults below.

Column mapping onto the driver star schema (FIXTURES.md §2):
  dateid=l_shipdate, prodid=l_partkey, catid=p_brand,
  fabid=l_suppkey, magid=o_custkey.
"""

from __future__ import annotations

DEFAULTS: dict[str, object] = {
    # category analogue: a p_brand value present at every sf
    "cat_id": "Brand#4",
    # manufacturer analogue: an l_suppkey (1..100 in testdata)
    "fab_id": 42,
    # date-range parameters {debut}/{fin} (reference views.py:22,39,56)
    "debut": "1996-01-01",
    "fin": "1997-12-31",
    # {annee} for nb-mag-cat-date (reference views.py:68)
    "annee": 1996,
    # epoch replaces the hardcoded '2022-01-01' (reference views.py:85,131,307)
    "epoch": "1995-01-01",
    # as_of replaces DATE('now') / date.today() (reference views.py:85,128)
    "as_of": "2001-12-31",
    # top-k size (reference LIMIT 10, views.py:42,59)
    "topk": 10,
}
