"""Registrable-domain extraction for host/domain-grain curation
rollups (the FineWeb-style per-domain duplicate-mass and mixing-
budget tables group by REGISTRABLE domain, not raw host or URL —
``news.example.com`` and ``blog.example.com`` are one publisher).

Public-suffix-LITE: the full Public Suffix List is thousands of
entries and changes monthly; the curation rollups here need the
grouping to be deterministic and cross-engine reproducible more than
they need exhaustive ccTLD coverage, so the second-level-suffix table
is a small pinned constant (the high-traffic two-level suffixes) and
everything else registers at the last two labels. Swapping in the
full PSL is a data change (grow the tuple), not a code change.

Cross-engine discipline (the functions/text.py pattern): every
expression exists twice — a Spark Column builder and a DuckDB SQL
fragment built from the SAME regex strings, kept adjacent so they
cannot drift, with a parity pytest driving URL literals through both
engines (tests/test_round10_ops.py). Inputs that are bare tokens
rather than URLs/hosts (no dot) pass through unchanged, so the
synthetic ``documents.source`` fixture groups at source grain while
the extraction stays URL-real.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# high-traffic second-level public suffixes: hosts ending in one of
# these register at THREE labels (example.co.uk), not two (co.uk)
TWO_LEVEL_SUFFIXES: tuple[str, ...] = (
    "ac.uk",
    "co.uk",
    "gov.uk",
    "org.uk",
    "co.jp",
    "ne.jp",
    "or.jp",
    "com.au",
    "net.au",
    "org.au",
    "co.nz",
    "com.br",
    "com.cn",
    "com.mx",
    "co.in",
    "co.kr",
    "com.tr",
    "com.ar",
    "com.sg",
    "co.za",
)

# scheme:// and userinfo@ stripped, host = everything before the
# first of / : ? # — one capture group, identical bytes in both
# engines (Java regex and RE2 agree on this subset)
_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)"
_TWO_LEVEL_ALT = "|".join(s.replace(".", r"\.") for s in TWO_LEVEL_SUFFIXES)
# last three labels when the final two are a pinned two-level suffix
_DOM3_RE = rf"([^.]+\.(?:{_TWO_LEVEL_ALT}))$"
# otherwise the last two labels
_DOM2_RE = r"([^.]+\.[^.]+)$"


def host_of(url: Column) -> Column:
    """Lowercased host of a URL or bare host string."""
    h = F.regexp_extract(F.lower(url), _HOST_RE, 1)
    return F.regexp_replace(h, r"^www\.", "")


def registrable_domain(url: Column) -> Column:
    """Registrable domain of a URL/host (public-suffix-lite): the
    last two host labels, or three when the final two are a pinned
    second-level suffix; dot-less inputs pass through unchanged.
    Both regexp_extract calls return '' on no-match in Spark AND
    DuckDB, so the CASE cascade is portable verbatim."""
    h = host_of(url)
    d3 = F.regexp_extract(h, _DOM3_RE, 1)
    d2 = F.regexp_extract(h, _DOM2_RE, 1)
    return F.when(d3 != "", d3).when(d2 != "", d2).otherwise(h)


def doc_url(source: Column, doc_id: Column) -> Column:
    """Deterministic per-document URL derived from (source, doc_id).

    Fixture device: the synthetic ``documents`` table has no url
    column, so the domain-grain rollups derive one — subdomain and
    TLD cycle on doc_id so the extraction's www-strip, subdomain-drop
    and two-level-suffix paths all fire on real data, and every
    source fans out over four registrable domains. At deployment the
    rollups group by ``registrable_domain(documents.url)`` directly;
    this helper (and its SQL twin below, byte-identical output) is
    the only fixture-specific piece.
    """
    sub = (
        F.when(doc_id % 3 == 0, F.lit("www."))
        .when(doc_id % 3 == 1, F.lit("cdn."))
        .otherwise(F.lit(""))
    )
    # suffix cycles mod 7 (coprime with the fixture's source fan-out
    # of 20, so every source spreads over all four TLDs; mod 4 would
    # pin each source to one TLD because source = f(doc_id % 20))
    sfx = (
        F.when(doc_id % 7 == 0, F.lit(".com"))
        .when(doc_id % 7 == 1, F.lit(".co.uk"))
        .when(doc_id % 7 == 2, F.lit(".org"))
        .otherwise(F.lit(".net"))
    )
    return F.concat(
        F.lit("https://"), sub, source, sfx, F.lit("/d/"), doc_id.cast("string")
    )


def sql_doc_url(src: str, did: str) -> str:
    """DuckDB mirror of ``doc_url`` (same arms, same order)."""
    return (
        f"'https://' || "
        f"CASE {did} % 3 WHEN 0 THEN 'www.' WHEN 1 THEN 'cdn.' ELSE '' END "
        f"|| {src} || "
        f"CASE {did} % 7 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk' "
        f"WHEN 2 THEN '.org' ELSE '.net' END "
        f"|| '/d/' || CAST({did} AS VARCHAR)"
    )


def sql_host_of(col: str) -> str:
    """DuckDB mirror of ``host_of`` (same regex strings)."""
    return (
        f"regexp_replace(regexp_extract(lower({col}), '{_HOST_RE}', 1), "
        f"'^www\\.', '')"
    )


def sql_registrable_domain(col: str) -> str:
    """DuckDB mirror of ``registrable_domain`` — an inline CASE so it
    composes anywhere a column expression does (oracle CTEs); the
    host expression repeats, which the optimizer CSEs."""
    h = sql_host_of(col)
    return (
        f"CASE WHEN regexp_extract({h}, '{_DOM3_RE}', 1) <> '' "
        f"THEN regexp_extract({h}, '{_DOM3_RE}', 1) "
        f"WHEN regexp_extract({h}, '{_DOM2_RE}', 1) <> '' "
        f"THEN regexp_extract({h}, '{_DOM2_RE}', 1) "
        f"ELSE {h} END"
    )
