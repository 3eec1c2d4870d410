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
# these register at THREE labels (example.co.uk), not two (co.uk).
# r12 (r11 verdict item 6): grown 20 -> 265 toward the high-traffic
# subset of the public PSL — the registrar-class second levels of the
# most-crawled ccTLDs (the com/net/org/gov/edu families plus the
# local-convention registrar labels: co.*, ne.*, or.*, go.*, ac.*,
# gob.*/gub.* in es-speaking ccTLDs, gouv/asso under .fr). Still
# public-suffix-LITE by design (see module docstring): deterministic,
# pinned, cross-engine — growing further stays a data change. The
# cross-engine grid test drives EVERY entry through both engines
# (tests/test_round12_ops.py), so a grown tuple re-certifies itself.
TWO_LEVEL_SUFFIXES: tuple[str, ...] = (
    # .uk / .jp / .au / .nz
    "ac.uk", "co.uk", "gov.uk", "org.uk", "net.uk", "sch.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "gen.nz",
    # east/south/southeast Asia
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "co.in", "net.in", "org.in", "ac.in", "edu.in", "gov.in", "res.in",
    "co.id", "or.id", "go.id", "ac.id", "web.id", "sch.id",
    "co.th", "in.th", "or.th", "go.th", "ac.th",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg",
    "com.ph", "net.ph", "org.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn",
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk",
    "com.bd", "net.bd", "org.bd", "gov.bd", "edu.bd", "ac.bd",
    "com.lk", "org.lk", "gov.lk", "edu.lk",
    "com.np", "org.np", "gov.np", "edu.np",
    # middle east / africa
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "bel.tr", "k12.tr",
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa",
    "co.ae", "net.ae", "org.ae", "gov.ae", "ac.ae",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg",
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng",
    "co.ke", "ne.ke", "or.ke", "go.ke", "ac.ke",
    # americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar", "mil.ar",
    "com.co", "net.co", "org.co", "gov.co", "edu.co",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe",
    "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve",
    "com.ec", "net.ec", "org.ec", "gob.ec", "edu.ec",
    "com.uy", "net.uy", "org.uy", "gub.uy", "edu.uy",
    "com.py", "net.py", "org.py", "gov.py", "edu.py",
    "com.bo", "net.bo", "org.bo", "gob.bo", "edu.bo",
    "com.gt", "net.gt", "org.gt", "gob.gt", "edu.gt",
    "com.do", "net.do", "org.do", "gob.do", "edu.do",
    "co.cr", "ac.cr", "go.cr",
    # europe
    "gouv.fr", "asso.fr", "tm.fr", "nom.fr",
    "co.at", "or.at", "ac.at", "gv.at",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "com.ru", "net.ru", "org.ru",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "gov.it", "edu.it",
    "co.hu", "org.hu",
    "com.ro", "org.ro",
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


# ---------------------------------------------------------------
# URL-grain canonicalization (r11) — the crawl-pipeline step
# UPSTREAM of content dedup: strip fetch noise (scheme case and
# http/https split, default ports, tracking parameters, fragments,
# trailing slashes, host case, www.) so refetches of one page
# collapse to ONE canonical URL before any text is compared.
# Same cross-engine discipline as the domain extraction above:
# one regex-string constant set, a Spark Column builder and a DuckDB
# fragment built from the SAME strings, parity-pinned by literal
# tests (tests/test_round11_ops.py).
# ---------------------------------------------------------------

# tracking parameters a crawl canonicalizer drops (the public
# utm_*/click-id set). r12 (advisor): the r11 pattern had no left
# boundary, so 'ref=' matched MID-TOKEN ('?pref=home' -> '?p',
# '&href=x' -> '&h') and inside path segments. RE2 (DuckDB) has no
# lookbehind, so the left boundary is the consumed separator itself:
# the pattern only ever runs against the QUERY part (split off below,
# so a path segment containing 'ref=' is structurally out of reach),
# and the first surviving parameter's eaten '?' is repaired by
# _QUERY_REPAIR_RE afterwards.
TRACKING_PARAM_RE = r"[?&](?:utm_[a-z]+|gclid|fbclid|ref)=[^&#]*"
# query split: everything before the first '?' / the first '?' and
# after ('' when absent — regexp_extract returns '' on no-match in
# Spark AND DuckDB, and leftmost-match semantics make (\?.*)$ anchor
# at the FIRST '?', identically in Java regex and RE2)
_PATH_PART_RE = r"^([^?]*)"
_QUERY_PART_RE = r"(\?.*)$"
# a query left starting with '&' lost its leading tracking parameter:
# promote the first surviving separator back to '?'
_QUERY_REPAIR_RE = r"^&"

# everything after scheme://userinfo@host:port — the path+query+
# fragment tail, with the default-port group consumed outside the
# capture. Same host charset as _HOST_RE above.
_TAIL_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?[^/:?#]+(?::[0-9]+)?(.*)$"


def canonical_url(url: Column) -> Column:
    """Canonical form of a fetched URL: lowercased www-less host
    (scheme, userinfo and port dropped) + the tail with fragment,
    tracking parameters, dangling ``?``/``&`` and trailing slashes
    stripped. Pinned choices: a tail that keeps NON-tracking
    parameters keeps them in original order (no re-sort), the
    trailing-slash strip applies only at the very end of the
    canonical string, and tracking-parameter removal applies only
    inside the query part (a literal 'ref=' in a path segment is
    path bytes, not a parameter)."""
    tail = F.regexp_extract(url, _TAIL_RE, 1)
    tail = F.regexp_replace(tail, r"#.*$", "")
    path = F.regexp_extract(tail, _PATH_PART_RE, 1)
    query = F.regexp_extract(tail, _QUERY_PART_RE, 1)
    query = F.regexp_replace(query, TRACKING_PARAM_RE, "")
    query = F.regexp_replace(query, _QUERY_REPAIR_RE, "?")
    tail = F.concat(path, query)
    tail = F.regexp_replace(tail, r"[?&]$", "")
    tail = F.regexp_replace(tail, r"/+$", "")
    return F.concat(host_of(url), tail)


def sql_canonical_url(col: str) -> str:
    """DuckDB mirror of ``canonical_url`` (same regex strings; DuckDB
    needs the explicit 'g' flag where Java replaces globally)."""
    tail = f"regexp_extract({col}, '{_TAIL_RE}', 1)"
    tail = f"regexp_replace({tail}, '#.*$', '')"
    path = f"regexp_extract({tail}, '{_PATH_PART_RE}', 1)"
    query = f"regexp_extract({tail}, '{_QUERY_PART_RE}', 1)"
    query = f"regexp_replace({query}, '{TRACKING_PARAM_RE}', '', 'g')"
    query = f"regexp_replace({query}, '{_QUERY_REPAIR_RE}', '?')"
    tail = f"({path} || {query})"
    tail = f"regexp_replace({tail}, '[?&]$', '')"
    tail = f"regexp_replace({tail}, '/+$', '')"
    return f"({sql_host_of(col)} || {tail})"


# fixture noise arms (doc_id-keyed, page-independent): the five ways
# one page's refetches differ byte-wise. Every arm is something
# canonical_url strips, so noisy fetches of one page canonicalize to
# one URL; arms cycle on moduli coprime enough that each combination
# occurs (2,5,3,4,6 over doc_id).
def _noise(doc_id: Column) -> tuple[Column, ...]:
    scheme = (
        F.when(doc_id % 2 == 1, F.lit("HTTP://")).otherwise(F.lit("https://"))
    )
    port = F.when(doc_id % 5 == 0, F.lit(":443")).otherwise(F.lit(""))
    slash = F.when(doc_id % 3 == 0, F.lit("/")).otherwise(F.lit(""))
    query = (
        F.when(doc_id % 4 == 1, F.lit("?utm_source=feed"))
        .when(doc_id % 4 == 2, F.lit("?utm_campaign=x&utm_medium=y"))
        .when(doc_id % 4 == 3, F.lit("?gclid=abc123"))
        .otherwise(F.lit(""))
    )
    frag = F.when(doc_id % 6 == 1, F.lit("#section2")).otherwise(F.lit(""))
    return scheme, port, slash, query, frag


def _sql_noise(did: str) -> tuple[str, ...]:
    return (
        f"CASE WHEN {did} % 2 = 1 THEN 'HTTP://' ELSE 'https://' END",
        f"CASE WHEN {did} % 5 = 0 THEN ':443' ELSE '' END",
        f"CASE WHEN {did} % 3 = 0 THEN '/' ELSE '' END",
        (
            f"CASE {did} % 4 WHEN 1 THEN '?utm_source=feed' "
            f"WHEN 2 THEN '?utm_campaign=x&utm_medium=y' "
            f"WHEN 3 THEN '?gclid=abc123' ELSE '' END"
        ),
        f"CASE WHEN {did} % 6 = 1 THEN '#section2' ELSE '' END",
    )


def noisy_doc_url(source: Column, doc_id: Column) -> Column:
    """``doc_url`` wrapped in fetch noise — same host/path arms, so
    ``canonical_url(noisy_doc_url(s, d)) == canonical_url(
    doc_url(s, d))`` by construction (the canonicalizer's oracle-free
    invariant, pinned in tests)."""
    scheme, port, slash, query, frag = _noise(doc_id)
    sub = (
        F.when(doc_id % 3 == 0, F.lit("www."))
        .when(doc_id % 3 == 1, F.lit("cdn."))
        .otherwise(F.lit(""))
    )
    sfx = (
        F.when(doc_id % 7 == 0, F.lit(".com"))
        .when(doc_id % 7 == 1, F.lit(".co.uk"))
        .when(doc_id % 7 == 2, F.lit(".org"))
        .otherwise(F.lit(".net"))
    )
    return F.concat(
        scheme, sub, source, sfx, port,
        F.lit("/d/"), doc_id.cast("string"), slash, query, frag,
    )


def sql_noisy_doc_url(src: str, did: str) -> str:
    """DuckDB mirror of ``noisy_doc_url`` (same arms, same order)."""
    scheme, port, slash, query, frag = _sql_noise(did)
    return (
        f"{scheme} || "
        f"CASE {did} % 3 WHEN 0 THEN 'www.' WHEN 1 THEN 'cdn.' ELSE '' END "
        f"|| {src} || "
        f"CASE {did} % 7 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk' "
        f"WHEN 2 THEN '.org' ELSE '.net' END "
        f"|| {port} || '/d/' || CAST({did} AS VARCHAR) || {slash} "
        f"|| {query} || {frag}"
    )


# page-identity device for URL-grain dedup: 150 shared pages per
# PAGE_MOD cycle of doc_ids. 150 is even but not divisible by 4, so
# a shared page's refetches (doc_id ≡ p mod 150) land on exactly TWO
# of the four mod-4 snapshots, with repeats inside each — both
# within-snapshot and cross-snapshot URL duplicates occur at every
# fixture SF (a modulus divisible by SNAPSHOTS would pin each page
# to one snapshot; one coprime with corpus_size/SNAPSHOTS would
# spread every fetch to a distinct snapshot — both kill half the
# signal). Every fifth-ish doc (doc_id % 5 == 2, a residue that
# intersects every mod-4 snapshot) fetches a SINGLETON page instead
# (page id offset past the shared range so they never collide), so
# each snapshot also contributes genuinely new URLs — without the
# arm, the later snapshots of the cycle are 100% refetch and the
# n_new_urls column goes structurally dead there.
PAGE_MOD = 150


def crawl_url(doc_id: Column) -> Column:
    """Fixture crawl-log URL: page identity (host arms, path) is a
    pure function of ``doc_id`` (shared ``doc_id % PAGE_MOD`` page or
    singleton page, see PAGE_MOD comment); fetch noise is a pure
    function of ``doc_id``. At deployment the dedup groups by
    ``canonical_url(crawl.url)`` directly — this builder (and its SQL
    twin) is the only fixture-specific piece, exactly like
    ``doc_url`` above."""
    page = F.when(
        doc_id % 5 == 2, doc_id + F.lit(PAGE_MOD)
    ).otherwise(doc_id % PAGE_MOD)
    scheme, port, slash, query, frag = _noise(doc_id)
    sub = (
        F.when(page % 3 == 0, F.lit("www."))
        .when(page % 3 == 1, F.lit("cdn."))
        .otherwise(F.lit(""))
    )
    sfx = (
        F.when(page % 7 == 0, F.lit(".com"))
        .when(page % 7 == 1, F.lit(".co.uk"))
        .when(page % 7 == 2, F.lit(".org"))
        .otherwise(F.lit(".net"))
    )
    return F.concat(
        scheme, sub, F.lit("site"), (page % 17).cast("string"), sfx, port,
        F.lit("/p/"), page.cast("string"), slash, query, frag,
    )


def sql_crawl_url(did: str) -> str:
    """DuckDB mirror of ``crawl_url`` (same arms, same order)."""
    p = (
        f"(CASE WHEN {did} % 5 = 2 THEN {did} + {PAGE_MOD} "
        f"ELSE {did} % {PAGE_MOD} END)"
    )
    scheme, port, slash, query, frag = _sql_noise(did)
    return (
        f"{scheme} || "
        f"CASE {p} % 3 WHEN 0 THEN 'www.' WHEN 1 THEN 'cdn.' ELSE '' END "
        f"|| 'site' || CAST({p} % 17 AS VARCHAR) || "
        f"CASE {p} % 7 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk' "
        f"WHEN 2 THEN '.org' ELSE '.net' END "
        f"|| {port} || '/p/' || CAST({p} AS VARCHAR) || {slash} "
        f"|| {query} || {frag}"
    )
