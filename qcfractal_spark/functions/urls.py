"""URL canonicalization and registrable-domain extraction — the C4 /
RefinedWeb curation stage ahead of URL-level dedup and per-domain policy
(caps, quality rollups, blocklists).

Everything here is pure string codegen (regexp_replace / regexp_extract
chains, no UDF): the canonicalization runs at scan speed inside
whole-stage codegen, and every pattern is RE2-and-Java compatible so a
DuckDB oracle replays it byte-for-byte (the same discipline as the PII
regexes in functions/text.py).

Scale shape: zero shuffles — these are row-local projections; the dedup /
rollup that consumes them supplies the one hash exchange on the canonical
key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Multi-label public suffixes recognized by registrable_domain.  A tiny,
# documented approximation of the Public Suffix List: the full PSL is a
# data file a production deployment would broadcast-join; the operator
# contract (host → one registrable domain) is identical.
_CC_SLD_RE = r"([^.]+\.(?:co|com|org|net|ac|gov)\.(?:uk|au|jp|in|br))$"


def canonical_url(url: Column) -> Column:
    """Canonical surface form of a URL: lowercase, scheme-less, leading
    ``www.``-less, default-port-less (:80/:443), query- and fragment-less,
    no trailing slash.  Two pages that differ only in those decorations —
    the overwhelming bulk of crawl-duplicate URL variance — map to one
    key.  (Param-preserving canonicalizers sort/strip tracking params
    instead of dropping the query string; dropping is the C4 choice and
    keeps the chain pure codegen.)"""
    u = F.lower(F.trim(url))
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"[?#].*$", "")  # query + fragment
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"^([^/:]+):(?:80|443)(/|$)", r"$1$2")
    return F.regexp_replace(u, r"/+$", "")


def url_host(canon: Column) -> Column:
    """Host part of an already-canonical URL (text before the first ``/``,
    any residual non-default port excluded)."""
    return F.regexp_extract(canon, r"^([^/:]+)", 1)


def registrable_domain(host: Column) -> Column:
    """Registrable (pay-level) domain of a host: the label directly below
    the public suffix — ``blog.site7.com`` → ``site7.com``,
    ``a.b.site3.co.uk`` → ``site3.co.uk``.  Hosts with no dot (or a bare
    suffix) return unchanged.  Suffix set: ``.tld`` plus the _CC_SLD_RE
    country second-levels (see module note on the PSL approximation)."""
    r3 = F.regexp_extract(host, _CC_SLD_RE, 1)
    r2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return (
        F.when(r3 != "", r3).when(r2 != "", r2).otherwise(host)
    )


# DuckDB replay of the same chain (keep in sync with canonical_url /
# url_host / registrable_domain; RE2 back-references are \1, Java's are $1
# — the only divergence between the two engines' syntax).
def canonical_url_sql(expr: str) -> str:
    return (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"regexp_replace(lower(trim({expr})), '^https?://', ''), "
        "'[?#].*$', ''), "
        "'^www\\.', ''), "
        "'^([^/:]+):(?:80|443)(/|$)', '\\1\\2'), "
        "'/+$', '')"
    )


def registrable_domain_sql(host_expr: str) -> str:
    r3 = f"regexp_extract({host_expr}, '{_CC_SLD_RE}', 1)"
    r2 = f"regexp_extract({host_expr}, '([^.]+\\.[^.]+)$', 1)"
    return (
        f"CASE WHEN {r3} <> '' THEN {r3} "
        f"WHEN {r2} <> '' THEN {r2} ELSE {host_expr} END"
    )


def url_host_sql(canon_expr: str) -> str:
    return f"regexp_extract({canon_expr}, '^([^/:]+)', 1)"
