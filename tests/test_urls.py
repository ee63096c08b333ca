"""functions/urls.py — canonicalization + registrable-domain contracts, and
byte-parity between the Spark codegen chain and its DuckDB SQL replay (the
same keep-in-sync discipline as the PII regexes)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from qcfractal_spark.functions import urls

CASES = [
    # (raw, canonical, registrable domain)
    ("https://WWW.Site7.COM/docs/3?utm_source=feed", "site7.com/docs/3", "site7.com"),
    ("http://site7.com:80/docs/3/", "site7.com/docs/3", "site7.com"),
    ("https://blog.site7.com:443/docs/3#frag", "blog.site7.com/docs/3", "site7.com"),
    ("http://www.a.b.site3.co.uk/x/", "a.b.site3.co.uk/x", "site3.co.uk"),
    ("site9.org", "site9.org", "site9.org"),
    ("https://site1.com/", "site1.com", "site1.com"),
    # non-default port survives canonicalization but is excluded from host
    ("http://site2.com:8080/p", "site2.com:8080/p", "site2.com"),
    ("localhost/x", "localhost/x", "localhost"),
    ("HTTPS://WWW.EXAMPLE.COM", "example.com", "example.com"),
    ("http://x.com/a//", "x.com/a", "x.com"),
]


def test_canonical_and_domain_spark(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], "url string")
    canon = urls.canonical_url(F.col("url"))
    got = (
        df.select(
            "url",
            canon.alias("canon"),
            urls.registrable_domain(urls.url_host(canon)).alias("dom"),
        )
        .collect()
    )
    by_url = {r["url"]: (r["canon"], r["dom"]) for r in got}
    for raw, canon_want, dom_want in CASES:
        assert by_url[raw] == (canon_want, dom_want), raw


def test_sql_replay_byte_parity():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(c[0],) for c in CASES])
    c = urls.canonical_url_sql("url")
    h = urls.url_host_sql("c")
    d = urls.registrable_domain_sql("h")
    rows = con.execute(
        f"WITH b AS (SELECT url, {c} AS c FROM t), "
        f"hh AS (SELECT url, c, {h} AS h FROM b) "
        f"SELECT url, c, {d} FROM hh"
    ).fetchall()
    by_url = {r[0]: (r[1], r[2]) for r in rows}
    for raw, canon_want, dom_want in CASES:
        assert by_url[raw] == (canon_want, dom_want), raw


def test_dedup_collapses_surface_variants(spark):
    """The operator-level promise: all decoration-only variants of one page
    collapse to one canonical key."""
    variants = [
        "https://www.site5.com/p/9",
        "http://site5.com/p/9",
        "https://site5.com:443/p/9/",
        "http://www.site5.com/p/9?utm_campaign=x#top",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    out = df.select(urls.canonical_url(F.col("url")).alias("c")).distinct().collect()
    assert [r["c"] for r in out] == ["site5.com/p/9"]
