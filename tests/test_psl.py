"""functions/psl.py — PSL-true registrable domains (VERDICT r8 item 2):
the publicsuffix.org matching algebra (longest match, wildcard rules,
exception override, default rule), Spark↔DuckDB twin parity generated
from the same rule list, the standard-file loader, and the plan shape
(broadcast joins only — no shuffle added by the domain stage)."""

from __future__ import annotations

import duckdb
import pytest

from qcfractal_spark.functions import psl

# (host, expected registrable domain) — each case names the PSL rule
# class it exercises.
CASES = [
    # plain gTLD (default rule: last label is the suffix)
    ("site7.com", "site7.com"),
    ("blog.site7.com", "site7.com"),
    ("a.b.c.site7.com", "site7.com"),
    # 2-label ccTLD second-levels (the mis-bucketed class the regex
    # approximation got wrong for .cn/.kr/.br)
    ("site3.co.uk", "site3.co.uk"),
    ("a.b.site3.co.uk", "site3.co.uk"),
    ("shop.com.cn", "shop.com.cn"),
    ("x.shop.com.cn", "shop.com.cn"),
    ("news.co.kr", "news.co.kr"),
    ("cdn.news.co.kr", "news.co.kr"),
    ("loja.com.br", "loja.com.br"),
    ("static.loja.com.br", "loja.com.br"),
    # bare public suffix: no registrable domain -> host unchanged
    ("co.uk", "co.uk"),
    ("com.cn", "com.cn"),
    ("com", "com"),
    # wildcard rule *.ck: any 2-label tail under .ck is itself a suffix
    ("foo.ck", "foo.ck"),
    ("site1.foo.ck", "site1.foo.ck"),
    ("a.site1.foo.ck", "site1.foo.ck"),
    # exception rule !www.ck overrides the wildcard: suffix is ck
    ("www.ck", "www.ck"),
    ("a.www.ck", "www.ck"),
    # jp city families: kobe.jp is a suffix, *.kobe.jp makes every
    # 3-label tail a suffix, !city.kobe.jp carves the city back out
    ("kobe.jp", "kobe.jp"),
    ("x.kobe.jp", "x.kobe.jp"),
    # *.kobe.jp makes x.kobe.jp itself a public suffix, so the
    # registrable domain is suffix + one label = the full 4-label host
    ("a.x.kobe.jp", "a.x.kobe.jp"),
    ("city.kobe.jp", "city.kobe.jp"),
    ("a.city.kobe.jp", "city.kobe.jp"),
    # unknown TLD: default rule
    ("site.zz", "site.zz"),
    ("a.site.zz", "site.zz"),
    # single label / degenerate
    ("localhost", "localhost"),
    ("", ""),
    # PRIVATE section (VERDICT r9 item 3): each tenant subdomain is its
    # own registrable domain — github.io must NOT collapse to one site
    ("github.io", "github.io"),
    ("alice.github.io", "alice.github.io"),
    ("www.alice.github.io", "alice.github.io"),
    ("bob.blogspot.com", "bob.blogspot.com"),
    ("x.bob.blogspot.com", "bob.blogspot.com"),
    ("shop.blogspot.co.uk", "shop.blogspot.co.uk"),
    ("myapp.herokuapp.com", "myapp.herokuapp.com"),
    ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
    # private WILDCARD rules: *.compute.amazonaws.com makes the region
    # label itself a public suffix, so registrable = 5 labels
    ("ec2-1.us-east.compute.amazonaws.com",
     "ec2-1.us-east.compute.amazonaws.com"),
    ("a.ec2-1.us-east.compute.amazonaws.com",
     "ec2-1.us-east.compute.amazonaws.com"),
    # the private rule only REFINES: amazonaws.com itself still resolves
    # by the default .com rule
    ("amazonaws.com", "amazonaws.com"),
    ("x.amazonaws.com", "amazonaws.com"),
]


def test_rules_merge_flags():
    rules = psl.load_psl_rules()
    by_base = {r[0]: r for r in rules}
    # 'ck' carries both a normal rule and (via *.ck) a wildcard flag
    assert by_base["ck"][1] and by_base["ck"][2] and not by_base["ck"][3]
    assert by_base["www.ck"][3]  # exception
    assert by_base["city.kobe.jp"] == ("city.kobe.jp", False, False, True, 3)
    assert psl.max_rule_labels(rules) == 3


def test_spark_psl_domains(spark):
    df = spark.createDataFrame([(h,) for h, _ in CASES], "host string")
    got = {r["host"]: r["domain"] for r in psl.with_registrable_domain(df, "host").collect()}
    for host, want in CASES:
        assert got[host] == want, host


def test_duckdb_twin_parity():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(host VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(h,) for h, _ in CASES])
    sql = (
        f"WITH {psl.psl_rules_values_sql()}, "
        f"s AS ({psl.psl_domain_select_sql('t', 'host', keep='host')}) "
        "SELECT host, domain FROM s"
    )
    got = dict(con.execute(sql).fetchall())
    for host, want in CASES:
        assert got[host] == want, host


def test_loader_parses_standard_file(tmp_path):
    p = tmp_path / "psl.dat"
    p.write_text(
        "// comment\n"
        "com\n\n"
        "co.uk\n"
        "*.ck\n"
        "!www.ck\n"
        "// ===BEGIN PRIVATE DOMAINS===\n"
        "github.io\n"
    )
    rules = psl.load_psl_rules(str(p), private=False)
    bases = {r[0] for r in rules}
    assert bases == {"com", "co.uk", "ck", "www.ck"}  # private section skipped
    rules_all = psl.load_psl_rules(str(p))  # private included by default
    assert "github.io" in {r[0] for r in rules_all}


def test_snapshot_path_is_pure_codegen(spark):
    """Snapshot-sized rule sets compile to a map literal: ZERO joins,
    zero exchanges — the domain stage is a scan-side decoration."""
    df = spark.createDataFrame([("a.b.com.cn",)], "host string")
    out = psl.with_registrable_domain(df, "host")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "Join" not in plan and "Exchange" not in plan
    assert "*(1)" in plan  # the whole-stage-codegen marker in simple mode


def test_large_ruleset_path_broadcast_only_no_shuffle(spark, monkeypatch):
    """Past MAP_LITERAL_MAX (a full PSL file) the same algebra runs as
    chained BroadcastHashJoins — still no shuffle, no sort-merge — and
    produces identical domains."""
    monkeypatch.setattr(psl, "MAP_LITERAL_MAX", 0)
    df = spark.createDataFrame([(h,) for h, _ in CASES if h], "host string")
    out = psl.with_registrable_domain(df, "host")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
    got = {r["host"]: r["domain"] for r in out.collect()}
    for host, want in CASES:
        if host:
            assert got[host] == want, host


def test_strategy_switch_is_results_invariant(spark):
    """Augmenting the snapshot with enough never-matching rules to force
    the broadcast-join strategy must not change a single domain — the two
    physical paths implement one algebra."""
    rules = psl.load_psl_rules()
    big = rules + [
        (f"com.z{i:04d}", True, False, False, 2)
        for i in range(psl.MAP_LITERAL_MAX + 1)
    ]
    hosts = [h for h, _ in CASES if h]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    small = {
        r["host"]: r["domain"]
        for r in psl.with_registrable_domain(df, "host").collect()
    }
    bigr = {
        r["host"]: r["domain"]
        for r in psl.with_registrable_domain(df, "host", rules=big).collect()
    }
    assert small == bigr


def test_private_toggle_and_precedence():
    """private=False restores the ICANN-only view (github.io collapses to
    one domain under the default .io rule), and within the private
    section a WILDCARD private rule coexists with normal rules on the
    same provider without interference."""
    icann = psl.load_psl_rules(private=False)
    bases = {r[0] for r in icann}
    assert "github.io" not in bases and "compute.amazonaws.com" not in bases
    full = {r[0]: r for r in psl.load_psl_rules()}
    assert full["github.io"][1]  # normal private rule
    # *.compute.amazonaws.com: wildcard-only base (no normal rule)
    assert full["compute.amazonaws.com"][2] and not full["compute.amazonaws.com"][1]
    # s3: normal-only (no wildcard) — bucket.s3... is registrable, but
    # key.bucket.s3... still collapses to bucket.s3...
    assert full["s3.amazonaws.com"][1] and not full["s3.amazonaws.com"][2]


def test_psl_structural_properties(spark):
    """Structural invariants over generated hosts: the registrable domain
    is always a dot-suffix of the host (or the host itself), is never
    empty for non-empty hosts, and never has fewer labels than two unless
    it equals the whole host (bare suffix / single label)."""
    import itertools

    labels = ["a", "bb", "www", "city", "foo", "site3"]
    tails = ["com", "co.uk", "com.cn", "ck", "kobe.jp", "zz", "x.y.zz"]
    hosts = [
        ".".join(p + (t,))
        for t in tails
        for n in (0, 1, 2)
        for p in itertools.islice(itertools.permutations(labels, n), 4)
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    for r in psl.with_registrable_domain(df, "host").collect():
        h, d = r["host"], r["domain"]
        assert d, h
        assert h == d or h.endswith("." + d), (h, d)
        assert d.count(".") >= 1 or d == h, (h, d)
