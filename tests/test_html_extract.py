"""functions/html.py — main-content extraction semantics: script/style/
head/comment stripping, block-line splitting, the ≥3-words + ≤1/2-link-
density keep rule, entity unescape, and Spark↔DuckDB twin parity on
handcrafted fixtures (the registry query is additionally oracle-gated at
sf0.001 by test_queries_oracle)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from qcfractal_spark.functions import html as H

PAGE = (
    "<html><head><title>Two words</title>"
    "<script>var no = 'never seen';</script><style>.x{}</style></head>"
    "<body><div><a href='/'>Home</a> <a href='/a'>About</a> <a href='/c'>More</a></div>"
    "<!-- secret tracker comment -->"
    "<h1>A proper heading line</h1>"
    "<p>This paragraph has plenty of words and no links at all.</p>"
    "<p>Inline <a href='/x'>link</a> inside a long enough prose line survives.</p>"
    "<li><a href='/r'>Entirely a link line</a></li>"
    "<p>Fish &amp; chips &lt;tasty&gt; today here.</p>"
    "<p>too short</p>"
    "<div><a href='/t'>Terms of service</a> <a href='/p'>Privacy here</a> ok</div>"
    "</body></html>"
)

KEPT = [
    "A proper heading line",
    "This paragraph has plenty of words and no links at all.",
    "Inline link inside a long enough prose line survives.",
    "Fish & chips <tasty> today here.",
]
DROPPED_FRAGMENTS = ["Home About", "Entirely a link line", "too short",
                     "Terms of service", "never seen", "secret tracker",
                     "Two words"]


def _spark_extract(spark, html_text):
    df = spark.createDataFrame([(html_text,)], "html string")
    e = H.with_html_extract(df, F.col("html"))
    return e.select(
        "content",
        "n_lines",
        "n_kept",
        F.col("boilerplate_share").alias("share"),
    ).first()


def test_keep_and_drop_rules(spark):
    r = _spark_extract(spark, PAGE)
    lines = r["content"].split("\n")
    assert lines == KEPT
    for frag in DROPPED_FRAGMENTS:
        assert frag not in r["content"]
    assert r["n_kept"] == len(KEPT)
    assert r["n_lines"] > r["n_kept"]
    assert 0.0 < r["share"] < 1.0


def test_empty_and_all_boilerplate(spark):
    r = _spark_extract(spark, "<p><a href='/'>x</a></p>")
    assert r["content"] == "" and r["n_kept"] == 0 and r["share"] == 1.0
    r2 = _spark_extract(spark, "")
    assert r2["content"] == "" and r2["n_lines"] == 0 and r2["share"] == 1.0


def test_duckdb_twin_parity(spark):
    cases = [PAGE, "<p><a href='/'>x</a></p>", "",
             "<p>one plain line of text</p>no tags trailing words here"]
    got = [
        ( r["content"], r["n_lines"], r["n_kept"], r["share"])
        for r in (_spark_extract(spark, c) for c in cases)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, html VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(cases)))
    sql = H.html_extract_select_sql("t", "html", keep="i")
    rows = con.execute(f"SELECT * FROM ({sql}) ORDER BY i").fetchall()
    exp = [(r[1], r[2], r[3], r[4]) for r in rows]
    assert got == exp


def test_line_pipeline_evaluates_once(spark):
    """The regex/HOF line pipeline must appear exactly ONCE in the plan:
    expression-level struct extraction inlined six copies (HOF lambdas
    are interpreted — no codegen CSE) and ran 4x slower at sf0.1."""
    df = spark.createDataFrame([(PAGE,)], "html string")
    out = H.with_html_extract(df, F.col("html")).select(
        "n_lines", "n_kept", "boilerplate_share", F.md5("content")
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert plan.count("regexp_extract_all") == 1


def test_cross_engine_fuzz(spark):
    """Seeded fuzz over composed HTML fragments (unbalanced tags, dangling
    anchors, entities, comments, scripts) — Spark's Java-regex pipeline and
    DuckDB's RE2 twin must agree EXACTLY on every output, including the
    degenerate shapes random composition produces.  This is the test that
    catches an engine-divergent regex before an oracle round does."""
    import random

    rng = random.Random(20260815)
    frags = [
        "plain words keep coming here", "tiny", "x",
        "<p>", "</p>", "<div>", "</div>", "<li>", "</li>", "<br>",
        "<h2>", "</h2>", "<a href='/x'>", "</a>", "<a href='/y'>click</a>",
        "&amp;", "&lt;tag&gt;", "&nbsp;", "<!-- hidden -->",
        "<script>var a = 1;</script>", "<style>.c{}</style>",
        "<head><title>t</title></head>", "mixed <b>bold</b> words",
        # control whitespace the engines' \s classes DISAGREE on (Java
        # includes U+000B, RE2 doesn't) — the explicit _RE_WS class must
        # keep both splitting identically (ADVICE r9)
        "vert\x0btab words", "one\x0btwo three four", "tab\tsep words here",
    ]
    docs = [
        " ".join(rng.choice(frags) for _ in range(rng.randint(1, 25)))
        for _ in range(80)
    ]
    df = spark.createDataFrame(list(enumerate(docs)), "i int, html string")
    got = {
        r["i"]: (r["content"], r["n_lines"], r["n_kept"], r["boilerplate_share"])
        for r in H.with_html_extract(df, F.col("html")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, html VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(docs)))
    sql = H.html_extract_select_sql("t", "html", keep="i")
    exp = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.execute(sql).fetchall()}
    assert got == exp
