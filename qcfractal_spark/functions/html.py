"""HTML → main-content extraction (VERDICT r8 item 4) — the curation
stage BEFORE everything else in the pipeline: real crawls deliver markup,
and C4/RefinedWeb-style corpora strip boilerplate by line-level rules
before any scoring/dedup sees the text.

Rules (the classic Kohlschütter-style line heuristics, public method):
  1. drop ``<script>``/``<style>``/``<head>`` blocks and HTML comments;
  2. block-level close tags (``</p> </div> </li> </h*> <br>``) become
     line breaks; every other tag is stripped;
  3. a visible line is KEPT iff it has ≥3 words AND its link density
     (chars inside ``<a>…</a>`` ÷ visible chars) is ≤ 1/2 — nav bars,
     footers, and "related links" lists are link-dense short lines,
     article prose is not.  The density test is integer-exact
     (``2·link_chars ≤ visible_chars``) so both engines agree bit-for-bit;
  4. basic entity unescape (``&lt; &gt; &nbsp; &amp;`` — ``&amp;`` last).

Spark shape — built for 100 TB: the whole extraction is ONE row-local
projection — regexp_replace chains plus array higher-order functions
(transform/filter/aggregate) over the line array.  No explode, no
re-aggregation, therefore zero shuffles and no per-group state; it runs
inside whole-stage codegen at scan speed, the same discipline as
functions/urls.py.  The DuckDB twin (``html_extract_sql``) replays the
identical algebra with list_transform/list_filter/list_sum — kept in
sync by the shared regex constants.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Shared regex constants — the single source both dialects render.
_RE_SCRIPT = r"(?s)<script[^>]*>.*?</script>"
_RE_STYLE = r"(?s)<style[^>]*>.*?</style>"
_RE_HEAD = r"(?s)<head[^>]*>.*?</head>"
_RE_COMMENT = r"(?s)<!--.*?-->"
_RE_BLOCK_CLOSE = r"</p>|</div>|</li>|</h[1-6]>|</tr>|<br\s*/?>"
_RE_ANCHOR_TEXT = r"(?s)<a[^>]*>(.*?)</a>"
_RE_TAG = r"<[^>]*>"
# Word splitter: an EXPLICIT class, not \s — Java regex \s includes
# U+000B (vertical tab) while DuckDB's RE2 \s excludes it, so the two
# engines would split (and thus keep-verdict) texts containing VT
# differently (ADVICE r9).  Both dialects read this class identically.
_RE_WS = r"[ \t\n\r\f]+"

MIN_WORDS = 3  # a kept line needs at least this many visible words


def _unescape(col: Column) -> Column:
    col = F.replace(col, F.lit("&lt;"), F.lit("<"))
    col = F.replace(col, F.lit("&gt;"), F.lit(">"))
    col = F.replace(col, F.lit("&nbsp;"), F.lit(" "))
    return F.replace(col, F.lit("&amp;"), F.lit("&"))


def html_lines(html: Column) -> Column:
    """``array<struct<vis,keep,nvis>>`` — one entry per visible line after
    block splitting: the unescaped visible text, the keep verdict, and
    the visible char count (empty lines already excluded)."""
    x = F.regexp_replace(html, _RE_SCRIPT, "")
    x = F.regexp_replace(x, _RE_STYLE, "")
    x = F.regexp_replace(x, _RE_HEAD, "")
    x = F.regexp_replace(x, _RE_COMMENT, "")
    x = F.regexp_replace(x, _RE_BLOCK_CLOSE, "\n")
    raw_lines = F.split(x, "\n")

    def line_struct(ln: Column) -> Column:
        link_chars = F.aggregate(
            F.transform(
                F.regexp_extract_all(ln, F.lit(_RE_ANCHOR_TEXT), F.lit(1)),
                lambda s: F.length(F.regexp_replace(s, _RE_TAG, "")),
            ),
            F.lit(0),
            lambda a, b: a + b,
        )
        vis = F.trim(_unescape(F.regexp_replace(ln, _RE_TAG, "")))
        nvis = F.length(vis)
        words = F.size(F.split(vis, _RE_WS))
        keep = (nvis > 0) & (words >= MIN_WORDS) & (link_chars * 2 <= nvis)
        return F.struct(
            vis.alias("vis"), keep.alias("keep"), nvis.alias("nvis")
        )

    lines = F.transform(raw_lines, line_struct)
    return F.filter(lines, lambda s: s["nvis"] > 0)


def with_html_extract(df, html: Column, out_prefix: str = ""):
    """Append ``content``, ``n_lines``, ``n_kept``, ``boilerplate_share``
    (optionally prefixed) to ``df`` — the cleaned main text (kept lines
    joined with ``\\n``), line counts, and the boilerplate share =
    1 − kept_chars/visible_chars (6 dp, the repo's float-parity rounding).

    The line pipeline is staged as its OWN projection (a named ``__lines``
    column) and every output derives from that attribute: expression-level
    field extraction would inline a private copy of the whole regex/HOF
    pipeline per output (SimplifyExtractValueOps), and HOF lambdas are
    interpreted — no codegen CSE rescues the duplicates.  Measured at
    sf0.1: 4.2 s as 6 inlined copies → 1.1 s staged (plan shows exactly
    one regexp_extract_all).  CollapseProject keeps the stage intact
    because the producing expression is non-cheap and multiply-referenced.
    """
    p = out_prefix
    staged = df.withColumn("__lines", html_lines(html))
    L = F.col("__lines")
    kept = F.filter(L, lambda s: s["keep"])
    content = F.array_join(F.transform(kept, lambda s: s["vis"]), "\n")
    tot = F.aggregate(L, F.lit(0), lambda a, s: a + s["nvis"])
    kc = F.aggregate(kept, F.lit(0), lambda a, s: a + s["nvis"])
    share = F.round(
        F.lit(1.0) - kc.cast("double") / F.nullif(tot, F.lit(0)).cast("double"), 6
    )
    return (
        staged.withColumn(p + "content", content)
        .withColumn(p + "n_lines", F.size(L).cast("int"))
        .withColumn(p + "n_kept", F.size(kept).cast("int"))
        .withColumn(
            p + "boilerplate_share", F.coalesce(share, F.lit(1.0))
        )
        .drop("__lines")
    )


# ---------------------------------------------------------------- oracle

def _sql_unescape(expr: str) -> str:
    return (
        f"replace(replace(replace(replace({expr}, "
        "'&lt;', '<'), '&gt;', '>'), '&nbsp;', ' '), '&amp;', '&')"
    )


def html_lines_sql(html_expr: str) -> str:
    """DuckDB list<struct(vis,keep,nvis)> replay of html_lines — same
    regexes, global-flag regexp_replace (DuckDB replaces first match only
    by default), integer-exact density test."""
    x = html_expr
    for pat in (_RE_SCRIPT, _RE_STYLE, _RE_HEAD, _RE_COMMENT):
        x = f"regexp_replace({x}, '{pat}', '', 'g')"
    x = f"regexp_replace({x}, '{_RE_BLOCK_CLOSE}', chr(10), 'g')"
    link = (
        "list_sum(list_transform("
        f"regexp_extract_all(ln, '{_RE_ANCHOR_TEXT}', 1), "
        f"s -> strlen(regexp_replace(s, '{_RE_TAG}', '', 'g'))))"
    )
    vis_raw = f"regexp_replace(ln, '{_RE_TAG}', '', 'g')"
    vis = f"trim({_sql_unescape(vis_raw)})"
    return (
        "list_filter(list_transform("
        f"string_split({x}, chr(10)), "
        f"ln -> struct_pack(vis := {vis}, "
        f"keep := (strlen({vis}) > 0 AND "
        f"len(regexp_split_to_array(trim({vis}), '{_RE_WS}')) >= {MIN_WORDS} AND "
        f"2 * COALESCE({link}, 0) <= strlen({vis})), "
        f"nvis := strlen({vis}))), "
        "s -> s.nvis > 0)"
    )


def html_extract_select_sql(input_cte: str, html_expr: str, keep: str) -> str:
    """A SELECT over ``input_cte`` appending content / n_lines / n_kept /
    boilerplate_share via the same algebra (content joined with \\n)."""
    lines = html_lines_sql(html_expr)
    return f"""
SELECT {keep},
       COALESCE(array_to_string(list_transform(list_filter(__lines, s -> s.keep),
                                               s -> s.vis), chr(10)),
                '') AS content,
       CAST(len(__lines) AS INT) AS n_lines,
       CAST(len(list_filter(__lines, s -> s.keep)) AS INT) AS n_kept,
       COALESCE(round(1.0 - CAST(list_sum(list_transform(
                    list_filter(__lines, s -> s.keep), s -> s.nvis))
                  AS DOUBLE)
                / NULLIF(CAST(list_sum(list_transform(__lines, s -> s.nvis))
                  AS DOUBLE), 0), 6), 1.0) AS boilerplate_share
FROM (SELECT *, {lines} AS __lines FROM {input_cte})
"""
