"""Public-Suffix-List registrable domains (VERDICT r8 item 2) — the
PSL-true upgrade of functions/urls.registrable_domain's 6-suffix regex
approximation.

The PSL algorithm (publicsuffix.org/list/ semantics, public spec):
a host's *public suffix* is chosen from the matching rules — an
exception rule (``!city.kobe.jp``) prevails if any matches, else the
longest match wins; a wildcard rule (``*.ck``) matches one arbitrary
label in place of ``*``; if nothing matches, the default rule ``*``
makes the bare TLD the suffix.  The *registrable domain* is the public
suffix plus one more label; a host that IS a public suffix has none
(this module returns the host unchanged there, matching the regex arm's
contract).

Spark shape — built for 100 TB:
  * the rule set is a tiny dim table (one row per rule base, boolean
    kind flags) that is **broadcast**; matching is K chained broadcast
    LEFT joins (K = max labels in any rule base, 3 for the snapshot) on
    the host's last-j-label candidates.  No explode, no re-aggregation,
    therefore **zero shuffles** — each probe is a hash lookup in the
    broadcast build side and the whole chain stays map-side.
  * the candidate extraction and the suffix-length arithmetic are pure
    built-in expressions (split/slice/array_join/when) inside
    whole-stage codegen.

Rule data: ``PSL_SNAPSHOT`` is a curated subset of the ICANN section of
the real PSL (the multi-label country second-levels that actually occur
in web crawls, plus the classic wildcard/exception families);
``PSL_SNAPSHOT_PRIVATE`` is the matching private-section subset
(github.io, blogspot.*, the AWS compute/ELB wildcards — the multi-tenant
hosts where every customer subdomain is its own site), included by
default via ``load_psl_rules(private=True)``.  A production deployment
swaps in the full list via ``load_psl_rules(path)`` or
``$SPARK_GRAFT_PSL_FILE`` — the standard file format (comments,
``*.``/``!`` prefixes, optional ICANN/private sections) is parsed, and
the operator adapts K to the file's longest rule automatically.

The DuckDB oracle twin is generated FROM THE SAME rules list
(``psl_rules_values_sql`` + ``psl_domain_case_sql``), so the two arms
cannot drift.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F
from ..session import local_df

# Curated ICANN-section snapshot: every entry is a real PSL rule.
# Single-label TLD rules are omitted on purpose — the default rule
# (suffix = last label) already produces their answer, and leaving them
# out keeps the broadcast table minimal.
PSL_SNAPSHOT = [
    # United Kingdom / Ireland / Oceania
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "me.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk", "police.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    # East Asia
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "org.sg", "net.sg", "edu.sg", "gov.sg", "per.sg",
    # Japan: prefecture second-levels plus the city wildcard/exception
    # families (the PSL's canonical exception examples).
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp", "sapporo.jp",
    "sendai.jp", "yokohama.jp",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    # South / Southeast Asia
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "res.in",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "co.id", "or.id", "web.id", "ac.id", "sch.id", "go.id",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    # Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    "eco.br", "eng.br",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    "com.ve", "net.ve", "org.ve", "co.ve", "edu.ve", "gob.ve",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "nom.pe",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy",
    "co.cr", "ac.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    # Africa / Middle East / Europe multi-label families
    "co.za", "net.za", "org.za", "web.za", "ac.za", "gov.za", "edu.za",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "sch.sa",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "k12.il",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "bel.tr", "web.tr",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "sch.ng",
    "com.gh", "org.gh", "edu.gh", "gov.gh", "mil.gh",
    # Classic whole-TLD wildcards (real ICANN entries): every 2-label
    # tail under these is itself a public suffix.
    "ck", "*.ck", "!www.ck",
    "bd", "*.bd",
    "er", "*.er",
    "fk", "*.fk",
    "kw", "*.kw",
    "mm", "*.mm",
    "np", "*.np",
]

# Curated PRIVATE-section snapshot (VERDICT r9 item 3) — every entry is a
# real rule from the PSL's private-domains section: multi-tenant hosting
# platforms where each customer subdomain is its own registrable domain.
# Without these, a crawl pipeline lumps all of github.io into ONE
# mega-domain and caps/profiles it as a single site.  Entries are kept to
# ≤3 labels so the probe width K (and thus the plan) is unchanged.
PSL_SNAPSHOT_PRIVATE = [
    # code/static hosting
    "github.io", "githubusercontent.com", "gitlab.io",
    # blog platforms (blogspot has per-ccTLD entries in the real list)
    "blogspot.com", "blogspot.co.uk", "blogspot.com.br", "blogspot.in",
    "blogspot.de", "wordpress.com",
    # PaaS / serverless
    "herokuapp.com", "netlify.app", "vercel.app", "now.sh",
    "pages.dev", "workers.dev",
    "appspot.com", "web.app", "firebaseapp.com", "cloudfunctions.net",
    "azurewebsites.net",
    # cloud storage / CDN / compute (the AWS wildcards are the private
    # section's canonical wildcard rules: every ELB/EC2 name under them
    # is a separate registrable domain)
    "cloudfront.net", "s3.amazonaws.com",
    "*.elb.amazonaws.com", "*.compute.amazonaws.com",
    "*.compute-1.amazonaws.com",
    # dynamic-DNS families
    "duckdns.org", "dyndns.org", "no-ip.org",
]


def load_psl_rules(path: str | None = None, private: bool = True):
    """Return the rule list as ``[(base, is_normal, is_wildcard,
    is_exception, nlabels)]`` with one row per base (flags merged — a
    base like ``ck`` can carry both a normal and, via ``*.ck``, a
    wildcard rule).  ``path`` (or ``$SPARK_GRAFT_PSL_FILE``) loads a
    standard-format PSL file; default is the in-code snapshot.

    ``private=True`` (the default — what a crawl pipeline wants) includes
    the PSL's private-domains section, so multi-tenant hosts like
    ``user.github.io`` are their own registrable domains; ``private=False``
    restricts to the ICANN section (the DNS-registry-only view)."""
    path = path or os.environ.get("SPARK_GRAFT_PSL_FILE")
    if path:
        raw = []
        in_private = False
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if "===BEGIN PRIVATE DOMAINS===" in line:
                    in_private = True
                if not line or line.startswith("//"):
                    continue
                if in_private and not private:
                    continue
                raw.append(line)
    else:
        raw = list(PSL_SNAPSHOT) + (list(PSL_SNAPSHOT_PRIVATE) if private else [])

    merged: dict[str, list[bool]] = {}
    for rule in raw:
        if rule.startswith("!"):
            base, kind = rule[1:], 2
        elif rule.startswith("*."):
            base, kind = rule[2:], 1
        else:
            base, kind = rule, 0
        # PSL files are punycode/lowercase already; normalize defensively.
        base = base.lower()
        flags = merged.setdefault(base, [False, False, False])
        flags[kind] = True
    return [
        (base, flags[0], flags[1], flags[2], base.count(".") + 1)
        for base, flags in sorted(merged.items())
    ]


def rules_df(spark, rules=None) -> DataFrame:
    """The broadcastable rule dim table."""
    rules = rules if rules is not None else load_psl_rules()
    return local_df(
        spark, rules, "base string, is_n boolean, is_w boolean, is_e boolean, nlabels int"
    )


def max_rule_labels(rules) -> int:
    return max((r[4] for r in rules), default=1)


MAP_LITERAL_MAX = 1024  # rule sets up to this size compile to a map literal


def with_registrable_domain(
    df: DataFrame, host_col: str, out_col: str = "domain", rules=None
) -> DataFrame:
    """Append ``out_col`` = the PSL registrable domain of ``df[host_col]``.

    Two physical strategies, same algebra and results:

    * rule set ≤ MAP_LITERAL_MAX (the in-code snapshot): the rules
      compile to ONE ``map<string,int>`` literal (value = kind bitmask
      1=normal|2=wildcard|4=exception) and every candidate lookup is an
      ``element_at`` — pure whole-stage-codegen expressions, zero joins,
      zero broadcast setup.  Measured at sf0.1: the 3-broadcast-join form
      added ~1.1 s of per-query exchange/build fixed cost to a 0.2 s
      query; the map literal adds ~nothing.
    * larger rule sets (a full PSL file via ``$SPARK_GRAFT_PSL_FILE``,
      ~9.6k rules — a map literal that big bloats the plan): K chained
      broadcast LEFT joins (K = longest rule base) against the rule dim
      table — still map-side, no shuffle, no explode.

    Hosts that are themselves public suffixes (or single labels) pass
    through unchanged, matching urls.registrable_domain's contract.
    """
    rules = rules if rules is not None else load_psl_rules()
    K = max_rule_labels(rules)
    base_cols = list(df.columns)

    # Exactly four projections (driver-side plan ANALYSIS of a long
    # withColumn chain cost ~0.4 s per call — each withColumn copies and
    # re-analyzes the whole plan; staged attributes also keep every
    # non-cheap subtree single-evaluation, the functions/html.py lesson):
    #   A: labels + n   B: one rule probe per j   C: ps_len   D: domain
    labels = F.split(F.col(host_col), r"\.")
    staged = df.select(
        "*", labels.alias("__psl_labels"), F.size(labels).alias("__psl_n")
    )

    # candidate_j = the host's last j labels.  Missing candidates (host
    # shorter than j) stay NULL: NULL misses the map and the LEFT join.
    def cand(j: int):
        return F.when(
            F.col("__psl_n") >= j,
            F.array_join(
                F.slice(F.col("__psl_labels"), F.col("__psl_n") - F.lit(j - 1), F.lit(j)),
                ".",
            ),
        )

    if len(rules) <= MAP_LITERAL_MAX:
        # ONE parsed SQL expression, not create_map(*[F.lit()...]): each
        # F.lit is a py4j round trip — ~400 of them cost ~0.4 s of driver
        # time PER CALL (the lit_array lesson, SCALE.md §5); the parsed
        # string is a single call with identical semantics.
        entries = ", ".join(
            f"'{base}', {(1 if is_n else 0) | (2 if is_w else 0) | (4 if is_e else 0)}"
            for base, is_n, is_w, is_e, _k in rules
        )
        rule_map = F.expr(f"map({entries})")
        staged = staged.select(
            "*",
            *[
                F.element_at(rule_map, cand(j)).alias(f"__psl_f{j}")
                for j in range(1, K + 1)
            ],
        )

        def flag(j: int, bit: int):
            fj = F.col(f"__psl_f{j}")
            return F.coalesce(fj.bitwiseAND(bit) == bit, F.lit(False))

    else:
        spark = df.sparkSession
        rdf = rules_df(spark, rules)
        for j in range(1, K + 1):
            staged = staged.withColumn(f"__psl_c{j}", cand(j))
            rj = rdf.where(F.col("nlabels") == j).select(
                F.col("base").alias(f"__psl_b{j}"),
                F.col("is_n").alias(f"__psl_jn{j}"),
                F.col("is_w").alias(f"__psl_jw{j}"),
                F.col("is_e").alias(f"__psl_je{j}"),
            )
            staged = staged.join(
                F.broadcast(rj), staged[f"__psl_c{j}"] == rj[f"__psl_b{j}"], "left"
            )

        def flag(j: int, bit: int):
            kind = {1: "n", 2: "w", 4: "e"}[bit]
            return F.coalesce(F.col(f"__psl_j{kind}{j}"), F.lit(False))

    n = F.col("__psl_n")
    # Exception prevails (longest first, though PSL exceptions never
    # overlap); else the longest match; else the default rule (len 1).
    exc = None
    for j in range(K, 0, -1):
        this = F.when(flag(j, 4), F.lit(j - 1))
        exc = this if exc is None else F.coalesce(exc, this)
    lens = [F.lit(1)]
    for j in range(1, K + 1):
        lens.append(
            F.when(flag(j, 2) & (n >= j + 1), F.lit(j + 1)).otherwise(F.lit(0))
        )
        lens.append(F.when(flag(j, 1), F.lit(j)).otherwise(F.lit(0)))
    staged = staged.select(
        "*", F.coalesce(exc, F.greatest(*lens)).alias("__psl_len")
    )
    ps_len = F.col("__psl_len")

    domain = F.when(
        n > ps_len,
        F.array_join(F.slice(F.col("__psl_labels"), n - ps_len, ps_len + 1), "."),
    ).otherwise(F.col(host_col))

    return staged.select(*base_cols, domain.alias(out_col))


# ---------------------------------------------------------------- oracle

def psl_rules_values_sql(rules=None) -> str:
    """DuckDB VALUES CTE body for the same rule table (kept in sync by
    construction — generated from the identical Python list)."""
    rules = rules if rules is not None else load_psl_rules()
    rows = ", ".join(
        f"('{b}', {str(n).upper()}, {str(w).upper()}, {str(e).upper()}, {k})"
        for b, n, w, e, k in rules
    )
    return (
        "psl(base, is_n, is_w, is_e, nlabels) AS (SELECT * FROM (VALUES "
        + rows
        + "))"
    )


def psl_domain_select_sql(
    input_cte: str, host_col: str, rules=None, keep: str = "*"
) -> str:
    """A SELECT over ``input_cte`` that appends ``domain`` via the same
    K-left-join + longest-match algebra as with_registrable_domain.
    DuckDB list slicing is 1-based inclusive: labels[n-j+1 : n] is the
    last-j-label candidate."""
    rules = rules if rules is not None else load_psl_rules()
    K = max_rule_labels(rules)
    joins = []
    for j in range(1, K + 1):
        joins.append(
            f"LEFT JOIN psl p{j} ON p{j}.nlabels = {j} AND p{j}.base = "
            f"CASE WHEN len(t.__labels) >= {j} THEN "
            f"array_to_string(t.__labels[len(t.__labels)-{j}+1:len(t.__labels)], '.') END"
        )
    exc = " ".join(
        f"WHEN COALESCE(p{j}.is_e, FALSE) THEN {j - 1}" for j in range(K, 0, -1)
    )
    lens = ["1"]
    for j in range(1, K + 1):
        lens.append(
            f"CASE WHEN COALESCE(p{j}.is_w, FALSE) AND len(t.__labels) >= {j + 1} "
            f"THEN {j + 1} ELSE 0 END"
        )
        lens.append(f"CASE WHEN COALESCE(p{j}.is_n, FALSE) THEN {j} ELSE 0 END")
    ps_len = f"CASE {exc} ELSE GREATEST({', '.join(lens)}) END"
    keep_sql = "* EXCLUDE (__labels)" if keep == "*" else keep
    return f"""
SELECT t.{keep_sql},
       CASE WHEN len(t.__labels) > ({ps_len})
            THEN array_to_string(
                   t.__labels[len(t.__labels) - ({ps_len}) : len(t.__labels)], '.')
            ELSE t.{host_col} END AS domain
FROM (SELECT *, string_split({host_col}, '.') AS __labels FROM {input_cte}) t
{' '.join(joins)}
"""
