"""kn_lm_scores vs an independent pure-Python Decimal replay — exercises
the whole float contract (double arithmetic in the documented
association order, HALF_UP 9-dp rounding, decimal tf-weighted sums,
6-dp mean) without sharing a line of algebra with either engine arm.
Fixed corpus (not fuzz): log2 can differ by 1 ULP across libms, and a
fixed input that passes once passes always."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from qcfractal_spark.functions.text import kn_lm_scores

DOCS = [
    (1, "we flew to san francisco and then to san francisco again"),
    (2, "the quick brown fox jumps over the lazy dog and the quick fox"),
    (3, "san francisco fog rolls over the bay every quiet morning"),
    (4, "quick quick quick brown brown fox fox fox fox jumps"),
    (5, "to be or not to be that is the question to be"),
]


def _round_half_up(x: float, dp: int) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal(1).scaleb(-dp), ROUND_HALF_UP)


def _reference_kn(docs, d=0.75):
    btf: Counter = Counter()
    for doc_id, text in docs:
        toks = text.split()
        for i in range(len(toks) - 1):
            btf[(doc_id, toks[i], toks[i + 1])] += 1
    bc: Counter = Counter()
    for (_doc, a, b), tf in btf.items():
        bc[(a, b)] += tf
    ca: Counter = Counter()
    n1a: Counter = Counter()
    n1b: Counter = Counter()
    for (a, b), cab in bc.items():
        ca[a] += cab
        n1a[a] += 1
        n1b[b] += 1
    ntypes = len(bc)
    sums: dict = defaultdict(lambda: [0, Decimal(0)])
    for (doc_id, a, b), tf in btf.items():
        cab = bc[(a, b)]
        p = (cab - d) / ca[a] + (d / ca[a]) * n1a[a] * (n1b[b] / ntypes)
        nll = _round_half_up(-(math.log(p) / math.log(2)), 9)
        sums[doc_id][0] += tf
        sums[doc_id][1] += Decimal(tf) * nll
    return {
        doc_id: (n, float(_round_half_up(float(s) / n, 6)))
        for doc_id, (n, s) in sums.items()
    }


def test_kn_matches_pure_python_decimal_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], float(r["mean_nll"]))
        for r in kn_lm_scores(df).collect()
    }
    want = _reference_kn(DOCS)
    assert got == want


def _reference_kn_mod(docs):
    """Modified KN (Chen & Goodman): count-of-count-estimated D1/D2/D3+,
    replayed in pure Python with the documented association order."""
    btf: Counter = Counter()
    for doc_id, text in docs:
        toks = text.split()
        for i in range(len(toks) - 1):
            btf[(doc_id, toks[i], toks[i + 1])] += 1
    bc: Counter = Counter()
    for (_doc, a, b), tf in btf.items():
        bc[(a, b)] += tf
    ca: Counter = Counter()
    ka = defaultdict(lambda: [0, 0, 0])  # N1(a), N2(a), N3+(a)
    n1b: Counter = Counter()
    n = [0, 0, 0, 0]  # n1..n4
    for (a, b), cab in bc.items():
        ca[a] += cab
        ka[a][0 if cab == 1 else 1 if cab == 2 else 2] += 1
        n1b[b] += 1
        if 1 <= cab <= 4:
            n[cab - 1] += 1
    ntypes = len(bc)
    n1, n2, n3, n4 = n
    y = (n1 / (n1 + 2 * n2)) if (n1 + 2 * n2) > 0 else 0.0
    # same [0, k] clamp as kn_mod_p_sql (r10 ADVICE)
    d1 = max(0.0, min(1.0, (1.0 - 2.0 * y * (n2 / n1)) if n1 > 0 else 0.0))
    d2 = max(0.0, min(2.0, (2.0 - 3.0 * y * (n3 / n2)) if n2 > 0 else 0.0))
    d3 = max(0.0, min(3.0, (3.0 - 4.0 * y * (n4 / n3)) if n3 > 0 else 0.0))
    sums: dict = defaultdict(lambda: [0, Decimal(0)])
    for (doc_id, a, b), tf in btf.items():
        cab = bc[(a, b)]
        dsel = d1 if cab == 1 else d2 if cab == 2 else d3
        ka1, ka2, ka3 = ka[a]
        p = (cab - dsel) / ca[a] + (
            (d1 * ka1 + d2 * ka2 + d3 * ka3) / ca[a]
        ) * (n1b[b] / ntypes)
        nll = _round_half_up(-(math.log(p) / math.log(2)), 9)
        sums[doc_id][0] += tf
        sums[doc_id][1] += Decimal(tf) * nll
    return {
        doc_id: (cnt, float(_round_half_up(float(s) / cnt, 6)))
        for doc_id, (cnt, s) in sums.items()
    }


def test_kn_mod_matches_pure_python_decimal_replay(spark):
    from qcfractal_spark.functions.text import kn_mod_lm_scores

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], float(r["mean_nll"]))
        for r in kn_mod_lm_scores(df).collect()
    }
    want = _reference_kn_mod(DOCS)
    assert got == want


def test_kn_mod_finite_on_degenerate_corpora(spark):
    """All-singleton bigrams (n2=n3=n4=0): D1=1 clips every discounted
    term to zero, so scores come ENTIRELY from the continuation backoff —
    still finite and positive.  Also finite when bigram counts skip a
    count-of-count bucket (n3=0 but counts of 4 exist is impossible for
    cab<=4 paths; skipping 2 exercises the D2=0 guard)."""
    from qcfractal_spark.functions.text import kn_mod_lm_scores

    singles = spark.createDataFrame(
        [(i, f"u{i} v{i} w{i} x{i}") for i in range(25)],
        "doc_id long, text string",
    )
    out = kn_mod_lm_scores(singles).collect()
    assert len(out) == 25
    assert all(r["mean_nll"] is not None and float(r["mean_nll"]) > 0 for r in out)

    # counts are only 1 and 3 (n2 = 0): the D2 guard path
    rows = [(1, "a b a b a b c d")]  # (a,b)x3, (b,a)x2 ... craft below
    rows = [(1, "p q r p q r p q r s t")]  # (p,q)x3,(q,r)x3,(r,p)x2,(r,s),(s,t)
    out2 = kn_mod_lm_scores(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()
    assert len(out2) == 1 and float(out2[0]["mean_nll"]) > 0


def _inverted_coc_docs():
    """Inverted count-of-counts corpus (r10 ADVICE): n3 >> n2 with n4 = 0.
    Raw Chen-Goodman gives D2 = 2 - 3·Y·(n3/n2) = -8 (negative) and
    D3 = 3 (at its cap); for context 'x' (one count-3 and one count-2
    continuation) the unclamped lambda(x) = (D2 + D3)/5 = -1 drives
    p(y|x) = 0 + (-1)·(n1b/ntypes) < 0 -> log2 NULL pre-fix.  Two-word
    docs so every occurrence is exactly one bigram."""
    docs, doc_id = [], 0
    for _ in range(3):
        doc_id += 1
        docs.append((doc_id, "x y"))
    for _ in range(2):
        doc_id += 1
        docs.append((doc_id, "x z"))
    for i in range(1, 10):  # nine more count-3 types -> n3 = 10
        for _ in range(3):
            doc_id += 1
            docs.append((doc_id, f"c{i} d{i}"))
    doc_id += 1
    docs.append((doc_id, "k l"))  # n1 = 1 so Y > 0
    return docs


def test_kn_mod_clamped_on_inverted_count_of_counts(spark):
    """With the [0,k] clamp no score is NULL (pre-fix the cab=3 bigram
    under context 'x' had p < 0 and its NULL nll silently vanished from
    the sum while n_bigrams still counted it), and the scores match the
    clamped pure-Python replay exactly."""
    from qcfractal_spark.functions.text import kn_mod_lm_scores

    docs = _inverted_coc_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], float(r["mean_nll"]))
        for r in kn_mod_lm_scores(df).collect()
    }
    assert len(got) == len(docs)
    assert all(v[0] == 1 and v[1] is not None for v in got.values())
    want = _reference_kn_mod(docs)
    assert got == want
