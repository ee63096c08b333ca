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
