"""functions/text.py:kn_lm_scores — the Kneser-Ney arm (VERDICT r9
item 6): absolute-discount continuation backoff must (a) keep the
shuffled-junk separation the JM arm has, and (b) BEAT Jelinek-Mercer on
the sparse, context-bound class JM is known to mis-score — frequent
tokens that only ever follow one context ("san francisco") make JM's
raw-unigram backoff assign junk transitions onto them inflated
probability, while KN's continuation count N1+(*,b)=1 keeps them cheap.
Registry parity vs the DuckDB oracle is covered by test_queries_oracle."""

from __future__ import annotations

from qcfractal_spark.functions import text as tx

NATURAL = "the quick brown fox jumps over the lazy dog and then "
SHUFFLED = "dog the fox lazy then jumps the and brown quick over "


def _scores(df):
    kn = {r["doc_id"]: r["mean_nll"] for r in tx.kn_lm_scores(df).collect()}
    jm = {r["doc_id"]: r["mean_nll"] for r in tx.bigram_lm_scores(df).collect()}
    return kn, jm


def test_kn_separates_shuffled_junk(spark):
    rows = [(i, NATURAL * 5) for i in range(4)] + [(99, SHUFFLED * 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kn, _ = _scores(df)
    nat = [kn[i] for i in range(4)]
    assert len(set(nat)) == 1
    assert kn[99] > nat[0] + 1.0, (kn[99], nat[0])


def test_kn_beats_jm_on_context_bound_tokens(spark):
    """The "francisco" construction: 'francisco' is FREQUENT (high
    unigram weight → JM's backoff likes it anywhere) but appears in
    exactly ONE context (N1+(*,francisco)=1 → KN's backoff keeps it
    improbable after anything but 'san').  Junk docs splice 'francisco'
    after random words; real docs use it only after 'san'.  KN must
    separate junk from real MORE than JM does."""
    real = "we flew to san francisco and then to san francisco again . " * 4
    filler = (
        "markets opened higher today while traders watched earnings "
        "reports from large banks and energy firms . "
    ) * 4
    junk = (
        "banks francisco opened traders francisco while energy "
        "francisco reports markets francisco higher firms . "
    ) * 4
    rows = [(1, real), (2, filler), (3, real), (4, filler), (99, junk)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kn, jm = _scores(df)
    real_ids = [1, 2, 3, 4]
    kn_gap = float(kn[99]) - max(float(kn[i]) for i in real_ids)
    jm_gap = float(jm[99]) - max(float(jm[i]) for i in real_ids)
    assert kn_gap > 0, kn  # junk is worse than every real doc under KN
    # the KN separation is strictly wider than JM's on this construction
    assert kn_gap > jm_gap, (kn_gap, jm_gap)


def test_kn_short_docs_drop_out(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, None), (4, "two words two words")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.kn_lm_scores(df).collect()}
    assert set(out) == {4}
    assert out[4]["n_bigrams"] == 3


def test_kn_discount_never_clips(spark):
    """Every scored transition was seen in training (c(a,b) >= 1 > D), so
    the discounted term is strictly positive and every score is finite —
    including an all-singleton-bigram corpus (maximal sparsity)."""
    rows = [(i, f"u{i} v{i} w{i} x{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tx.kn_lm_scores(df).collect()
    assert len(out) == 30
    for r in out:
        assert r["mean_nll"] is not None and float(r["mean_nll"]) > 0
