"""functions/text.py:bigram_lm_scores — the separation property that
motivates the bigram upgrade (VERDICT r8 item 5): shuffled-token junk has
the SAME unigram distribution as natural text (a unigram LM cannot tell
them apart) but destroyed transition structure, so the interpolated
bigram model must score it distinctly worse.  Registry parity vs the
DuckDB oracle is covered by test_queries_oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from qcfractal_spark.functions import text as tx

NATURAL = "the quick brown fox jumps over the lazy dog and then "
SHUFFLED = "dog the fox lazy then jumps the and brown quick over "


def _docs(spark):
    rows = [(i, NATURAL * 5) for i in range(4)] + [(99, SHUFFLED * 5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_same_unigram_profile(spark):
    """Precondition: the junk doc is a token-multiset permutation of a
    natural doc — the unigram model sees identical documents."""
    df = _docs(spark).select(
        "doc_id", F.array_sort(tx.tokens(F.col("text"))).alias("sorted_toks")
    )
    rows = {r["doc_id"]: r["sorted_toks"] for r in df.collect()}
    assert rows[99] == rows[0]


def test_bigram_lm_separates_shuffled_junk(spark):
    scores = {
        r["doc_id"]: r["mean_nll"] for r in tx.bigram_lm_scores(_docs(spark)).collect()
    }
    nat = [scores[i] for i in range(4)]
    junk = scores[99]
    # natural copies score identically (same transitions), junk is
    # decisively worse — the margin is structural, not noise-sized
    assert len(set(nat)) == 1
    assert junk > nat[0] + 1.0, (junk, nat[0])


def test_short_docs_drop_out(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, None), (4, "two words two words")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.bigram_lm_scores(df).collect()}
    assert set(out) == {4}
    assert out[4]["n_bigrams"] == 3
