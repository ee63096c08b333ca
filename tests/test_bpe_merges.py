"""functions/text.py:bpe_merges — BPE merge-pair vocabulary induction
(VERDICT r9 item 4): learned merges must reconstruct the corpus's
frequent words as single tokens, greedy left-to-right run semantics must
match the bracketed-replace construction, and ties must break
lexicographically.  Registry parity vs the unrolled-CTE DuckDB oracle is
covered by test_queries_oracle."""

from __future__ import annotations

from qcfractal_spark.functions.text import apply_bpe, bpe_merges


def _learn(spark, rows, n):
    df = spark.createDataFrame(
        list(enumerate(rows)), "doc_id long, text string"
    )
    return [
        (r["rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_merges(df, n_merges=n).collect()
    ]


def test_learned_merges_reconstruct_frequent_words(spark):
    """The classic Sennrich construction: a corpus dominated by a few
    word types must yield merges that rebuild those words — encoding the
    most frequent word with the learned table gives ONE token."""
    corpus = (["low"] * 50 + ["lower"] * 30 + ["newest"] * 60 + ["widest"] * 30)
    out = _learn(spark, [" ".join(corpus)] * 2, 12)
    assert out[0][0] == 1 and len(out) == 12
    table = [(l, r) for _, l, r, _ in out]
    # the dominant word types collapse to single symbols
    assert apply_bpe("newest", table) == ["newest"]
    assert apply_bpe("low", table) == ["low"]
    # a shared suffix learned from newest/widest transfers to unseen words
    assert "est" in {l + r for l, r in table} or ["est"] == apply_bpe(
        "est", table
    )


def test_merge_counts_are_frequency_weighted_and_ordered(spark):
    out = _learn(spark, ["aa ab aa ab aa"] * 3, 3)
    # pair counts never increase with rank (a merged pair's count was the
    # max at its round)
    counts = [c for *_ignore, c in out]
    assert counts == sorted(counts, reverse=True)


def test_greedy_run_semantics(spark):
    """Counting sees every adjacent position (Sennrich get_stats counts
    overlapping pairs: 'aaaa' -> 3), but the MERGE is greedy left-to-right
    non-overlapping: [aa, aa], never a chain."""
    out = _learn(spark, ["aaaa aaaa aaaa"], 1)
    assert out[0][1:3] == ("a", "a")
    assert out[0][3] == 9  # 3 occurrences x 3 adjacent (overlapping) pairs
    assert apply_bpe("aaaa", [("a", "a")]) == ["aa", "aa"]
    assert apply_bpe("aaa", [("a", "a")]) == ["aa", "a"]


def test_tie_break_is_lexicographic(spark):
    """'xy' and 'zw' both appear twice: the (x,y) pair wins on ASCII
    order, deterministically in both engines."""
    out = _learn(spark, ["xy zw xy zw"], 1)
    assert out[0][1:3] == ("x", "y")


def test_encode_stats_compression_is_monotone(spark):
    """bpe_encode_stats: more merges never INCREASE the total emitted
    pieces, and with enough merges the dominant word collapses to one
    piece (its piece-count bucket 1 carries its frequency)."""
    from qcfractal_spark.functions.text import bpe_encode_stats

    rows = [" ".join(["newest"] * 40 + ["low"] * 20 + ["wide"] * 10)] * 2
    df = spark.createDataFrame(
        list(enumerate(rows)), "doc_id long, text string"
    )

    def total_pieces(n):
        out = bpe_encode_stats(df, n_merges=n).collect()
        return sum(r["total_pieces"] for r in out), {
            r["n_pieces"]: r["total_freq"] for r in out
        }

    t0, _ = total_pieces(0)
    t3, _ = total_pieces(3)
    t8, by = total_pieces(8)
    assert t0 >= t3 >= t8
    assert t0 == sum(len(w) for w in ("newest " * 80 + "low " * 40 + "wide " * 20).split())
    # after 8 merges the 3 word types (5+2+3 merges needed) are single pieces
    assert by.get(1, 0) >= 80  # at least every 'newest' occurrence


def test_exhausted_corpus_stops_early(spark):
    """Single-letter words have no pairs: the merge table is empty even
    when more rounds were requested."""
    out = _learn(spark, ["a b c a b c"], 5)
    assert out == []
