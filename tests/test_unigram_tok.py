"""functions/text.py unigram-LM tokenizer (VERDICT r10 item 6) —
SentencePiece-style hard-EM induction: Viterbi-DP invariants,
determinism, EM reweighting behavior, and the headline comparison —
unigram reconstructs frequent words at LOWER pieces/word than BPE at
equal vocabulary (BPE builds bottom-up from adjacent pairs; unigram
selects any substring directly).  Registry parity vs the unrolled-CTE
DuckDB oracle is covered by test_queries_oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from qcfractal_spark.functions.text import (
    UNIGRAM_PARAMS,
    _unigram_learn,
    _viterbi_ps,
    bpe_encode_stats,
    unigram_encode_report,
    unigram_token_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_learns_frequent_words_as_whole_pieces(spark):
    docs = _docs(
        spark,
        ["the cat sat on the mat the cat ran",
         "a cat and a mat and a hat",
         "the hat sat on the cat mat hat"],
    )
    top = unigram_token_stats(docs).collect()
    by_piece = {r["piece"]: r["n"] for r in top}
    # whole frequent words become single pieces with their corpus counts
    assert by_piece.get("the") == 5
    assert by_piece.get("cat") == 4
    # ranks are dense from 1 and ordered by (n desc, piece asc)
    ranks = [r["rank"] for r in top]
    assert ranks == list(range(1, len(top) + 1))
    keys = [(-r["n"], r["piece"]) for r in top]
    assert keys == sorted(keys)


def test_deterministic(spark):
    docs = _docs(spark, ["alpha beta alpha gamma beta alpha"] * 3)
    a = [(r["rank"], r["piece"], r["n"]) for r in unigram_token_stats(docs).collect()]
    b = [(r["rank"], r["piece"], r["n"]) for r in unigram_token_stats(docs).collect()]
    assert a == b


def test_viterbi_prefers_cheaper_segmentation_and_tie_breaks_long(spark):
    """With uniform costs the DP must prefer FEWER pieces (each piece
    adds one cost) and, on exact ties, the longest last piece."""
    wt = spark.createDataFrame([("abab", 1)], "word string, freq long")
    pieces = spark.createDataFrame(
        [("a", "5.0"), ("b", "5.0"), ("ab", "5.0"), ("abab", "5.0")],
        "piece string, cost string",
    ).select("piece", F.col("cost").cast("decimal(28,9)").alias("cost"))
    out = _viterbi_ps(wt, pieces).collect()
    assert out[0]["ps"] == ["abab"]  # 1 piece beats 2x'ab' beats 4 singles


def test_em_reweights_toward_used_pieces(spark):
    """After EM, pieces used by best segmentations carry counts; unused
    seeds drop to the smoothing floor — and every word is exactly
    covered (sum of piece lengths = word length, weighted)."""
    docs = _docs(spark, ["raft road raft rose raft raft"] * 2)
    wt, pieces, stats = _unigram_learn(docs)
    seg = _viterbi_ps(wt, pieces)
    cover = seg.select(
        "word",
        F.aggregate(
            "ps", F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("plen"),
        F.length("word").alias("wlen"),
    ).collect()
    assert all(r["plen"] == r["wlen"] for r in cover)
    by = {r["piece"]: r["n"] for r in stats.collect()}
    # the dominant word (within max_piece_len) is a single piece
    assert by.get("raft", 0) >= 8


def test_beats_bpe_at_equal_vocab(spark):
    """The VERDICT criterion: at EQUAL vocabulary size, the learned
    unigram pieces reconstruct frequent words at LOWER pieces/word than
    BPE.  Corpus: 'abc' x100 — BPE with ONE merge can only reach
    'ab'+'c' (merges compose adjacent pairs bottom-up), while unigram's
    count*length seed scoring selects 'abc' directly (300 vs 200).
    Vocab sizes match: chars + 1 multi-char unit on both sides."""
    docs = _docs(spark, ["abc " * 20] * 5)  # 100 occurrences of 'abc'
    uni = {"seed_cap": 1, "rounds": 2}
    uni_rep = unigram_encode_report(docs, uni).collect()
    bpe_rep = bpe_encode_stats(docs, n_merges=1).collect()

    def ppw(rows):
        tp = sum(r["total_pieces"] for r in rows)
        tf = sum(r["total_freq"] for r in rows)
        return tp / tf

    uni_ppw, bpe_ppw = ppw(uni_rep), ppw(bpe_rep)
    assert uni_ppw == 1.0  # 'abc' is one piece
    assert bpe_ppw == 2.0  # 'ab' + 'c'
    assert uni_ppw < bpe_ppw


def test_long_words_excluded_from_training(spark):
    p = UNIGRAM_PARAMS["max_word_len"]
    docs = _docs(spark, ["short " + "x" * (p + 5) + " short"])
    wt, _pieces, _stats = _unigram_learn(docs)
    words = {r["word"] for r in wt.collect()}
    assert "short" in words and "x" * (p + 5) not in words
