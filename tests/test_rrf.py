"""functions/similarity.py:rrf_fuse — reciprocal-rank fusion semantics:
both-arm ids outrank single-arm ids at similar depth, single-arm ids
still score (full-outer property), determinism and tie-breaks.
Registry parity vs the composed BM25+cosine DuckDB oracle is covered by
test_queries_oracle."""

from __future__ import annotations

from qcfractal_spark.functions.similarity import rrf_fuse


def _ranked(spark, pairs):
    return spark.createDataFrame(pairs, "id long, rank int")


def test_both_arms_beat_single_arm(spark):
    a = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranked(spark, [(2, 1), (4, 2), (5, 3)])
    out = {r["id"]: (r["rank"], r["rrf"]) for r in rrf_fuse(a, b).collect()}
    # id=2 appears in both arms -> 1/62 + 1/61 beats every single-arm id
    assert min(out, key=lambda i: out[i][0]) == 2
    assert out[2][1] > out[1][1]
    # single-arm ids still score exactly 1/(60+rank)
    assert abs(out[4][1] - 1.0 / 62) < 1e-9


def test_full_outer_keeps_disjoint_lists(spark):
    a = _ranked(spark, [(1, 1), (2, 2)])
    b = _ranked(spark, [(10, 1), (20, 2)])
    rows = rrf_fuse(a, b).collect()
    assert {r["id"] for r in rows} == {1, 2, 10, 20}
    # equal rrf ties break on id ascending
    r1 = [r["id"] for r in rows if abs(r["rrf"] - 1.0 / 61) < 1e-9]
    assert r1 == sorted(r1)


def test_rank_columns_carry_arm_provenance(spark):
    a = _ranked(spark, [(1, 1)])
    b = _ranked(spark, [(2, 1)])
    by = {r["id"]: (r["rank_a"], r["rank_b"]) for r in rrf_fuse(a, b).collect()}
    assert by[1] == (1, None)
    assert by[2] == (None, 1)


def test_top_n_and_determinism(spark):
    a = _ranked(spark, [(i, i) for i in range(1, 30)])
    b = _ranked(spark, [(i + 100, i) for i in range(1, 30)])
    out1 = [(r["rank"], r["id"]) for r in rrf_fuse(a, b, top_n=10).collect()]
    out2 = [(r["rank"], r["id"]) for r in rrf_fuse(a, b, top_n=10).collect()]
    assert out1 == out2 and len(out1) == 10
    assert [r for r, _ in out1] == list(range(1, 11))
