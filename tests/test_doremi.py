"""functions/packing.py:doremi_weights — the DoReMi exponentiated-
gradient mixture update: hard domains gain weight monotonically in
excess loss, weights renormalize to 1, the smoothing floor keeps every
domain alive, and zero excess is a fixed point.  Registry parity vs the
unrolled-CTE oracle is covered by test_queries_oracle."""

from __future__ import annotations

from qcfractal_spark.functions.packing import doremi_weights


def _dom(spark, rows):
    return spark.createDataFrame(rows, "source string, loss double, excess double")


def test_upweights_hard_domains_monotonically(spark):
    dom = _dom(
        spark,
        [("easy", 5.0, 0.0), ("mid", 6.0, 0.5), ("hard", 7.0, 1.5)],
    )
    out = {r["source"]: r["weight"] for r in doremi_weights(dom).collect()}
    assert out["hard"] > out["mid"] > out["easy"]
    assert abs(sum(out.values()) - 1.0) < 1e-6


def test_zero_excess_is_uniform_fixed_point(spark):
    dom = _dom(spark, [(f"s{i}", 5.0, 0.0) for i in range(4)])
    out = [r["weight"] for r in doremi_weights(dom).collect()]
    assert all(abs(w - 0.25) < 1e-6 for w in out)


def test_smoothing_floor_keeps_domains_alive(spark):
    """One domain vastly harder: after many rounds the easy domains decay
    toward (but never below) the c/K uniform floor."""
    dom = _dom(
        spark, [("hard", 9.0, 5.0)] + [(f"e{i}", 4.0, 0.0) for i in range(3)]
    )
    out = {
        r["source"]: r["weight"]
        for r in doremi_weights(dom, rounds=10, smooth=0.01).collect()
    }
    floor = 0.01 / 4
    assert all(w >= floor - 1e-9 for w in out.values())
    assert out["hard"] > 0.9


def test_deterministic(spark):
    dom = _dom(spark, [("a", 5.0, 0.3), ("b", 6.0, 0.7), ("c", 4.0, 0.0)])
    w1 = [(r["source"], r["weight"]) for r in doremi_weights(dom).collect()]
    w2 = [(r["source"], r["weight"]) for r in doremi_weights(dom).collect()]
    assert w1 == w2
    assert [s for s, _ in w1] == ["a", "b", "c"]  # ordered by source
