"""pipe_funnel — the stage-retention report must agree with the pipeline
it reports on: monotone non-increasing counts, stage 3 equal to
pipe_prepare's output cardinality, 100% retention at stage 0."""

from __future__ import annotations

from qcfractal_spark.queries import REGISTRY

from conftest import SF_SMOKE


def test_funnel_is_monotone_and_consistent(spark):
    fn, _ = REGISTRY["pipe_funnel"]
    rows = sorted(fn(spark, SF_SMOKE).collect(), key=lambda r: r["stage"])
    assert [r["stage"] for r in rows] == [0, 1, 2, 3]
    counts = [r["n_docs"] for r in rows]
    toks = [r["sum_tokens"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert abs(rows[0]["retained_pct"] - 100.0) < 1e-9
    prep_fn, _ = REGISTRY["pipe_prepare"]
    assert rows[3]["n_docs"] == prep_fn(spark, SF_SMOKE).count()
