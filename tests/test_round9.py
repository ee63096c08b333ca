"""Round-9 additions: t13 thread-assembly MAX_TURNS cap (the gapless-
firehose bound, VERDICT r8 item 2), plus contracts for the round's new
operators as they land."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from qcfractal_spark.queries import T13_MAX_TURNS, assemble_threads


def _firehose(spark, n_events: int, gap_s: int = 10):
    """One user emitting an event every gap_s seconds — no 30-min gap ever,
    so the whole stream is ONE session (the class the cap exists for)."""
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, i, f"e{i % 3}", base + datetime.timedelta(seconds=i * gap_s))
        for i in range(n_events)
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, ts timestamp"
    )


def test_t13_gapless_firehose_is_capped(spark):
    n = T13_MAX_TURNS * 3  # one session, 3x over the cap
    out = assemble_threads(_firehose(spark, n)).collect()
    assert len(out) == 1  # gapless => one session
    row = out[0]
    assert row["n_turns"] == n  # full count survives for downstream filters
    assert row["overflow"] is True
    # the thread string holds exactly the FIRST MAX_TURNS turns
    parts = row["thread"].split("|")
    assert len(parts) == T13_MAX_TURNS
    assert parts == [f"e{i % 3}" for i in range(T13_MAX_TURNS)]
    # session extent still spans the whole session, not the kept prefix
    assert (row["last_ts"] - row["first_ts"]).total_seconds() == (n - 1) * 10


def test_t13_under_cap_sessions_unchanged(spark):
    """Sessions below the cap keep the full thread and overflow=False, and
    a >30-min gap still splits sessions with the cap logic in place."""
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(1, i, "a", base + datetime.timedelta(seconds=i * 10)) for i in range(5)]
    rows += [
        (1, 100 + i, "b", base + datetime.timedelta(hours=2, seconds=i * 10))
        for i in range(3)
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, ts timestamp"
    )
    out = {r["session_idx"]: r for r in assemble_threads(ev).collect()}
    assert len(out) == 2
    assert out[1]["thread"] == "a|a|a|a|a" and out[1]["overflow"] is False
    assert out[2]["thread"] == "b|b|b" and out[2]["n_turns"] == 3


def test_t13_collect_is_bounded_in_plan(spark):
    """The physical plan's collect_list input is the when()-guarded struct —
    no unconditional whole-session buffer survives in the agg."""
    df = assemble_threads(_firehose(spark, 10))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" in plan
    assert "CASE WHEN" in plan  # the rk<=cap guard reached the aggregate
