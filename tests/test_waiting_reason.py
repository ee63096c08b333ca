"""Waiting-reason diagnostic (operators/diagnostics.py) — mirrors the
reference's test cases for RecordSocket.get_waiting_reason
(record_socket.py:1574-1629): no managers / missing programs / wrong
tag / busy, plus the early short-circuits (service, not waiting,
missing task).  Registry parity vs DuckDB is covered by
test_queries_oracle on o8_waiting_reason."""

from __future__ import annotations

from qcfractal_spark.operators.diagnostics import (
    R_FREE_MANAGER,
    R_MISSING_TASK,
    R_NO_MANAGERS,
    R_NO_MATCH,
    R_NOT_WAITING,
    R_SERVICE,
    waiting_reasons,
)

REC_SCHEMA = (
    "record_id long, status string, is_service boolean, "
    "compute_tag string, required_programs array<string>"
)
MGR_SCHEMA = (
    "m_name string, m_programs array<string>, m_tags array<string>, "
    "m_active boolean"
)


def _run(spark, recs, mgrs):
    out = waiting_reasons(
        spark.createDataFrame(recs, REC_SCHEMA),
        spark.createDataFrame(mgrs, MGR_SCHEMA),
    ).collect()
    return {r["record_id"]: r.asDict() for r in out}


def test_early_short_circuits(spark):
    got = _run(
        spark,
        [
            (1, "waiting", True, "t0", ["psi4"]),  # service
            (2, "complete", False, "t0", ["psi4"]),  # not waiting
            (3, "waiting", False, None, None),  # missing task
        ],
        [("m1", ["psi4"], ["*"], True)],
    )
    assert got[1]["reason"] == R_SERVICE
    assert got[2]["reason"] == R_NOT_WAITING
    assert got[3]["reason"] == R_MISSING_TASK
    # short-circuited records never reach the manager walk
    assert all(
        got[i][c] == 0
        for i in (1, 2, 3)
        for c in ("n_missing_programs", "n_wrong_tag", "n_busy")
    )


def test_no_active_managers(spark):
    recs = [(1, "waiting", False, "t0", ["psi4"])]
    # zero managers at all, and only-inactive managers, both classify
    assert _run(spark, recs, [])[1]["reason"] == R_NO_MANAGERS
    got = _run(spark, recs, [("m1", ["psi4"], ["*"], False)])
    assert got[1]["reason"] == R_NO_MANAGERS


def test_missing_programs_and_wrong_tag_yield_no_match(spark):
    got = _run(
        spark,
        [(1, "waiting", False, "t9", ["psi4", "mp2"])],
        [
            ("m1", ["psi4"], ["*"], True),  # missing mp2
            ("m2", ["psi4", "mp2"], ["t0"], True),  # wrong tag
        ],
    )
    r = got[1]
    assert r["reason"] == R_NO_MATCH
    assert (r["n_missing_programs"], r["n_wrong_tag"], r["n_busy"]) == (1, 1, 0)


def test_busy_manager_means_waiting_for_free(spark):
    got = _run(
        spark,
        [(1, "waiting", False, "t0", ["psi4"])],
        [
            ("m1", ["psi4"], ["t0"], True),  # capable: busy
            ("m2", ["dftd3"], ["*"], True),  # missing programs
        ],
    )
    r = got[1]
    assert r["reason"] == R_FREE_MANAGER
    assert (r["n_missing_programs"], r["n_wrong_tag"], r["n_busy"]) == (1, 0, 1)


def test_star_tag_matches_any(spark):
    got = _run(
        spark,
        [(1, "waiting", False, "weird_tag", ["psi4"])],
        [("m1", ["psi4"], ["*"], True)],
    )
    assert got[1]["reason"] == R_FREE_MANAGER
