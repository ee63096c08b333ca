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


def test_null_programs_is_missing_task_even_with_tag(spark):
    """r13 ADVICE: the reference short-circuits to 'Missing task' when
    rec_tag is None OR rec_programs is None (record_socket.py:1606) — a
    record with a tag but NULL required_programs must not reach the
    manager walk (size(NULL)=-1 would classify it wrong_tag/busy), and
    must produce zero detail rows."""
    from qcfractal_spark.operators.diagnostics import waiting_reason_details

    recs = [(1, "waiting", False, "t0", None)]  # tag present, programs NULL
    mgrs = [("m1", ["psi4"], ["*"], True)]
    got = _run(spark, recs, mgrs)
    assert got[1]["reason"] == R_MISSING_TASK
    assert (
        got[1]["n_missing_programs"],
        got[1]["n_wrong_tag"],
        got[1]["n_busy"],
    ) == (0, 0, 0)
    assert (
        waiting_reason_details(
            spark.createDataFrame(recs, REC_SCHEMA),
            spark.createDataFrame(mgrs, MGR_SCHEMA),
        ).count()
        == 0
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


def _reference_details(rec_tag, rec_programs, managers):
    """Driver-side replay of the reference's detail loop
    (record_socket.py:1617-1626) with the set repr canonicalized to
    sorted order — the deterministic member of the reference's
    hash-ordered output class."""
    out = {}
    rec_programs = set(rec_programs)
    for m_name, m_programs, m_tags, m_active in managers:
        if not m_active:
            continue
        missing = sorted(rec_programs - set(m_programs))
        if missing:
            rendered = "{" + ", ".join(f"'{p}'" for p in missing) + "}"
            out[m_name] = f"Manager missing programs: {rendered}"
        elif rec_tag not in m_tags and "*" not in m_tags:
            out[m_name] = f'Manager does not handle tag "{rec_tag}"'
        else:
            out[m_name] = "Manager is busy"
    return out


def test_details_byte_match_reference_formats(spark):
    """r12 VERDICT item 3: waiting_reason_details emits the reference's
    per-manager detail strings byte-for-byte (sorted set rendering),
    covering all three verdicts plus the multi-element missing set."""
    from qcfractal_spark.operators.diagnostics import waiting_reason_details

    mgrs = [
        ("m1", ["psi4"], ["t0"], True),          # missing dftd3+mp2
        ("m2", ["psi4", "dftd3", "mp2"], ["t9"], True),  # wrong tag
        ("m3", ["psi4", "dftd3", "mp2"], ["*"], True),   # busy
        ("m4", ["psi4", "dftd3", "mp2"], ["*"], False),  # inactive: absent
    ]
    recs = [(1, "waiting", False, "t0", ["psi4", "mp2", "dftd3"])]
    got = {
        r["m_name"]: r["detail"]
        for r in waiting_reason_details(
            spark.createDataFrame(recs, REC_SCHEMA),
            spark.createDataFrame(mgrs, MGR_SCHEMA),
        ).collect()
    }
    want = _reference_details("t0", ["psi4", "mp2", "dftd3"], mgrs)
    assert got == want
    assert got["m1"] == "Manager missing programs: {'dftd3', 'mp2'}"
    assert got["m2"] == 'Manager does not handle tag "t0"'
    assert got["m3"] == "Manager is busy"
    assert "m4" not in got

    # short-circuited records produce no detail rows (reference returns
    # a bare reason before the manager walk)
    early = [
        (2, "waiting", True, "t0", ["psi4"]),
        (3, "complete", False, "t0", ["psi4"]),
        (4, "waiting", False, None, None),
    ]
    assert (
        waiting_reason_details(
            spark.createDataFrame(early, REC_SCHEMA),
            spark.createDataFrame(mgrs, MGR_SCHEMA),
        ).count()
        == 0
    )


def test_counts_fold_managers_into_classes(spark):
    """r12 VERDICT nit 2: the counts fold pre-aggregates managers into
    distinct (programs, tags) classes — a fleet of identical managers
    contributes ONE pair row weighted by multiplicity, and the counts
    still report per-MANAGER totals."""
    from pyspark.sql import functions as F

    mgrs = [
        (f"m{i}", ["psi4"], ["*"], True) for i in range(7)  # one class ×7
    ] + [
        ("mx", ["psi4", "dftd3"], ["t9"], True),  # second class ×1
    ]
    recs = [(1, "waiting", False, "t0", ["psi4", "dftd3"])]
    rec_df = spark.createDataFrame(recs, REC_SCHEMA)
    out = _run(spark, recs, mgrs)
    # 7 identical managers each miss dftd3; mx has the programs but the
    # wrong tag
    assert out[1]["n_missing_programs"] == 7
    assert out[1]["n_wrong_tag"] == 1
    assert out[1]["reason"] == R_NO_MATCH

    # the executed plan's broadcast side is the CLASS relation: its
    # aggregate folds 8 manager rows to 2 before the record join
    df = waiting_reasons(rec_df, spark.createDataFrame(mgrs, MGR_SCHEMA))
    classes = (
        spark.createDataFrame(mgrs, MGR_SCHEMA)
        .where(F.col("m_active"))
        .groupBy("m_programs", "m_tags")
        .count()
    )
    assert classes.count() == 2
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" in plan  # the class fold is in the plan, pre-join
