"""reap_dead_managers — the heartbeat reap's semantics, mirroring the
reference's contract (managers/socket.py:check_manager_heartbeats /
deactivate, record_socket.py:reset_assigned): only ACTIVE managers past
the cutoff die; only their RUNNING, NON-SERVICE records recycle;
already-inactive managers keep a NULL reason; fresh managers are
untouched."""

from __future__ import annotations

from qcfractal_spark.operators.diagnostics import reap_dead_managers

CUTOFF = 1_000


def _fixture(spark):
    managers = spark.createDataFrame(
        [
            ("m_stale", "active", 500),      # dies: active + stale
            ("m_fresh", "active", 2_000),    # survives: active + fresh
            ("m_gone", "inactive", 100),     # already dead: untouched
            ("m_idle", "active", 400),       # dies with zero assignments
        ],
        "m_name string, m_status string, m_modified_on bigint",
    )
    records = spark.createDataFrame(
        [
            (1, "running", False, "m_stale"),   # recycles
            (2, "running", False, "m_stale"),   # recycles
            (3, "running", True, "m_stale"),    # service: NOT recycled
            (4, "waiting", False, None),        # unassigned: untouched
            (5, "complete", False, "m_stale"),  # not running: untouched
            (6, "running", False, "m_fresh"),   # live manager: untouched
            (7, "running", False, "m_gone"),    # already-dead mgr: this reap
                                                # doesn't re-reap it
        ],
        "record_id long, status string, is_service boolean, manager_name string",
    )
    return managers, records


def test_reap_matrix(spark):
    managers, records = _fixture(spark)
    rows = {r["m_name"]: r for r in reap_dead_managers(managers, records, CUTOFF).collect()}
    assert len(rows) == 4

    stale = rows["m_stale"]
    assert stale["status_after"] == "inactive"
    assert stale["reason"] == "missing heartbeat"
    assert stale["n_recycled"] == 2  # running+non-service only (not 3, not 5)

    fresh = rows["m_fresh"]
    assert fresh["status_after"] == "active"
    assert fresh["reason"] is None
    assert fresh["n_recycled"] == 0

    gone = rows["m_gone"]
    assert gone["status_after"] == "inactive"
    assert gone["reason"] is None  # historical reason is not re-invented
    assert gone["n_recycled"] == 0  # record 7 is NOT recycled by this reap

    idle = rows["m_idle"]
    assert idle["status_after"] == "inactive"
    assert idle["reason"] == "missing heartbeat"
    assert idle["n_recycled"] == 0  # deactivation without assignments


def test_reap_boundary_is_strict(spark):
    """deactivate uses modified_on < cutoff (strictly before) —
    a manager modified exactly AT the cutoff instant survives."""
    managers = spark.createDataFrame(
        [("m_at", "active", CUTOFF), ("m_before", "active", CUTOFF - 1)],
        "m_name string, m_status string, m_modified_on bigint",
    )
    records = spark.createDataFrame(
        [], "record_id long, status string, is_service boolean, manager_name string"
    )
    rows = {r["m_name"]: r for r in reap_dead_managers(managers, records, CUTOFF).collect()}
    assert rows["m_at"]["status_after"] == "active"
    assert rows["m_before"]["status_after"] == "inactive"
