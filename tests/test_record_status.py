"""Record status mutations as MutableTable ops (operators/record_status.py)
— the user-callable arm of the o11 transition algebra (reference
record_socket.py:1190-1400, backup table record_db_models.py:67-82).
Registry parity is covered by s13_status_mutations; these tests pin the
backup-stack semantics and cross-check every (op, status) cell against
the hash-green status_transition_replay matrix."""

from __future__ import annotations

import pytest

from qcfractal_spark.operators.record_status import RecordStatusTable

# one record per status, all non-service; task columns mirror the
# reference's task lifecycle (waiting: available; running/error: held;
# complete/cancelled/invalid/deleted: no task row)
FIXTURE = [
    (1, "waiting", False, None, "t0", 1, True),
    (2, "running", False, "m1", "t1", 2, False),
    (3, "complete", False, None, None, None, None),
    (4, "error", False, None, "t2", 0, False),
    (5, "cancelled", False, None, None, None, None),
    (6, "invalid", False, None, None, None, None),
    (7, "deleted", False, None, None, None, None),
    (8, "waiting", True, None, None, None, None),  # service
]


def _table(spark, tmp_path, rows=FIXTURE):
    t = RecordStatusTable(spark, str(tmp_path / "rs"))
    from qcfractal_spark.operators.record_status import RECORD_SCHEMA

    t.init(spark.createDataFrame(rows, RECORD_SCHEMA))
    return t


def _by_id(t):
    return {r["record_id"]: r.asDict() for r in t.read().collect()}


def _backups(t):
    return {
        (r["record_id"], r["seq"]): r.asDict() for r in t.read_backup().collect()
    }


def test_cancel_applicability_demotion_and_backup(spark, tmp_path):
    t = _table(spark, tmp_path)
    meta = t.cancel([1, 2, 3, 4])
    # complete (id 3) rejected; waiting/running/error cancelled
    assert meta["updated_idx"] == [0, 1, 3]
    assert [i for i, _ in meta["errors"]] == [2]
    got = _by_id(t)
    for rid in (1, 2, 4):
        assert got[rid]["status"] == "cancelled"
        assert got[rid]["manager_name"] is None
        assert got[rid]["compute_tag"] is None  # task deleted
        assert got[rid]["task_available"] is None
    assert got[3]["status"] == "complete"
    bk = _backups(t)
    # running demoted BEFORE backup: id 2's pre-image says waiting
    assert bk[(1, 1)]["old_status"] == "waiting" and bk[(1, 1)]["old_compute_tag"] == "t0"
    assert bk[(2, 1)]["old_status"] == "waiting" and bk[(2, 1)]["old_compute_tag"] == "t1"
    assert bk[(4, 1)]["old_status"] == "error" and bk[(4, 1)]["old_compute_priority"] == 0
    assert (3, 1) not in bk


def test_uncancel_restores_task_from_backup(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.cancel([1, 2, 4])
    meta = t.uncancel([1, 2, 3, 4])
    assert meta["n_updated"] == 3  # id 3 was never cancelled
    got = _by_id(t)
    # waiting: task recreated, available again
    assert got[1]["status"] == "waiting" and got[1]["compute_tag"] == "t0"
    assert got[1]["task_available"] is True
    # running was demoted at cancel time: restores to WAITING, not running
    assert got[2]["status"] == "waiting" and got[2]["compute_tag"] == "t1"
    assert got[2]["task_available"] is True and got[2]["manager_name"] is None
    # error: task recreated but not available
    assert got[4]["status"] == "error" and got[4]["compute_tag"] == "t2"
    assert got[4]["task_available"] is False
    assert _backups(t) == {}  # every backup popped


def test_invalidate_and_uninvalidate_no_task_for_complete(spark, tmp_path):
    t = _table(spark, tmp_path)
    assert t.invalidate([3, 1])["n_updated"] == 1  # only complete applies
    got = _by_id(t)
    assert got[3]["status"] == "invalid" and got[1]["status"] == "waiting"
    t.uninvalidate([3])
    got = _by_id(t)
    # complete is not waiting/error: no task is recreated
    assert got[3]["status"] == "complete" and got[3]["compute_tag"] is None


def test_soft_delete_undelete_roundtrip_and_stacking(spark, tmp_path):
    t = _table(spark, tmp_path)
    # stack: cancel(1) then delete(1) -> two backup rows, seq 1 and 2
    t.cancel([1])
    t.delete([1, 3, 5])
    got = _by_id(t)
    assert {got[i]["status"] for i in (1, 3, 5)} == {"deleted"}
    bk = _backups(t)
    assert bk[(1, 1)]["old_status"] == "waiting"
    assert bk[(1, 2)]["old_status"] == "cancelled"
    assert bk[(3, 1)]["old_status"] == "complete"
    assert bk[(5, 1)]["old_status"] == "cancelled"
    # undelete pops the LAST entry: 1 -> cancelled (not waiting)
    t.undelete([1, 3, 5])
    got = _by_id(t)
    assert got[1]["status"] == "cancelled"
    assert got[3]["status"] == "complete"
    assert got[5]["status"] == "cancelled"
    # and uncancel(1) pops the remaining entry back to waiting w/ task
    t.uncancel([1])
    got = _by_id(t)
    assert got[1]["status"] == "waiting" and got[1]["compute_tag"] == "t0"
    assert _backups(t) == {}


def test_delete_already_deleted_rejected(spark, tmp_path):
    t = _table(spark, tmp_path)
    meta = t.delete([7])
    assert meta["n_updated"] == 0 and len(meta["errors"]) == 1


def test_hard_delete_removes_rows_and_backup_stack(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.cancel([1])
    meta = t.delete([1, 99], soft_delete=False)
    assert meta["n_updated"] == 1 and [i for i, _ in meta["errors"]] == [1]
    assert 1 not in _by_id(t)
    assert _backups(t) == {}


def test_reset_error_to_waiting_preserves_task(spark, tmp_path):
    t = _table(spark, tmp_path)
    meta = t.reset([4, 2, 3])  # only error applies to reset
    assert meta["n_updated"] == 1
    got = _by_id(t)
    assert got[4]["status"] == "waiting" and got[4]["compute_tag"] == "t2"
    assert got[4]["task_available"] is True and got[4]["manager_name"] is None
    assert got[2]["status"] == "running"  # reset() does not touch running


def test_reset_running_recycles_to_waiting(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.reset_running([2])
    got = _by_id(t)
    assert got[2]["status"] == "waiting" and got[2]["manager_name"] is None
    assert got[2]["task_available"] is True and got[2]["compute_tag"] == "t1"


def test_service_records_cancel_without_task_churn(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.cancel([8])
    got = _by_id(t)
    assert got[8]["status"] == "cancelled"
    t.uncancel([8])
    got = _by_id(t)
    # restored to waiting but NO task is created for a service
    assert got[8]["status"] == "waiting" and got[8]["compute_tag"] is None
    assert got[8]["task_available"] is None


@pytest.mark.parametrize("op", ["delete", "cancel", "invalidate", "reset"])
def test_matrix_matches_o11_transition_replay(spark, tmp_path, op):
    """Every (op, status) cell of the mutation table must land exactly
    where the hash-green o11 status_transition_replay algebra says —
    forward outcome AND the post-revert state."""
    from qcfractal_spark.operators.diagnostics import status_transition_replay

    statuses = ["waiting", "running", "complete", "error", "cancelled", "invalid", "deleted"]
    replay = {
        (r["op"], r["original_status"]): r.asDict()
        for r in status_transition_replay(
            spark.createDataFrame(
                [(op, s) for s in statuses], "op string, status string"
            )
        ).collect()
    }
    revert = {"delete": "undelete", "cancel": "uncancel", "invalidate": "uninvalidate"}
    for i, status in enumerate(statuses):
        rows = [FIXTURE_BY_STATUS[status]]
        t = _table(spark, tmp_path / f"{op}_{i}", rows)
        rid = rows[0][0]
        getattr(t, op)([rid])
        expect = replay[(op, status)]
        got = _by_id(t)[rid]
        assert got["status"] == expect["after_forward"], (op, status)
        if expect["outcome"] == "updated" and op != "reset":
            bk = _backups(t)
            assert bk[(rid, 1)]["old_status"] == expect["backup_status"], (op, status)
        if op != "reset":  # reset has no inverse
            getattr(t, revert[op])([rid])
        got = _by_id(t)[rid]
        assert got["status"] == expect["after_revert"], (op, status)


FIXTURE_BY_STATUS = {r[1]: r for r in FIXTURE if not r[2]}


def test_propagation_matches_reference_directions(spark, tmp_path):
    """Propagation (record_socket.py:1005-1008, 1126-1135): forward ops
    reach all RELATIVES with *_children=True and parents-only otherwise;
    reverts always reach children, never parents."""
    # tree: 10 -> 11 -> 12 (service parent, child, grandchild), sibling 13
    rows = [
        (10, "waiting", True, None, None, None, None),
        (11, "waiting", False, None, "t0", 1, True),
        (12, "waiting", False, None, "t1", 1, True),
        (13, "waiting", False, None, "t2", 1, True),  # unrelated
    ]
    edges = spark.createDataFrame(
        [(10, 11), (11, 12)], "parent_id long, child_id long"
    )
    from qcfractal_spark.operators.record_status import (
        RECORD_SCHEMA,
        RecordStatusTable,
    )

    def fresh(name):
        t = RecordStatusTable(spark, str(tmp_path / name), edges=edges)
        t.init(spark.createDataFrame(rows, RECORD_SCHEMA))
        return t

    # cancel mid-tree with children: relatives = whole family, not 13
    t = fresh("a")
    meta = t.cancel([11], cancel_children=True)
    got = _by_id(t)
    assert [got[i]["status"] for i in (10, 11, 12)] == ["cancelled"] * 3
    assert got[13]["status"] == "waiting"
    # n_children_updated analog: 1 requested landed, 2 relatives extra
    assert meta["n_updated"] == 1 and meta["updated_idx"] == [0]
    # uncancel the grandchild only: children-only propagation means the
    # PARENT (11) stays cancelled while 12 reverts
    t.uncancel([12])
    got = _by_id(t)
    assert got[12]["status"] == "waiting" and got[11]["status"] == "cancelled"
    assert got[10]["status"] == "cancelled"

    # cancel_children=False still reaches PARENTS (10, 11) but not child 12
    t = fresh("b")
    t.cancel([11], cancel_children=False)
    got = _by_id(t)
    assert got[10]["status"] == "cancelled" and got[11]["status"] == "cancelled"
    assert got[12]["status"] == "waiting"

    # uncancel with children: parent revert pulls the child back too
    t = fresh("c")
    t.cancel([10], cancel_children=True)
    t.uncancel([10])
    got = _by_id(t)
    assert [got[i]["status"] for i in (10, 11, 12)] == ["waiting"] * 3
    # non-service children got their tasks back
    assert got[11]["compute_tag"] == "t0" and got[11]["task_available"] is True
