"""status_transition_replay — the reference's record status machine
(record_socket.py reset/cancel/invalidate/delete + reverts), pinned on
the cases test_record_status_changes exercises: applicability rejects,
the running→waiting demotion before backup, and backup-exact restore."""

from __future__ import annotations

from qcfractal_spark.operators.diagnostics import status_transition_replay


def _replay(spark, rows):
    df = spark.createDataFrame(rows, "op string, status string")
    out = status_transition_replay(df).collect()
    return {
        (r["op"], r["original_status"]): r for r in out
    }


def test_cancel_matrix_and_running_demotion(spark):
    rows = [
        ("cancel", "waiting"), ("cancel", "running"),
        ("cancel", "error"), ("cancel", "complete"),
        ("cancel", "deleted"),
    ]
    got = _replay(spark, rows)

    w = got[("cancel", "waiting")]
    assert (w["outcome"], w["after_forward"]) == ("updated", "cancelled")
    assert w["backup_status"] == "waiting" and w["after_revert"] == "waiting"

    # the documented subtlety: a RUNNING record demotes to waiting before
    # the backup row is written, so cancel -> uncancel ends at waiting
    r = got[("cancel", "running")]
    assert (r["outcome"], r["after_forward"]) == ("updated", "cancelled")
    assert r["backup_status"] == "waiting"
    assert r["after_revert"] == "waiting"  # never back to running

    assert got[("cancel", "error")]["outcome"] == "updated"
    # complete/deleted are not cancellable
    for s in ("complete", "deleted"):
        rej = got[("cancel", s)]
        assert rej["outcome"] == "rejected"
        assert rej["after_forward"] == s and rej["after_revert"] == s
        assert rej["backup_status"] is None


def test_invalidate_delete_reset_matrices(spark):
    rows = [
        ("invalidate", "complete"), ("invalidate", "waiting"),
        ("delete", "running"), ("delete", "deleted"), ("delete", "invalid"),
        ("reset", "error"), ("reset", "waiting"),
    ]
    got = _replay(spark, rows)

    inv = got[("invalidate", "complete")]
    assert (inv["after_forward"], inv["after_revert"]) == ("invalid", "complete")
    assert got[("invalidate", "waiting")]["outcome"] == "rejected"

    # delete applies to everything except deleted; running demotes first
    d = got[("delete", "running")]
    assert (d["after_forward"], d["backup_status"]) == ("deleted", "waiting")
    assert got[("delete", "deleted")]["outcome"] == "rejected"
    assert got[("delete", "invalid")]["after_revert"] == "invalid"

    # reset: error -> waiting, no backup, no inverse
    rs = got[("reset", "error")]
    assert (rs["outcome"], rs["after_forward"]) == ("updated", "waiting")
    assert rs["backup_status"] is None and rs["after_revert"] == "waiting"
    assert got[("reset", "waiting")]["outcome"] == "rejected"


def test_counts_fold_per_cell(spark):
    rows = [("cancel", "waiting")] * 3 + [("cancel", "complete")] * 2
    got = _replay(spark, rows)
    assert got[("cancel", "waiting")]["n"] == 3
    assert got[("cancel", "complete")]["n"] == 2
