"""Internal-jobs lifecycle (streaming/jobs.py; reference
components/internal_jobs/socket.py:65-447, status.py:23-130).  The claim
eligibility SELECT is gated by o7_serial_claim; these tests pin the
lifecycle mutations, and o13_job_lifecycle gates the whole script
against a layered oracle."""

from __future__ import annotations

from qcfractal_spark.streaming.jobs import JOB_SCHEMA, InternalJobTable


def _t(spark, tmp_path):
    t = InternalJobTable(spark, str(tmp_path / "jobs"))
    t.init(spark.createDataFrame([], JOB_SCHEMA))
    return t


def _by_id(t):
    return {r["job_id"]: r.asDict() for r in t.read().collect()}


def test_add_claim_progress_finish_roundtrip(spark, tmp_path):
    t = _t(spark, tmp_path)
    j1 = t.add("iterate", 100, "services.iterate_services", serial_group="svc")
    j2 = t.add("vacuum", 200, "maintenance.vacuum")
    assert (j1, j2) == (1, 2)
    t.claim([j1], runner_uuid="r-1", now=150)
    got = _by_id(t)
    assert got[j1]["status"] == "running" and got[j1]["started_date"] == 150
    assert got[j2]["status"] == "waiting"
    # progress only touches RUNNING jobs, clamped to [0, 100]
    t.update_progress([j1, j2], 150, "over", now=160)
    got = _by_id(t)
    assert got[j1]["progress"] == 100 and got[j1]["progress_description"] == "over"
    assert got[j2]["progress"] == 0 and got[j2]["last_updated"] is None
    t.update_progress([j1], 42, "halfway", now=170)
    assert _by_id(t)[j1]["progress"] == 42
    t.finish([j1], now=180, result='{"ok": true}')
    got = _by_id(t)[j1]
    assert got["status"] == "complete" and got["progress"] == 100
    assert got["progress_description"] == "Complete"
    assert got["ended_date"] == 180 and got["result"] == '{"ok": true}'


def test_unique_name_upsert_updates_repeat_delay_keeps_id(spark, tmp_path):
    t = _t(spark, tmp_path)
    j1 = t.add("nightly", 100, "f", unique_name=True, repeat_delay=60)
    j_again = t.add("nightly", 999, "f", unique_name=True, repeat_delay=30,
                    after_function="g")
    assert j_again == j1  # conflict: same id returned
    got = _by_id(t)[j1]
    # schedule/status untouched; after_function/repeat_delay updated
    assert got["scheduled_date"] == 100 and got["status"] == "waiting"
    assert got["repeat_delay"] == 30 and got["after_function"] == "g"
    assert len(_by_id(t)) == 1


def test_complete_releases_unique_name_and_respawns_repeat(spark, tmp_path):
    t = _t(spark, tmp_path)
    j1 = t.add("nightly", 100, "f", unique_name=True, repeat_delay=60,
               serial_group="sg")
    t.claim([j1], "r-1", now=110)
    t.finish([j1], now=120)
    got = _by_id(t)
    assert got[j1]["status"] == "complete" and got[j1]["unique_name"] is None
    # respawned: fresh waiting row at ended+delay, unique flag carried
    respawn = got[j1 + 1]
    assert respawn["status"] == "waiting"
    assert respawn["scheduled_date"] == 180
    assert respawn["unique_name"] == "nightly"
    assert respawn["serial_group"] == "sg" and respawn["repeat_delay"] == 60
    # and the released name is addable again
    j3 = t.add("nightly", 500, "f", unique_name=True)
    assert j3 == j1 + 1  # upserts onto the respawned row


def test_error_finish_keeps_progress_and_skips_respawn(spark, tmp_path):
    t = _t(spark, tmp_path)
    j1 = t.add("flaky", 100, "f", repeat_delay=60)
    t.claim([j1], "r-1", now=110)
    t.update_progress([j1], 30, "working", now=115)
    t.finish([j1], now=120, result="Traceback ...", error=True)
    got = _by_id(t)
    assert got[j1]["status"] == "error" and got[j1]["result"] == "Traceback ..."
    assert got[j1]["progress"] == 30  # not forced to 100 on error
    assert len(got) == 1  # no respawn on error


def test_cancel_only_waiting_or_running(spark, tmp_path):
    t = _t(spark, tmp_path)
    j1 = t.add("a", 100, "f")
    j2 = t.add("b", 100, "f")
    j3 = t.add("c", 100, "f")
    t.claim([j2, j3], "r-1", now=110)
    t.finish([j3], now=120)
    t.cancel([j1, j2, j3])
    got = _by_id(t)
    assert got[j1]["status"] == "cancelled"  # waiting -> cancelled
    assert got[j2]["status"] == "cancelled"  # running -> cancelled
    assert got[j3]["status"] == "complete"  # finished: untouched


def test_runner_stop_reset_clears_only_that_runner(spark, tmp_path):
    t = _t(spark, tmp_path)
    j1 = t.add("a", 100, "f")
    j2 = t.add("b", 100, "f")
    t.claim([j1], "r-1", now=110)
    t.claim([j2], "r-2", now=110)
    t.update_progress([j1], 50, "half", now=115)
    t.runner_stop_reset("r-1")
    got = _by_id(t)
    assert got[j1]["status"] == "waiting" and got[j1]["progress"] == 0
    assert got[j1]["runner_uuid"] is None and got[j1]["started_date"] is None
    assert got[j2]["status"] == "running" and got[j2]["runner_uuid"] == "r-2"


def test_delete_and_retention_sweep(spark, tmp_path):
    t = _t(spark, tmp_path)
    j1 = t.add("a", 100, "f")
    j2 = t.add("b", 100, "f")
    j3 = t.add("c", 100, "f")
    j4 = t.add("d", 100, "f")
    t.claim([j1, j2], "r-1", now=110)
    t.finish([j1], now=120)
    t.finish([j2], now=500, result="tb", error=True)
    t.cancel([j3])  # waiting-cancel: NO ended_date, retention never sweeps it
    t.delete([j4])
    assert j4 not in _by_id(t)
    t.delete_old(before=300)
    got = _by_id(t)
    assert j1 not in got  # complete, ended 120 < 300
    assert got[j2]["status"] == "error"  # ended 500 >= 300: kept
    assert got[j3]["status"] == "cancelled"  # NULL ended_date: kept
