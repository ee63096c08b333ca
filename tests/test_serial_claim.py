"""o7_serial_claim — internal-jobs serial-group eligibility semantics
(reference internal_jobs/socket.py:453-468): NULL-group jobs are always
eligible, groups with a running member are excluded wholesale, ordering
is (scheduled_date, job_id)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _claim(spark, jobs_rows, limit=10):
    jobs = spark.createDataFrame(
        jobs_rows, "job_id long, status string, serial_group string, scheduled_date timestamp"
    )
    running = (
        jobs.where((F.col("status") == "P") & F.col("serial_group").isNotNull())
        .select("serial_group")
        .distinct()
    )
    eligible = jobs.where(F.col("status") == "O").join(
        F.broadcast(running), "serial_group", "left_anti"
    )
    return [
        r["job_id"]
        for r in eligible.orderBy("scheduled_date", "job_id").limit(limit).collect()
    ]


def test_running_group_blocks_waiting_members_and_null_passes(spark):
    d = datetime(2024, 1, 1)
    rows = [
        (1, "O", "a", d),          # blocked: group a has a running member
        (2, "P", "a", d),
        (3, "O", "b", d),          # eligible: b has no running member
        (4, "O", None, d),         # eligible: NULL group always runnable
        (5, "P", None, d),         # running NULL never blocks NULL waiters
        (6, "F", "b", d),          # finished rows are irrelevant
    ]
    assert _claim(spark, rows) == [3, 4]


def test_ordering_is_scheduled_date_then_id(spark):
    rows = [
        (9, "O", None, datetime(2024, 1, 2)),
        (5, "O", None, datetime(2024, 1, 1)),
        (7, "O", None, datetime(2024, 1, 1)),
    ]
    assert _claim(spark, rows) == [5, 7, 9]
