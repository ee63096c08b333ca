"""Waiting-reason diagnostic — "why is my record still waiting?"
(reference record_socket.py:1574-1629, route record_routes.py:72).

The reference answers for ONE record id: outer-join the record to its
task, then walk the active-manager list classifying each manager as
missing-programs / wrong-tag / busy.  The Spark shape is set-oriented
(VERDICT r11 item 3): ALL records classified in one plan — eligible
records LEFT-join the broadcast active-manager table (LEFT so the
zero-manager case survives to aggregation), per-pair classification is
the P7 program-subset algebra (``forall`` + ``array_contains``) plus
tag membership, and one groupBy folds the pairs into the reference's
exact reason strings.  The manager table is operator-count-sized —
broadcast, so the record side never shuffles; the per-record pair
fan-out is |records| × |managers| map-side rows, linear at any corpus
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the reference's literal reason strings (record_socket.py:1596-1629)
R_SERVICE = "Record is a service"
R_NOT_WAITING = "Record is not waiting"
R_MISSING_TASK = "Missing task? This is a developer error"
R_NO_MANAGERS = "No active managers"
R_FREE_MANAGER = "Waiting for a free manager"
R_NO_MATCH = "No manager matches programs & tags"


def waiting_reasons(records: DataFrame, managers: DataFrame) -> DataFrame:
    """Classify every record's waiting reason against the active-manager
    table.

    ``records`` carries one row per record, already outer-joined to its
    task (the reference's ``BaseRecordORM ⟕ TaskQueueORM``):
    ``record_id, status, is_service, compute_tag, required_programs``
    (task columns NULL when the record has no task).  ``managers``
    carries ``m_name, m_programs array<string>, m_tags array<string>,
    m_active boolean``.

    Returns ``record_id, reason, n_missing_programs, n_wrong_tag,
    n_busy`` — the counts are the set-oriented fold of the reference's
    per-manager ``details`` dict (missing-programs / wrong-tag / busy
    verdicts), zero for records short-circuited before the manager walk.
    Reason precedence matches the reference exactly: service → not
    waiting → missing task → no active managers → free-manager-wait if
    any manager is busy-but-capable, else no-match.
    """
    active = managers.where(F.col("m_active")).select(
        "m_name", "m_programs", "m_tags"
    )

    early_reason = (
        F.when(F.col("is_service"), F.lit(R_SERVICE))
        .when(F.col("status") != "waiting", F.lit(R_NOT_WAITING))
        .when(F.col("compute_tag").isNull(), F.lit(R_MISSING_TASK))
    )
    zero = F.lit(0).cast("bigint")
    early = records.where(early_reason.isNotNull()).select(
        "record_id",
        early_reason.alias("reason"),
        zero.alias("n_missing_programs"),
        zero.alias("n_wrong_tag"),
        zero.alias("n_busy"),
    )

    eligible = records.where(early_reason.isNull())
    # LEFT join on TRUE (not crossJoin): with zero active managers the
    # record row must SURVIVE to aggregate into "No active managers"
    pairs = eligible.join(F.broadcast(active), F.lit(True), "left")
    verdict = (
        F.when(F.col("m_name").isNull(), F.lit(None).cast("string"))
        .when(
            ~F.forall(
                F.col("required_programs"),
                lambda x: F.array_contains(F.col("m_programs"), x),
            ),
            F.lit("missing_programs"),
        )
        .when(
            ~(
                F.array_contains(F.col("m_tags"), F.col("compute_tag"))
                | F.array_contains(F.col("m_tags"), F.lit("*"))
            ),
            F.lit("wrong_tag"),
        )
        .otherwise(F.lit("busy"))
    )
    agg = (
        pairs.withColumn("_v", verdict)
        .groupBy("record_id")
        .agg(
            # coalesce: the zero-manager left-join row has _v NULL, and
            # SUM over only-NULLs is NULL — these counts must be 0
            F.coalesce(
                F.sum((F.col("_v") == "missing_programs").cast("long")), F.lit(0)
            )
            .cast("bigint")
            .alias("n_missing_programs"),
            F.coalesce(F.sum((F.col("_v") == "wrong_tag").cast("long")), F.lit(0))
            .cast("bigint")
            .alias("n_wrong_tag"),
            F.coalesce(F.sum((F.col("_v") == "busy").cast("long")), F.lit(0))
            .cast("bigint")
            .alias("n_busy"),
            F.count(F.col("_v")).cast("bigint").alias("_n_managers"),
        )
    )
    classified = agg.select(
        "record_id",
        F.when(F.col("_n_managers") == 0, F.lit(R_NO_MANAGERS))
        .when(F.col("n_busy") > 0, F.lit(R_FREE_MANAGER))
        .otherwise(F.lit(R_NO_MATCH))
        .alias("reason"),
        "n_missing_programs",
        "n_wrong_tag",
        "n_busy",
    )
    return early.unionByName(classified)
