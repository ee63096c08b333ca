"""Record status mutations as actual table operations — reset / cancel /
invalidate / delete (soft+hard) / undelete / uncancel / uninvalidate with
``record_info_backup`` semantics (reference record_socket.py:1190-1400;
backup table record_db_models.py:67-82).

The transition ALGEBRA has been verified since r12 by
:func:`qcfractal_spark.operators.diagnostics.status_transition_replay`
(the o11 gate); this module is the arm a user actually calls on a live
archive — MutableTable-backed, so every mutation is a copy-on-write
commit with time-travel history, and the backup side-table carries the
pre-image exactly as the reference's ``RecordInfoBackupORM`` rows do.

Data model (the o8/o11 record shape, task columns folded in):

* records table — ``record_id long, status string, is_service boolean,
  manager_name string, compute_tag string, compute_priority int,
  task_available boolean`` (task columns NULL ⇔ the reference's "no
  task row"; services never have one);
* backup table — ``record_id long, seq long, old_status string,
  old_compute_tag string, old_compute_priority int`` (``seq`` is the
  per-record stack depth: the reference appends to ``info_backup`` and
  reverts ``pop()`` the LAST entry, record_socket.py:1031).

Forward ops share one kernel (the reference's ``_cancel_common``,
record_socket.py:1089-1188): filter to applicable statuses, demote
running→waiting with the manager cleared BEFORE the backup is taken,
push (old status, old tag, old priority) onto the backup stack, delete
the task, set the new status.  Revert ops share ``_revert_common``
(:1000-1087): pop the last backup, restore its status, and recreate the
task (waiting/error, non-service only) with the backed-up tag/priority —
so cancel→uncancel of a RUNNING record lands at waiting, never running.
``reset`` is the no-backup arm of the same kernel (error→waiting).

Scale shape: the id list is a client contract (the reference chunks it
100 at a time through ORM row locks); here the affected set is ONE
broadcast-semi join against the records relation and the update is pure
CASE algebra in a single transform commit — no per-row loop, no lock
walk.  The bounded ``collect()`` pulls only the affected rows (≤ the id
list), exactly the rows the reference materializes as ORMs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.table import MutableTable
from ..session import local_df

RECORD_SCHEMA = (
    "record_id long, status string, is_service boolean, "
    "manager_name string, compute_tag string, compute_priority int, "
    "task_available boolean"
)
BACKUP_SCHEMA = (
    "record_id long, seq long, old_status string, "
    "old_compute_tag string, old_compute_priority int"
)

_ALL_STATUSES = frozenset(
    {"waiting", "running", "complete", "error", "cancelled", "invalid", "deleted"}
)
# forward matrices (record_socket.py:1204-1339)
_CANCEL_APPLICABLE = frozenset({"waiting", "running", "error"})
_INVALIDATE_APPLICABLE = frozenset({"complete"})
_DELETE_APPLICABLE = _ALL_STATUSES - {"deleted"}


class RecordStatusTable:
    """Two MutableTables (records + backup stack) and the seven mutation
    verbs.  Single-writer per path, like every MutableTable consumer —
    concurrent writers are serialized by the CAS commit, and the
    records/backup pair is updated records-first (a crash between the
    two commits leaves an extra backup row, which reverts ignore unless
    the status matches — the reference's own weaker invariant, since its
    backup rows survive hard resets too)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        edges: DataFrame | None = None,
        n_buckets: int | None = None,
    ):
        """``edges`` is the optional parent/child relation
        (``parent_id, child_id`` — the reference's record_children view):
        with it, mutations propagate exactly as the reference does —
        forward ops reach ALL RELATIVES when ``*_children=True`` (else
        parents only: a child's state change always invalidates its
        parents, record_socket.py:1126-1135), and reverts always reach
        children, never parents (:1005-1008).

        ``n_buckets`` (r15, VERDICT r14 item 6) partitions the records
        table on ``_bucket = record_id % n_buckets`` and routes every
        mutation through ``MutableTable.transform_partitions`` — the
        commit rewrites ONLY the buckets the id list touches and
        hardlinks the rest, so an id-targeted cancel on a 100 TB archive
        is a bounded commit, not a full-table CoW pass.  Unset keeps the
        unpartitioned full-rewrite layout (fine for small tables; the
        s13 gate fixture uses it)."""
        self.spark = spark
        self.edges = edges
        self.n_buckets = n_buckets
        self.records = MutableTable(
            spark,
            f"{path}/records",
            partition_by=["_bucket"] if n_buckets else None,
        )
        # the backup stack buckets the same way: pushes are append
        # commits either way, but the revert POP is an anti-join rewrite
        # that must stay bounded by the touched buckets too
        self.backup = MutableTable(
            spark,
            f"{path}/backup",
            partition_by=["_bucket"] if n_buckets else None,
        )

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "_bucket", F.pmod(F.col("record_id"), F.lit(self.n_buckets)).cast("int")
        )

    def _apply_update(self, update, touched_ids: set) -> None:
        """Route the CASE update through the partition-scoped commit when
        bucketed: the touched buckets come straight from the id set
        (driver-side modulo — no extra scan), and the update's SELECT
        re-derives ``_bucket`` from record_id, which never changes, so
        rows cannot cross partitions."""
        if not self.n_buckets:
            self.records.transform(update)
            return
        buckets = sorted({int(i) % self.n_buckets for i in touched_ids})
        self.records.transform_partitions(
            lambda df: self._with_bucket(update(df.drop("_bucket"))), buckets
        )

    def _backup_push(self, new_backup: DataFrame) -> None:
        if self.n_buckets:
            new_backup = self._with_bucket(new_backup)
        self.backup.append(new_backup)

    def _backup_pop(self, anti_fn, touched_ids: set) -> None:
        """Anti-join removal from the backup stack, bucket-scoped when
        bucketed (record_id never changes, so popped rows stay in their
        buckets)."""
        if not self.n_buckets:
            self.backup.transform(anti_fn)
            return
        buckets = sorted({int(i) % self.n_buckets for i in touched_ids})
        self.backup.transform_partitions(anti_fn, buckets)

    def _expand(self, ids: Sequence[int], mode: str) -> list[int]:
        """Propagation sets via the graph closure operators (the same
        fixpoint the j8 gate verifies); bounded by family size × id
        list, the reference's own collect unit."""
        ids = sorted({int(i) for i in ids})
        if self.edges is None or not ids:
            return ids
        from .graph import ancestors, descendants, relatives

        seeds = local_df(self.spark, [(i,) for i in ids], "id long")
        if mode == "children":
            extra = descendants(seeds, self.edges)
        elif mode == "parents":
            extra = ancestors(seeds, self.edges)
        elif mode == "relatives":
            extra = relatives(seeds, self.edges)
        else:  # pragma: no cover - internal contract
            raise ValueError(mode)
        got = {r["id"] for r in extra.select("id").collect()}
        return sorted(set(ids) | got)

    # -- lifecycle ---------------------------------------------------------

    def init(self, records_df: DataFrame) -> None:
        base = records_df.select(*_cols(RECORD_SCHEMA))
        empty_backup = local_df(self.spark, [], BACKUP_SCHEMA)
        if self.n_buckets:
            base = self._with_bucket(base)
            empty_backup = self._with_bucket(empty_backup)
        self.records.overwrite(base)
        self.backup.overwrite(empty_backup)

    def read(self) -> DataFrame:
        df = self.records.read()
        return df.drop("_bucket") if self.n_buckets else df

    def read_backup(self) -> DataFrame:
        df = self.backup.read()
        return df.drop("_bucket") if self.n_buckets else df

    # -- forward ops (the _cancel_common kernel) ----------------------------

    def cancel(self, record_ids: Sequence[int], cancel_children: bool = True) -> dict:
        """waiting/running/error → cancelled (record_socket.py:1274-1305).
        ``cancel_children=True`` propagates to all relatives; False still
        reaches parents (a cancelled child invalidates its parents'
        state, :1126-1135)."""
        return self._cancel_common(
            record_ids,
            self._expand(record_ids, "relatives" if cancel_children else "parents"),
            _CANCEL_APPLICABLE,
            "cancelled",
        )

    def invalidate(self, record_ids: Sequence[int]) -> dict:
        """complete → invalid (record_socket.py:1310-1339);
        propagate_to_children=False in the reference, so parents only."""
        return self._cancel_common(
            record_ids,
            self._expand(record_ids, "parents"),
            _INVALIDATE_APPLICABLE,
            "invalid",
        )

    def delete(
        self,
        record_ids: Sequence[int],
        soft_delete: bool = True,
        delete_children: bool = True,
    ) -> dict:
        """Soft delete: anything-but-deleted → deleted, revertible via
        :meth:`undelete`.  Hard delete removes the rows outright (and
        their backup stacks) — the reference's ``soft_delete=False`` arm
        (record_socket.py:1204-1272, children via get_children_ids)."""
        if not soft_delete:
            ids = sorted(
                set(
                    self._expand(record_ids, "children")
                    if delete_children
                    else record_ids
                )
            )
            present = {
                r["record_id"]
                for r in self._affected(ids, _ALL_STATUSES).select("record_id").collect()
            }
            ids_df = self._ids_df(sorted(present) or [-1])
            self._apply_update(
                lambda df: df.join(F.broadcast(ids_df), on="record_id", how="left_anti"),
                present or {-1},
            )
            self._backup_pop(
                lambda df: df.join(
                    F.broadcast(ids_df), on="record_id", how="left_anti"
                ),
                present or {-1},
            )
            return _meta(record_ids, present)
        return self._cancel_common(
            record_ids,
            self._expand(record_ids, "relatives" if delete_children else "parents"),
            _DELETE_APPLICABLE,
            "deleted",
        )

    # -- revert ops (the _revert_common kernel) -----------------------------

    def reset(self, record_ids: Sequence[int]) -> dict:
        """error → waiting (no backup involved; record_socket.py:1190-1195)."""
        return self._revert_common(record_ids, frozenset({"error"}))

    def reset_running(self, record_ids: Sequence[int]) -> dict:
        """running → waiting — the dead-manager recycle arm
        (record_socket.py:1197-1202)."""
        return self._revert_common(record_ids, frozenset({"running"}))

    def undelete(self, record_ids: Sequence[int]) -> dict:
        return self._revert_common(record_ids, frozenset({"deleted"}))

    def uncancel(self, record_ids: Sequence[int]) -> dict:
        return self._revert_common(record_ids, frozenset({"cancelled"}))

    def uninvalidate(self, record_ids: Sequence[int]) -> dict:
        return self._revert_common(record_ids, frozenset({"invalid"}))

    # -- kernels -------------------------------------------------------------

    def _ids_df(self, ids: Sequence[int]) -> DataFrame:
        return local_df(self.spark,
            [(int(i),) for i in ids] or [(None,)], "record_id long"
        )

    def _affected(self, ids: Sequence[int], applicable: frozenset) -> DataFrame:
        return (
            self.records.read()
            .join(F.broadcast(self._ids_df(ids)), on="record_id", how="left_semi")
            .where(F.col("status").isin(*sorted(applicable)))
        )

    def _cancel_common(
        self,
        record_ids: Sequence[int],
        all_ids: Sequence[int],
        applicable: frozenset,
        new_status: str,
    ) -> dict:
        ids = sorted(set(all_ids))
        if not ids:
            return _meta(record_ids, set())
        # the demotion happens BEFORE the backup snapshot (reference
        # :1147-1150): a running record's backup row says 'waiting'
        affected = self._affected(ids, applicable).select(
            "record_id",
            F.when(F.col("status") == "running", F.lit("waiting"))
            .otherwise(F.col("status"))
            .alias("old_status"),
            F.col("compute_tag").alias("old_compute_tag"),
            F.col("compute_priority").alias("old_compute_priority"),
        )
        rows = affected.collect()  # bounded by the client id list
        if not rows:
            return _meta(record_ids, set())
        updated = {r["record_id"] for r in rows}
        seq_base = {
            r["record_id"]: r["m"]
            for r in self.backup.read()
            .groupBy("record_id")
            .agg(F.max("seq").alias("m"))
            .join(F.broadcast(self._ids_df(sorted(updated))), on="record_id", how="left_semi")
            .collect()
        }
        new_backup = local_df(self.spark,
            [
                (
                    r["record_id"],
                    seq_base.get(r["record_id"], 0) + 1,
                    r["old_status"],
                    r["old_compute_tag"],
                    r["old_compute_priority"],
                )
                for r in rows
            ],
            BACKUP_SCHEMA,
        )
        upd_df = F.broadcast(
            new_backup.select("record_id").withColumn("_hit", F.lit(True))
        )

        def update(df: DataFrame) -> DataFrame:
            hit = F.col("_hit").isNotNull()
            return (
                df.join(upd_df, on="record_id", how="left")
                .select(
                    "record_id",
                    F.when(hit, F.lit(new_status)).otherwise(F.col("status")).alias("status"),
                    "is_service",
                    F.when(hit, F.lit(None).cast("string"))
                    .otherwise(F.col("manager_name"))
                    .alias("manager_name"),
                    # task deleted (tag/priority preserved in the backup)
                    F.when(hit, F.lit(None).cast("string"))
                    .otherwise(F.col("compute_tag"))
                    .alias("compute_tag"),
                    F.when(hit, F.lit(None).cast("int"))
                    .otherwise(F.col("compute_priority"))
                    .alias("compute_priority"),
                    F.when(hit, F.lit(None).cast("boolean"))
                    .otherwise(F.col("task_available"))
                    .alias("task_available"),
                )
            )

        self._apply_update(update, updated)
        self._backup_push(new_backup)
        return _meta(record_ids, updated)

    def _revert_common(self, record_ids: Sequence[int], applicable: frozenset) -> dict:
        # reverts always reach children, never parents
        # (record_socket.py:1005-1008: "We always apply these operations
        # to children")
        ids = sorted(set(self._expand(record_ids, "children")))
        if not ids:
            return _meta(record_ids, set())
        backed = applicable & {"deleted", "cancelled", "invalid"}
        plain = applicable & {"running", "error"}
        restored_rows = []
        popped = []  # (record_id, seq)
        if backed:
            last = (
                self.backup.read()
                .join(F.broadcast(self._ids_df(ids)), on="record_id", how="left_semi")
                .withColumn(
                    "_rn",
                    F.row_number().over(
                        Window.partitionBy("record_id").orderBy(F.col("seq").desc())
                    ),
                )
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            hits = (
                self._affected(ids, backed)
                .select("record_id", "is_service")
                .join(last, on="record_id")
                .collect()
            )
            for r in hits:
                old = r["old_status"]
                has_task = (not r["is_service"]) and old in ("waiting", "error")
                restored_rows.append(
                    (
                        r["record_id"],
                        old,
                        r["old_compute_tag"] if has_task else None,
                        r["old_compute_priority"] if has_task else None,
                        (old == "waiting") if has_task else None,
                        None,  # manager_name stays cleared
                    )
                )
                popped.append((r["record_id"], r["seq"]))
        if plain:
            for r in self._affected(ids, plain).collect():
                restored_rows.append(
                    (
                        r["record_id"],
                        "waiting",
                        r["compute_tag"],
                        r["compute_priority"],
                        True if not r["is_service"] else None,
                        None,
                    )
                )
        if not restored_rows:
            return _meta(record_ids, set())
        updated = {t[0] for t in restored_rows}
        upd = F.broadcast(
            local_df(self.spark,
                restored_rows,
                "record_id long, _status string, _tag string, _prio int, "
                "_avail boolean, _mgr string",
            )
        )

        def update(df: DataFrame) -> DataFrame:
            hit = F.col("_status").isNotNull()
            return (
                df.join(upd, on="record_id", how="left")
                .select(
                    "record_id",
                    F.when(hit, F.col("_status")).otherwise(F.col("status")).alias("status"),
                    "is_service",
                    F.when(hit, F.col("_mgr")).otherwise(F.col("manager_name")).alias("manager_name"),
                    F.when(hit, F.col("_tag")).otherwise(F.col("compute_tag")).alias("compute_tag"),
                    F.when(hit, F.col("_prio")).otherwise(F.col("compute_priority")).alias("compute_priority"),
                    F.when(hit, F.col("_avail")).otherwise(F.col("task_available")).alias("task_available"),
                )
            )

        self._apply_update(update, updated)
        if popped:
            pop_df = F.broadcast(
                local_df(self.spark, popped, "record_id long, seq long")
            )
            self._backup_pop(
                lambda df: df.join(
                    pop_df, on=["record_id", "seq"], how="left_anti"
                ),
                {rid for rid, _ in popped},
            )
        return _meta(record_ids, updated)


def _cols(schema: str) -> list[str]:
    return [c.strip().split()[0] for c in schema.split(",")]


def _meta(requested: Sequence[int], updated: set) -> dict:
    """UpdateMetadata analog: indices into the REQUEST list that landed,
    plus per-index errors for the rest (record_socket.py:1078-1086)."""
    updated_idx = [i for i, rid in enumerate(requested) if rid in updated]
    errors = [
        (i, "Record is missing or cannot be modified")
        for i, rid in enumerate(requested)
        if rid not in updated
    ]
    return {"updated_idx": updated_idx, "errors": errors, "n_updated": len(updated_idx)}
