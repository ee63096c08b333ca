"""Copy-on-write mutable parquet table — the mutation surface (S3-S7)
without a transactional lake format.

The reference mutates through PostgreSQL (INSERT ON CONFLICT, chunked
DELETE, retention sweeps — db_socket/helpers.py:317-813, 576-641;
serverinfo/socket.py:601-643).  On a lakehouse this is Delta MERGE/DELETE;
in this dependency-frozen environment we implement the same semantics as
versioned copy-on-write parquet: every mutation writes a new version
directory and flips a pointer file, giving atomic swap, time-travel to the
previous version, and single-writer serialization — the honest subset of
Delta's contract that the engine's semantics need.

At 100 TB the rewrite would be partition-scoped (rewrite only partitions
containing matched keys — the same physical plan Delta executes); the API
below takes an optional ``partition_by`` so writes are partition-pruned.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class MutableTable:
    """Versioned parquet table with insert/upsert/delete/retention."""

    def __init__(self, spark: SparkSession, path: str, partition_by: Sequence[str] | None = None):
        self.spark = spark
        self.path = path
        self.partition_by = list(partition_by or [])
        os.makedirs(path, exist_ok=True)

    # -- version bookkeeping ------------------------------------------------

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer) as fh:
                return json.load(fh)["version"]
        except FileNotFoundError:
            return None

    def current_meta(self) -> dict:
        """Caller-supplied metadata recorded atomically WITH the version
        swap (same pointer file) — e.g. the streaming epoch id that
        produced the version, which is what makes foreachBatch merges
        idempotent under at-least-once replay."""
        try:
            with open(self._pointer) as fh:
                return json.load(fh).get("meta", {})
        except FileNotFoundError:
            return {}

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.path, f"v{v:06d}")

    def _commit(self, df: DataFrame, meta: dict | None = None) -> int:
        prev = self.current_version()
        v = 0 if prev is None else prev + 1
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self._version_dir(v))
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": v, "ts": time.time(), "meta": meta or {}}, fh)
        os.replace(tmp, self._pointer)  # atomic swap
        # keep only current + previous version (time-travel depth 1)
        for old in range(v - 1):
            shutil.rmtree(self._version_dir(old), ignore_errors=True)
        return v

    def _commit_partition_scoped(
        self, touched_survivors: DataFrame, touched_values: Sequence
    ) -> int:
        """Partition-scoped rewrite (single partition column): hardlink the
        untouched partition directories from the previous version, write
        only the touched partitions' surviving rows.  This is the physical
        plan Delta executes for DELETE/MERGE — IO scales with the touched
        partitions, not the table.  Touched partitions whose survivor set is
        empty are simply not written (partition drop)."""
        assert len(self.partition_by) == 1
        pcol = self.partition_by[0]
        prev = self.current_version()
        assert prev is not None
        v = prev + 1
        vdir = self._version_dir(v)
        os.makedirs(vdir, exist_ok=True)
        touched_strs = {str(t) for t in touched_values}
        prev_dir = self._version_dir(prev)
        for entry in os.listdir(prev_dir):
            if entry.startswith(f"{pcol}="):
                if entry.split("=", 1)[1] not in touched_strs:
                    shutil.copytree(
                        os.path.join(prev_dir, entry),
                        os.path.join(vdir, entry),
                        copy_function=os.link,  # refcounted, no data copy
                    )
        if touched_strs:
            touched_survivors.write.mode("append").partitionBy(pcol).parquet(vdir)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": v, "ts": time.time()}, fh)
        os.replace(tmp, self._pointer)
        for old in range(v - 1):
            shutil.rmtree(self._version_dir(old), ignore_errors=True)
        return v

    # -- reads --------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"table {self.path} has no committed version")
        return self.spark.read.parquet(self._version_dir(v))

    # -- mutations (each = one serialized commit) ---------------------------

    def overwrite(self, df: DataFrame, meta: dict | None = None) -> int:
        return self._commit(df, meta=meta)

    def compact(
        self,
        target_files: int = 1,
        zorder_by: Sequence[str] | None = None,
    ) -> int:
        """OPTIMIZE: rewrite the current version into few large files,
        optionally Z-order clustered — the steady-state maintenance job of
        any table that streams or micro-batches appends (every commit above
        writes task-count files; at 100 TB/day ingest the small-file tax on
        scan planning and footer reads grows until compaction pays it off).

        Unpartitioned tables repartition to ``target_files``; partitioned
        tables repartition on the partition column so each Hive partition
        directory compacts to one file.  ``zorder_by`` routes through
        ``layout.zorder_column`` for multi-dimension stats locality (same
        semantics as Delta ``OPTIMIZE ... ZORDER BY``).  Data is unchanged
        — one new version, same rows."""
        df = self.read()
        if zorder_by:
            from .layout import zorder_column

            df = zorder_column(df, list(zorder_by))
            if self.partition_by:
                # Hive-partitioned table: the commit below re-splits output
                # by partitionBy, so global _z ranges would scatter each
                # Z-range across partition directories (up to target_files
                # files per directory).  Cluster WITHIN partitions instead:
                # one shuffle on the partition columns (one file per
                # directory, same as the non-zorder arm) with rows Z-sorted
                # inside, which is what per-partition min/max pruning reads.
                df = (
                    df.repartition(*[F.col(c) for c in self.partition_by])
                    .sortWithinPartitions("_z")
                    .drop("_z")
                )
            else:
                df = (
                    df.repartitionByRange(target_files, F.col("_z"))
                    .sortWithinPartitions("_z")
                    .drop("_z")
                )
        elif self.partition_by:
            df = df.repartition(*[F.col(c) for c in self.partition_by])
        else:
            df = df.repartition(target_files)
        return self._commit(df)

    def insert_dedup(self, batch: DataFrame, search_cols: Sequence[str]) -> dict:
        """S3 query-first bulk insert: append rows whose natural key is new;
        report inserted/existing counts (InsertMetadata,
        helpers.py:317-406)."""
        from ..operators.keyed import insert_dedup_classify

        current = self.read()
        to_insert, classified = insert_dedup_classify(current, batch, search_cols)
        n_new = to_insert.count()
        n_existing = classified.where(F.col("_existing")).count()
        self._commit(current.unionByName(to_insert, allowMissingColumns=True))
        return {"inserted": n_new, "existing": n_existing}

    def upsert(self, batch: DataFrame, key_cols: Sequence[str]) -> dict:
        """S4 ON CONFLICT DO UPDATE: replace matching keys, append the rest
        (Delta MERGE semantics).

        NULL keys match NULL keys, consistent with ``upsert_classify``'s
        null-safe conflict rule and with ``dropDuplicates`` treating NULL
        keys as equal (a plain equi-join left the table's NULL-key row in
        place AND appended the batch's — one upsert, two survivors — while
        the classifier reported the same row as a conflict).  In-batch
        duplicate keys resolve arbitrarily, as documented on
        ``insert_dedup_classify``."""
        from ..operators.keyed import _null_safe_cond

        current = self.read()
        keys = list(key_cols)
        batch_keys = batch.select(*keys).dropDuplicates(keys)
        kept = current.alias("b").join(
            batch_keys.alias("t"), _null_safe_cond(keys), how="left_anti"
        )
        updated = current.count() - kept.count()
        self._commit(kept.unionByName(batch.dropDuplicates(keys), allowMissingColumns=True))
        return {"updated": updated, "inserted": batch.dropDuplicates(keys).count() - updated}

    def delete_ids(
        self, ids: Sequence, id_col: str, referencing: DataFrame | None = None,
        ref_col: str | None = None,
    ) -> dict:
        """S6 keyed delete with per-row error capture: rows still referenced
        by ``referencing[ref_col]`` are NOT deleted and reported as errors
        (the reference's FK-violation fallback, helpers.py:576-641)."""
        current = self.read()
        ids_df = self.spark.createDataFrame([(i,) for i in ids], f"{id_col} long")
        blocked: list = []
        if referencing is not None and ref_col is not None:
            blocked_df = ids_df.join(
                referencing.select(F.col(ref_col).alias(id_col)).dropDuplicates([id_col]),
                on=id_col,
                how="left_semi",
            )
            blocked = [r[id_col] for r in blocked_df.collect()]
        deletable = [i for i in ids if i not in set(blocked)]
        del_df = self.spark.createDataFrame([(i,) for i in deletable] or [(None,)], f"{id_col} long")
        if len(self.partition_by) == 1:
            pcol = self.partition_by[0]
            touched = [
                r[0]
                for r in current.join(del_df, on=id_col, how="left_semi")
                .select(pcol)
                .distinct()
                .collect()
            ]
            scoped = current.where(F.col(pcol).isin(touched))
            remaining = scoped.join(del_df, on=id_col, how="left_anti")
            n_deleted = scoped.count() - remaining.count()
            self._commit_partition_scoped(remaining, touched)
        else:
            remaining = current.join(del_df, on=id_col, how="left_anti")
            n_deleted = current.count() - remaining.count()
            self._commit(remaining)
        return {"deleted": n_deleted, "errors": blocked}

    def change_feed(self, key_cols: Sequence[str], cdf_style: bool = False) -> DataFrame:
        """Change-data-feed between the previous and current version: one
        row per changed key with ``_change ∈ {insert, delete, update}``
        (Delta CDF shape, derived rather than logged).  Keys only in the
        current version are inserts, only in the previous are deletes, in
        both but with differing non-key columns are updates.

        ``cdf_style=True`` emits Delta's full four-way form instead: each
        update becomes TWO rows — ``update_preimage`` (the old values) and
        ``update_postimage`` (the new) — which is what downstream
        incremental aggregation needs (the preimage retracts the old
        contribution, the postimage adds the new; see
        ``sources/rollup.py``).

        Two anti-joins + one diff join, all keyed on ``key_cols`` — the
        downstream-sync primitive (incremental index refresh, cache
        invalidation, derived-table maintenance) that otherwise forces a
        full-table compare.  Time-travel depth is 1, matching the version
        retention above.

        NULL-key rows: the equi-joins never match a NULL key, so an
        unchanged NULL-key row surfaces as a delete+insert pair each diff
        instead of silence.  That is *correct* for every consumer (the
        pair nets to zero in rollup deltas; delete-then-insert is an
        idempotent refresh for index/cache sync) but wasteful churn —
        tables whose natural key can be NULL should surrogate it at
        ingest."""
        cur_v = self.current_version()
        if cur_v is None or cur_v == 0:
            raise ValueError("change_feed needs a previous version to diff against")
        keys = list(key_cols)
        cur = self.read()
        prev = self.read(cur_v - 1)
        inserted = cur.join(prev.select(*keys), on=keys, how="left_anti").withColumn(
            "_change", F.lit("insert")
        )
        deleted = prev.join(cur.select(*keys), on=keys, how="left_anti").withColumn(
            "_change", F.lit("delete")
        )
        val_cols = [c for c in cur.columns if c not in keys]
        if not val_cols:
            # All columns are keys: a key either exists in both versions
            # (identical row — no change) or in exactly one (insert/delete
            # above); there is no update arm to diff.
            return inserted.unionByName(deleted)
        from pyspark.sql.types import MapType

        unorderable = [
            c for c in val_cols if isinstance(cur.schema[c].dataType, MapType)
        ]
        if unorderable:
            raise ValueError(
                "change_feed diffs value columns with an ordering-based "
                f"struct comparison; map-typed columns {unorderable} are "
                "unorderable — diff a to_json projection or exclude them "
                "via key_cols"
            )
        cur_s = cur.select(*keys, F.struct(*val_cols).alias("_new"))
        prev_s = prev.select(*keys, F.struct(*val_cols).alias("_old"))
        changed = cur_s.join(prev_s, on=keys).where(F.col("_new") != F.col("_old"))
        if cdf_style:
            pre = changed.select(*keys, "_old.*").withColumn(
                "_change", F.lit("update_preimage")
            )
            post = changed.select(*keys, "_new.*").withColumn(
                "_change", F.lit("update_postimage")
            )
            return inserted.unionByName(deleted).unionByName(pre).unionByName(post)
        updated = changed.select(*keys, "_new.*").withColumn(
            "_change", F.lit("update")
        )
        return inserted.unionByName(deleted).unionByName(updated)

    def retention_delete(self, ts_col: str, cutoff) -> int:
        """S7/T6: drop rows older than the cutoff.  On a partitioned table
        only partitions containing expired rows are touched: fully-expired
        partitions drop without a rewrite, straddling ones rewrite their
        survivors, current ones are hardlinked untouched.

        A NULL timestamp is never expired — the reference's sweep deletes
        ``WHERE ts < cutoff`` (serverinfo/socket.py:601-643), which a NULL
        cannot satisfy.  (``keep = ts >= cutoff`` alone silently deleted
        NULL-ts rows in the unpartitioned arm while the partitioned arm
        kept those sitting in untouched partitions — arm-dependent
        semantics; the explicit isNull branch makes both arms keep them.)"""
        current = self.read()
        expired = F.col(ts_col) < F.lit(cutoff)
        keep = F.col(ts_col).isNull() | (F.col(ts_col) >= F.lit(cutoff))
        if len(self.partition_by) == 1:
            pcol = self.partition_by[0]
            touched = [
                r[0] for r in current.where(expired).select(pcol).distinct().collect()
            ]
            scoped = current.where(F.col(pcol).isin(touched))
            remaining = scoped.where(keep)
            n = scoped.count() - remaining.count()
            self._commit_partition_scoped(remaining, touched)
            return n
        remaining = current.where(keep)
        n = current.count() - remaining.count()
        self._commit(remaining)
        return n
