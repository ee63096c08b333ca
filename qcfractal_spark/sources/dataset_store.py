"""Dataset store: the four dataset tables as MutableTables plus the
clone / copy_from curation verbs (reference
base_dataset_socket.py:1668-1945 — ``copy_entries``,
``copy_specifications``, ``copy_record_items``, ``copy_from``,
``clone``).

Tables (the generic columns every reference dataset type shares):

* datasets     — ``dataset_id long, dataset_type string, name string,
                 description string, default_compute_tag string,
                 default_compute_priority int``
* entries      — ``dataset_id long, entry_name string`` + payload columns
* specs        — ``dataset_id long, name string, description string,
                 specification_id long``
* record_items — ``dataset_id long, entry_name string,
                 specification_name string, record_id long``

The copy algebra lives in :mod:`qcfractal_spark.operators.dataset`
(``copy_*_plan``: pure DataFrame classification, broadcast-joined on the
dataset-sized dims); this class applies the plans as MutableTable
commits.  The reference runs the multi-table copy in one SQL
transaction; here each table commits separately in dependency order
(specs → entries → record_items), after BOTH conflict sets are checked
up front — so a rejected copy mutates nothing, and a crash mid-copy
leaves a prefix of tables copied with no dangling references (items
commit last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dataset import (
    copy_entries_plan,
    copy_record_items_plan,
    copy_specifications_plan,
)
from .table import MutableTable
from ..session import local_df

DATASET_SCHEMA = (
    "dataset_id long, dataset_type string, name string, description string, "
    "default_compute_tag string, default_compute_priority int"
)


class DatasetCopyError(ValueError):
    """UserReportableError analog: same-name conflicts in the destination."""


class DatasetStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.datasets = MutableTable(spark, f"{path}/datasets")
        self.entries = MutableTable(spark, f"{path}/entries")
        self.specs = MutableTable(spark, f"{path}/specs")
        self.record_items = MutableTable(spark, f"{path}/record_items")

    def init(
        self,
        datasets: DataFrame,
        entries: DataFrame,
        specs: DataFrame,
        record_items: DataFrame,
    ) -> None:
        self.datasets.overwrite(datasets)
        self.entries.overwrite(entries)
        self.specs.overwrite(specs)
        self.record_items.overwrite(record_items)

    # -- copy_from (base_dataset_socket.py:1802-1867) -----------------------

    def copy_from(
        self,
        source_dataset_id: int,
        destination_dataset_id: int,
        entry_names=None,
        specification_names=None,
        copy_entries: bool = False,
        copy_specifications: bool = False,
        copy_records: bool = False,
    ) -> dict:
        """copy_records implies entries + specifications, exactly as the
        reference's flag cascade.  Returns per-table inserted counts."""
        ds = {
            r["dataset_id"]: r["dataset_type"]
            for r in self.datasets.read()
            .where(
                F.col("dataset_id").isin(
                    int(source_dataset_id), int(destination_dataset_id)
                )
            )
            .select("dataset_id", "dataset_type")
            .collect()
        }
        if source_dataset_id not in ds or destination_dataset_id not in ds:
            raise DatasetCopyError("source or destination dataset does not exist")
        if ds[source_dataset_id] != ds[destination_dataset_id]:
            raise DatasetCopyError(
                f"Source dataset type {ds[source_dataset_id]} does not match "
                f"destination type {ds[destination_dataset_id]}"
            )
        out = {"specs": 0, "entries": 0, "record_items": 0}

        spec_plan = entry_plan = None
        if copy_specifications or copy_records:
            spec_plan = copy_specifications_plan(
                self.specs.read(),
                source_dataset_id,
                destination_dataset_id,
                specification_names,
            )
            conflicts = [r["name"] for r in spec_plan["conflicts"].collect()]
            if conflicts:
                raise DatasetCopyError(
                    "Cannot copy specifications from dataset - destination "
                    f"already has specifications with the same name: {sorted(conflicts)}"
                )
        if copy_entries or copy_records:
            entry_plan = copy_entries_plan(
                self.entries.read(),
                source_dataset_id,
                destination_dataset_id,
                entry_names,
            )
            conflicts = [r["entry_name"] for r in entry_plan["conflicts"].collect()]
            if conflicts:
                raise DatasetCopyError(
                    "Cannot copy entries from dataset - destination already "
                    f"has entries with the same name: {sorted(conflicts)}"
                )
        # both conflict gates passed: apply in dependency order
        if spec_plan is not None:
            new = spec_plan["new"].localCheckpoint(eager=True)
            out["specs"] = new.count()
            self.specs.append(new)
        if entry_plan is not None:
            new = entry_plan["new"].localCheckpoint(eager=True)
            out["entries"] = new.count()
            self.entries.append(new)
        if copy_records:
            items = copy_record_items_plan(
                self.record_items.read(),
                source_dataset_id,
                destination_dataset_id,
                entry_names,
                specification_names,
            ).localCheckpoint(eager=True)
            out["record_items"] = items.count()
            self.record_items.append(items)
        return out

    # -- clone (base_dataset_socket.py:1869-1945) ----------------------------

    def clone(self, source_dataset_id: int, new_dataset_name: str) -> int:
        """New dataset row (metadata copied, existing_ok=False), then
        copy_from(copy_records=True).  Contributed values and attachments
        are NOT copied — the reference deliberately leaves both out
        (:1920-1945).  Returns the new dataset id (max+1, the serial-pk
        analog under the single-writer contract)."""
        rows = self.datasets.read().collect()
        src = next(
            (r for r in rows if r["dataset_id"] == source_dataset_id), None
        )
        if src is None:
            raise DatasetCopyError(
                f"Cannot find dataset with ID {source_dataset_id} for cloning"
            )
        if any(
            r["name"] == new_dataset_name and r["dataset_type"] == src["dataset_type"]
            for r in rows
        ):
            raise DatasetCopyError(
                f"dataset {new_dataset_name!r} already exists (existing_ok=False)"
            )
        new_id = max(r["dataset_id"] for r in rows) + 1
        new_row = local_df(self.spark,
            [
                (
                    new_id,
                    src["dataset_type"],
                    new_dataset_name,
                    src["description"],
                    src["default_compute_tag"],
                    src["default_compute_priority"],
                )
            ],
            DATASET_SCHEMA,
        )
        self.datasets.append(new_row)
        self.copy_from(source_dataset_id, new_id, copy_records=True)
        return new_id
