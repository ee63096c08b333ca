"""Project store: project membership tables as MutableTables plus the
link / unlink / add / import curation verbs (reference
components/project_socket.py:483-543 ``link_dataset``/``unlink_datasets``,
:545-576 ``assert_record_belongs``/``record_name_exists``, :586-728
``add_record``/``import_record``/``link_record``/``unlink_records``).

Tables:

* projects         — ``project_id long, name string, description string,
                     tagline string, tags array<string>``
* project_datasets — ``project_id long, dataset_id long, name string,
                     description string, tagline string,
                     tags array<string>`` (ProjectDatasetORM: the link
                     carries its OWN metadata, defaulted from the
                     dataset's at link time)
* project_records  — ``project_id long, record_id long, name string,
                     description string, tags array<string>``
                     (ProjectRecordORM; ``lname`` uniqueness is enforced
                     as a lowercase name-conflict gate)

The store optionally holds the records MutableTable (``record_id long``
keyed) so ``unlink_records(delete_records=True)`` and
``add_record``/``import_record`` can mutate records in the same style
the reference's root-socket cascade does.  Like DatasetStore, each
table commits separately under the single-writer CAS contract, with
every conflict gate checked BEFORE the first commit — a rejected op
mutates nothing.

Spark-first notes: every op is id-list-sized driver logic around ONE
partition-friendly DataFrame transform per touched table (unionByName
append or left_anti delete) — the link tables are membership FACTS, so
at 100 TB they stay id+metadata rows (no payloads), and the queries
that consume them (J6 membership joins, j18 project inventory) broadcast
or shuffle them as the small side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table import MutableTable
from ..session import local_df

PROJECT_SCHEMA = (
    "project_id long, name string, description string, tagline string, "
    "tags array<string>"
)
PROJECT_DATASET_SCHEMA = (
    "project_id long, dataset_id long, name string, description string, "
    "tagline string, tags array<string>"
)
PROJECT_RECORD_SCHEMA = (
    "project_id long, record_id long, name string, description string, "
    "tags array<string>"
)


class AlreadyExistsError(ValueError):
    """Reference AlreadyExistsError analog (duplicate link / name)."""


class MissingDataError(KeyError):
    """Reference MissingDataError analog (absent project/dataset/record)."""


class ProjectStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        records: MutableTable | None = None,
        record_id_col: str = "record_id",
    ):
        self.spark = spark
        self.projects = MutableTable(spark, f"{path}/projects")
        self.project_datasets = MutableTable(spark, f"{path}/project_datasets")
        self.project_records = MutableTable(spark, f"{path}/project_records")
        self.records = records
        self.record_id_col = record_id_col

    def init(
        self,
        projects: DataFrame,
        project_datasets: DataFrame | None = None,
        project_records: DataFrame | None = None,
    ) -> None:
        empty_ds = local_df(self.spark, [], PROJECT_DATASET_SCHEMA)
        empty_rec = local_df(self.spark, [], PROJECT_RECORD_SCHEMA)
        self.projects.overwrite(projects)
        self.project_datasets.overwrite(
            project_datasets if project_datasets is not None else empty_ds
        )
        self.project_records.overwrite(
            project_records if project_records is not None else empty_rec
        )

    # -- datasets (project_socket.py:483-542) -------------------------------

    def link_dataset(
        self,
        project_id: int,
        dataset_id: int,
        dataset_meta: dict,
        name: str | None = None,
        description: str | None = None,
        tagline: str | None = None,
        tags: Sequence[str] | None = None,
    ) -> None:
        """Insert the (project, dataset) link row; each metadata field
        defaults to the DATASET's value when None (the reference fetches
        the dataset with missing_ok=False and coalesces field-by-field,
        :496-507).  ``dataset_meta`` is that fetched row (dict with
        name/description/tagline/tags) — passing it explicitly keeps the
        store decoupled from DatasetStore's schema.  A live link for the
        same pair raises AlreadyExistsError (the on_conflict_do_nothing +
        None-returning-scalar arm, :510-516)."""
        exists = (
            self.project_datasets.read()
            .where(
                (F.col("project_id") == int(project_id))
                & (F.col("dataset_id") == int(dataset_id))
            )
            .limit(1)
            .count()
        )
        if exists:
            raise AlreadyExistsError(
                f"Dataset {dataset_id} already linked to project {project_id}"
            )
        row = local_df(self.spark,
            [
                (
                    int(project_id),
                    int(dataset_id),
                    name if name is not None else dataset_meta.get("name"),
                    description
                    if description is not None
                    else dataset_meta.get("description"),
                    tagline if tagline is not None else dataset_meta.get("tagline"),
                    list(tags)
                    if tags is not None
                    else list(dataset_meta.get("tags") or []),
                )
            ],
            PROJECT_DATASET_SCHEMA,
        )
        self.project_datasets.append(row)

    def unlink_datasets(
        self,
        project_id: int,
        dataset_ids: Sequence[int],
        dataset_store=None,
        delete_datasets: bool = False,
        delete_dataset_records: bool = False,
    ) -> list[int]:
        """Delete the link rows, RETURNING the dataset ids actually
        removed; only those ids cascade when ``delete_datasets`` (the
        reference deletes via the returned set so a dataset linked to
        project A is never deleted through project B's unlink,
        :519-539).  The cascade removes the dataset's rows from all four
        DatasetStore tables; ``delete_dataset_records`` additionally
        deletes the records referenced by the dataset's items (the
        datasets.delete flag)."""
        ids = [int(i) for i in dataset_ids]
        removed = [
            r["dataset_id"]
            for r in self.project_datasets.read()
            .where(
                (F.col("project_id") == int(project_id))
                & F.col("dataset_id").isin(ids)
            )
            .select("dataset_id")
            .collect()
        ]
        if removed:
            self.project_datasets.transform(
                lambda df: df.where(
                    ~(
                        (F.col("project_id") == int(project_id))
                        & F.col("dataset_id").isin(removed)
                    )
                )
            )
        if delete_datasets and dataset_store is not None:
            for ds_id in removed:
                rec_ids = [
                    r["record_id"]
                    for r in dataset_store.record_items.read()
                    .where(F.col("dataset_id") == ds_id)
                    .select("record_id")
                    .distinct()
                    .collect()
                ]
                for tbl in (
                    dataset_store.record_items,
                    dataset_store.entries,
                    dataset_store.specs,
                    dataset_store.datasets,
                ):
                    tbl.transform(
                        lambda df: df.where(F.col("dataset_id") != ds_id)
                    )
                if delete_dataset_records and self.records is not None and rec_ids:
                    self.records.delete_ids(rec_ids, self.record_id_col)
        return removed

    # -- records (project_socket.py:545-728) --------------------------------

    def assert_record_belongs(self, project_id: int, record_id: int) -> None:
        n = (
            self.project_records.read()
            .where(
                (F.col("project_id") == int(project_id))
                & (F.col("record_id") == int(record_id))
            )
            .limit(1)
            .count()
        )
        if not n:
            raise MissingDataError(
                f"Record {record_id} not found in project {project_id}"
            )

    def record_name_exists(self, project_id: int, record_name: str) -> bool:
        """lname uniqueness probe (:557-564) — lowercase compare."""
        return bool(
            self.project_records.read()
            .where(
                (F.col("project_id") == int(project_id))
                & (F.lower(F.col("name")) == record_name.lower())
            )
            .limit(1)
            .count()
        )

    def link_record(
        self,
        project_id: int,
        record_id: int,
        name: str,
        description: str = "",
        tags: Sequence[str] | None = None,
    ) -> None:
        """Adopt an EXISTING record into the project (:681-708): the link
        row alone is inserted; a live link for the pair raises
        AlreadyExistsError."""
        exists = (
            self.project_records.read()
            .where(
                (F.col("project_id") == int(project_id))
                & (F.col("record_id") == int(record_id))
            )
            .limit(1)
            .count()
        )
        if exists:
            raise AlreadyExistsError(
                f"Record {record_id} already linked to project {project_id}"
            )
        row = local_df(self.spark,
            [(int(project_id), int(record_id), name, description, list(tags or []))],
            PROJECT_RECORD_SCHEMA,
        )
        self.project_records.append(row)

    def _next_record_id(self) -> int:
        if self.records is None:
            raise MissingDataError("store has no records table")
        row = self.records.read().agg(
            F.max(F.col(self.record_id_col)).alias("m")
        ).collect()[0]
        return int(row["m"] or 0) + 1

    def add_record(
        self,
        project_id: int,
        name: str,
        description: str,
        tags: Sequence[str],
        record_row: dict,
    ) -> int:
        """New record from input + link (:586-624): the lname conflict
        gate runs BEFORE the record insert (a rejected add mutates
        nothing); the record id is allocated serially (max+1, the
        single-writer analog of the serial pk).  ``record_row`` carries
        the record's non-id columns."""
        if self.record_name_exists(project_id, name):
            raise AlreadyExistsError(
                f"Record '{name}' already exists in project {project_id}"
            )
        new_id = self._next_record_id()
        cols = [f.name for f in self.records.read().schema.fields]
        vals = [
            new_id if c == self.record_id_col else record_row.get(c) for c in cols
        ]
        rec_df = local_df(self.spark,
            [tuple(vals)], self.records.read().schema
        )
        self.records.append(rec_df)
        self.link_record(project_id, new_id, name, description, tags)
        return new_id

    def import_record(
        self,
        project_id: int,
        name: str,
        description: str,
        tags: Sequence[str],
        record_row: dict,
    ) -> int:
        """Full-record import + link (:626-658): inserts the complete
        record (insert_full_record — here one row carrying its final
        status/outputs) and links it.  The reference leaves the name
        gate to the (project_id, lname) unique constraint; surfacing it
        as the same pre-commit check keeps the no-partial-mutation
        contract."""
        if self.record_name_exists(project_id, name):
            raise AlreadyExistsError(
                f"Record '{name}' already exists in project {project_id}"
            )
        new_id = self._next_record_id()
        cols = [f.name for f in self.records.read().schema.fields]
        vals = [
            new_id if c == self.record_id_col else record_row.get(c) for c in cols
        ]
        rec_df = local_df(self.spark, [tuple(vals)], self.records.read().schema)
        self.records.append(rec_df)
        self.link_record(project_id, new_id, name, description, tags)
        return new_id

    def unlink_records(
        self,
        project_id: int,
        record_ids: Sequence[int],
        delete_records: bool = False,
    ) -> list[int]:
        """Delete link rows RETURNING the removed ids; only those cascade
        to records.delete when ``delete_records`` (:710-727)."""
        ids = [int(i) for i in record_ids]
        removed = [
            r["record_id"]
            for r in self.project_records.read()
            .where(
                (F.col("project_id") == int(project_id))
                & F.col("record_id").isin(ids)
            )
            .select("record_id")
            .collect()
        ]
        if removed:
            self.project_records.transform(
                lambda df: df.where(
                    ~(
                        (F.col("project_id") == int(project_id))
                        & F.col("record_id").isin(removed)
                    )
                )
            )
        if delete_records and self.records is not None and removed:
            self.records.delete_ids(removed, self.record_id_col)
        return removed

    def get_record_metadata(self, project_id: int) -> DataFrame:
        """Link rows joined to record type/status (:566-577) — the
        broadcast-dim join shape of j18."""
        if self.records is None:
            raise MissingDataError("store has no records table")
        links = self.project_records.read().where(
            F.col("project_id") == int(project_id)
        )
        return links.join(
            self.records.read(), on=self.record_id_col, how="inner"
        )
