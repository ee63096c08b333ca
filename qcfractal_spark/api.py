"""Domain facade — the reference's client query surface, Spark-native.

One function per public entry point of the reference's
``PortalClient``/socket layer, with the same filter vocabulary
(qcportal/qcportal/record_models.py:826-857 ``RecordQueryFilters``,
qcportal/client.py:907-996 ``query_records``), compiled to DataFrame plans.
A user of the reference switches by swapping HTTP calls for these calls;
steps 3-6 of the reference's query lifecycle (SURVEY §3.1) collapse into one
Catalyst plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.aggregates import status_counts
from .session import local_df
from .operators.dataset import missing_cells, status_matrix
from .operators.graph import ancestors, descendants
from .operators.pivot import compile_values_pivot, drop_all_null_columns, properties_df
from .plans.filters import keyset_page
from .plans.projection import apply_projection


@dataclass
class RecordQueryFilters:
    """Field-compatible with qcportal's RecordQueryFilters (record_models.py:826):
    every filter optional; present filters AND together; joins added only
    when needed (join elision, singlepoint/record_socket.py:332-375)."""

    record_id: Sequence[int] | None = None
    record_type: Sequence[str] | None = None
    status: Sequence[str] | None = None
    manager_name: Sequence[str] | None = None
    created_before: datetime | None = None
    created_after: datetime | None = None
    modified_before: datetime | None = None
    modified_after: datetime | None = None
    creator_user: Sequence[int | str] | None = None
    parent_id: Sequence[int] | None = None
    child_id: Sequence[int] | None = None
    dataset_id: Sequence[int] | None = None
    # spec-level filters (trigger the spec join)
    program: Sequence[str] | None = None
    driver: Sequence[str] | None = None
    method: Sequence[str] | None = None
    basis: Sequence[str] | None = None
    # pagination
    cursor: int | None = None
    limit: int | None = None


def query_records(
    records: DataFrame,
    filters: RecordQueryFilters,
    specs: DataFrame | None = None,
    edges: DataFrame | None = None,
    users: DataFrame | None = None,
    record_items: DataFrame | None = None,
) -> DataFrame:
    """The canonical query path (record_socket.py:238-368) as one plan:
    conditional joins, AND of present predicates, DISTINCT on id, keyset
    page newest-first.  Returns full rows (the reference's ids-then-hydrate
    two-step exists only to serve its client cache; one plan subsumes it)."""
    df = records
    f = filters
    preds = []
    if f.record_id is not None:
        preds.append(F.col("id").isin(list(f.record_id)))
    if f.record_type is not None:
        preds.append(F.col("record_type").isin(list(f.record_type)))
    if f.status is not None:
        preds.append(F.col("status").isin(list(f.status)))
    if f.manager_name is not None:
        preds.append(F.col("manager_name").isin(list(f.manager_name)))
    if f.created_before is not None:
        preds.append(F.col("created_on") <= F.lit(f.created_before))
    if f.created_after is not None:
        preds.append(F.col("created_on") >= F.lit(f.created_after))
    if f.modified_before is not None:
        preds.append(F.col("modified_on") <= F.lit(f.modified_before))
    if f.modified_after is not None:
        preds.append(F.col("modified_on") >= F.lit(f.modified_after))
    if f.creator_user is not None:
        ids = [v for v in f.creator_user if isinstance(v, int)]
        names = [v for v in f.creator_user if isinstance(v, str)]
        if names and users is None:
            # same contract as the spec/parent/child/dataset filters: a
            # filter whose table is missing must raise, not silently drop
            # the name predicates (records by 'alice' would simply vanish)
            raise ValueError("creator_user name filters require the users table")
        if names:
            # The reference ORs id and name matches (record_socket.py creator
            # filter).  Express the OR as one semi-join against the union of
            # the literal-id frame and the name-resolved ids — no driver-side
            # collect of the users dim; the union is users-dim-bounded and
            # broadcasts.
            uid = users.where(F.col("username").isin(names)).select(
                F.col("id").alias("creator_user_id")
            )
            if ids:
                idf = local_df(
                    df.sparkSession,
                    [(int(i),) for i in ids], "creator_user_id long"
                )
                uid = uid.unionByName(idf)
            df = df.join(
                F.broadcast(uid.dropDuplicates(["creator_user_id"])),
                on="creator_user_id",
                how="left_semi",
            )
        elif ids:
            # ids only: a plain IN predicate — scan-pushable, no join at all
            preds.append(F.col("creator_user_id").isin(ids))
        else:
            preds.append(F.lit(False))

    # spec join only if a spec filter is present (join elision)
    spec_filters = {
        "program": f.program,
        "driver": f.driver,
        "method": f.method,
        "basis": f.basis,
    }
    active_spec = {k: v for k, v in spec_filters.items() if v is not None}
    if active_spec:
        if specs is None:
            raise ValueError("spec filters require the specifications table")
        sdf = specs
        for col, vals in active_spec.items():
            if col == "basis":
                # P10: '' ↔ None normalization before compare
                vals = ["" if v is None else v.lower() for v in vals]
                sdf = sdf.where(F.coalesce(F.lower("basis"), F.lit("")).isin(vals))
            else:
                sdf = sdf.where(F.lower(col).isin([v.lower() for v in vals]))
        df = df.join(F.broadcast(sdf.select("spec_id")), on="spec_id", how="left_semi")

    # parent/child filters join the edges table (J5), aliased per direction
    if f.parent_id is not None:
        if edges is None:
            raise ValueError("parent_id filter requires the edges table")
        kids = edges.where(F.col("parent_id").isin(list(f.parent_id))).select(
            F.col("child_id").alias("id")
        )
        df = df.join(F.broadcast(kids.dropDuplicates(["id"])), on="id", how="left_semi")
    if f.child_id is not None:
        if edges is None:
            raise ValueError("child_id filter requires the edges table")
        parents = edges.where(F.col("child_id").isin(list(f.child_id))).select(
            F.col("parent_id").alias("id")
        )
        df = df.join(F.broadcast(parents.dropDuplicates(["id"])), on="id", how="left_semi")
    # dataset membership filter joins the record_items fact (J6,
    # record_socket.py:317-320 joining DatasetDirectRecordsView)
    if f.dataset_id is not None:
        if record_items is None:
            raise ValueError("dataset_id filter requires the record_items table")
        members = record_items.where(
            F.col("dataset_id").isin(list(f.dataset_id))
        ).select(F.col("record_id").alias("id"))
        # No broadcast hint: unlike parent_id/child_id (explicit
        # user-supplied id lists), dataset membership is data-sized — one
        # dataset can own tens of millions of records, and a forced
        # broadcast of that set is a driver OOM.  AQE picks the strategy
        # from the filtered size (same stance as membership_records).
        df = df.join(members.dropDuplicates(["id"]), on="id", how="left_semi")

    for p in preds:
        df = df.where(p)
    # No DISTINCT: the reference's dedup undoes inner-join fan-out, but
    # every join this builder adds is a left_semi (never row-multiplying)
    # and record ids are unique by contract — a full-row dropDuplicates
    # here was a pure wasted shuffle of every surviving record at scale.
    return keyset_page(df, "id", f.cursor, f.limit)


def get_records(
    spark, records: DataFrame, ids: Sequence[int], include=None, exclude=None,
    missing_ok: bool = True,
) -> DataFrame:
    """Bulk get in input order with projection (get_general + include/exclude,
    db_socket/helpers.py:490-573)."""
    from .operators.keyed import bulk_get_ordered

    out = bulk_get_ordered(spark, records, ids, id_col="id", missing_ok=missing_ok)
    if include or exclude:
        keep = ["_input_idx", "id"]
        proj = apply_projection(out.drop("_input_idx"), include, exclude)
        out = out.select(*dict.fromkeys(keep + proj.columns))
    return out


def record_status_counts(records: DataFrame) -> DataFrame:
    """A2 (base_record_socket.py:469-477)."""
    return status_counts(records)


def dataset_status_matrix(record_items: DataFrame, records: DataFrame) -> DataFrame:
    """A3 (base_dataset_socket.py:189-219)."""
    return status_matrix(record_items, records)


def dataset_submit_missing(entries: DataFrame, specs: DataFrame, items: DataFrame) -> DataFrame:
    """Entry×spec cells needing records (base_dataset_socket.py:1254-1443)."""
    return missing_cells(
        entries.select(F.col("name").alias("entry_name")),
        specs.select(F.col("name").alias("specification_name")),
        items,
        entry_col="entry_name",
        spec_col="specification_name",
    )


def compile_values(
    record_items: DataFrame,
    records: DataFrame,
    value,
    spec_values: Sequence[str] | None = None,
    complete_only: bool = True,
) -> DataFrame:
    """dataset.compile_values (qcportal/dataset_models.py:2168-2265): join
    the matrix to records, extract a value expression, pivot entry×spec."""
    joined = record_items.join(
        records.withColumnRenamed("id", "record_id"), on="record_id", how="inner"
    )
    if complete_only:
        joined = joined.where(F.col("status") == "complete")
    return compile_values_pivot(
        joined, "entry_name", "specification_name", value, spec_values=spec_values
    )


def get_properties_df(
    record_items: DataFrame,
    records: DataFrame,
    keys: Sequence[str],
    spec_values: Sequence[str] | None = None,
) -> DataFrame:
    """get_properties_df (dataset_models.py:2267-2314) incl. all-NaN column
    dropping."""
    joined = record_items.join(
        records.withColumnRenamed("id", "record_id"), on="record_id", how="inner"
    ).where(F.col("status") == "complete")
    wide = properties_df(
        joined, "entry_name", "specification_name", "properties", keys, spec_values
    )
    return drop_all_null_columns(wide, keep=["entry_name"])


def record_children(seeds: DataFrame, edges: DataFrame, max_depth=None) -> DataFrame:
    """All descendants (record_socket.py:150-162)."""
    return descendants(seeds, edges, max_depth=max_depth)


def record_parents(seeds: DataFrame, edges: DataFrame, max_depth=None) -> DataFrame:
    """All ancestors (record_socket.py:195-208)."""
    return ancestors(seeds, edges, max_depth=max_depth)
