"""Keyed bulk access and insert-dedup — the reference's "socket helpers".

Reference shapes (qcfractal/qcfractal/db_socket/helpers.py):
- ``get_general``/``get_general_multi`` (:490-573): fetch rows for an id
  list, returning results **in input order** with None gaps for missing ids
  (missing_ok).  S2/O5 in SURVEY §2.
- ``insert_general`` (:317-406, 644-725): query-first bulk insert with
  dedup — find existing rows by their search columns, insert only the
  missing, and report per-input-row (inserted|existing) indices.  S3/J9/A16.
- ``insert_mixed_general`` (:816-888): ids are validated to exist, full
  objects are inserted.  S5.

Scale notes: the reference chunks id lists into 500-row IN clauses to bound
SQL statement size; in Spark the id list becomes a DataFrame and the lookup
a join, so no chunking is needed — for small lists Catalyst broadcasts the
ids to every executor (verify BroadcastHashJoin in the plan), for huge lists
it shuffles both sides on the key, either of which survives 100 TB.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bulk_get_ordered(
    spark: SparkSession,
    table: DataFrame,
    ids: Sequence[Any],
    id_col: str = "id",
    missing_ok: bool = True,
) -> DataFrame:
    """Fetch rows by id preserving the caller's input order.

    Returns the table columns plus ``_input_idx``; with ``missing_ok`` the
    missing ids survive as all-NULL rows (the reference returns None in that
    slot).  Ordering is carried by an explicit index column (hard part #7 in
    SURVEY §7) because row order is never implicit in Spark.
    """
    ids_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(ids)], schema=f"_input_idx long, {id_col} long"
    )
    how = "left" if missing_ok else "inner"
    joined = ids_df.join(F.broadcast(table), on=id_col, how=how)
    return joined.orderBy("_input_idx")


def insert_dedup_classify(
    table: DataFrame,
    batch: DataFrame,
    search_cols: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """Classify an input batch against a table by its natural key.

    Returns ``(to_insert, classified)`` where ``to_insert`` is the
    deduplicated missing rows (left_anti join — J9) and ``classified`` is the
    batch annotated with ``_existing: boolean`` (the reference's
    InsertMetadata inserted_idx/existing_idx split) and ``_dup_of`` count for
    in-batch duplicates (helpers.py:234-254 ``map_duplicates``).
    """
    keys = list(search_cols)
    deduped = batch.dropDuplicates(keys)
    to_insert = deduped.join(table.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")
    existing_flag = (
        table.select(*keys).dropDuplicates(keys).withColumn("_existing", F.lit(True))
    )
    classified = batch.join(existing_flag, on=keys, how="left").withColumn(
        "_existing", F.coalesce(F.col("_existing"), F.lit(False))
    )
    return to_insert, classified


def upsert_classify(
    table: DataFrame, batch: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """``INSERT ... ON CONFLICT DO NOTHING RETURNING`` classification (S4).

    The write itself is a storage concern (Delta MERGE when available); the
    query semantics — which input rows are new — is the anti-join.
    """
    keys = list(key_cols)
    return (
        batch.dropDuplicates(keys)
        .join(
            table.select(*keys).dropDuplicates(keys).withColumn("_conflict", F.lit(True)),
            on=keys,
            how="left",
        )
        .withColumn("_inserted", F.col("_conflict").isNull())
        .drop("_conflict")
    )
