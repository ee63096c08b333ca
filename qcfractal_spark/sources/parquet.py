"""Parquet sources/sinks: table reads and dataset-view snapshot export.

Reference: dataset "view" files are SQLite snapshots streamed out of
Postgres in 20-record batches
(qcfractal/qcfractal/components/dataset_processing/views.py:26-186).  The
Spark-native snapshot is a parquet directory per table written in one
distributed job — no driver-side batching; the transitive-children
expansion the view writer does row-by-row is the graph closure operator
(operators/graph.py) run once up front.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..catalog import normalize_ntz

    return normalize_ntz(spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))


def snapshot_export(
    tables: dict[str, DataFrame], out_dir: str, mode: str = "overwrite"
) -> dict[str, str]:
    """Export a set of DataFrames as a snapshot directory (S8).

    One parquet dataset per logical table; partition counts are whatever the
    upstream plan produced (callers coalesce small dimension tables).
    Returns table → path."""
    paths = {}
    for name, df in tables.items():
        path = os.path.join(out_dir, name)
        df.write.mode(mode).parquet(path)
        paths[name] = path
    return paths


def retention_delete(df: DataFrame, ts_col: str, cutoff) -> DataFrame:
    """Retention as a rewrite plan (S7/T6, serverinfo/socket.py:601-643):
    with plain parquet, TTL = filter-and-rewrite (or partition drop when the
    table is date-partitioned — the 100 TB path); with Delta it would be a
    metadata-only DELETE.  Returns the surviving rows.

    NULL timestamps are never expired — the reference deletes
    ``WHERE ts < cutoff``, which a NULL cannot satisfy (same rule as
    ``MutableTable.retention_delete``; a bare ``ts >= cutoff`` silently
    dropped NULL-ts rows)."""
    from pyspark.sql import functions as F

    return df.where(F.col(ts_col).isNull() | (F.col(ts_col) >= F.lit(cutoff)))
