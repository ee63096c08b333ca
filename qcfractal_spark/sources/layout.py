"""Partitioned table layouts — the engine's answer to the reference's
B-tree/GIN indexes (SURVEY §4: "partition + cluster by (record_type,
status, id); different physics").

At 100 TB the fact tables are written date-partitioned (telemetry,
lineitem-like facts) or key-partitioned (records by record_type/status);
every time-range or type filter then prunes whole directories before any IO.
``write_partitioned``/``read_partitioned`` wrap the layout convention;
``pruned_files`` exposes how many files a filtered plan actually touches so
tests (and operators) can assert pruning instead of hoping for it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    derive_date_from: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a partitioned parquet layout; optionally derive a ``p_date``
    partition column from a timestamp column (the standard telemetry
    layout: access_log partitioned by day, serverinfo retention = partition
    drop)."""
    cols = list(partition_cols)
    if derive_date_from is not None:
        df = df.withColumn("p_date", F.to_date(F.col(derive_date_from)))
        cols = ["p_date", *cols]
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def pruned_files(df: DataFrame) -> int:
    """Number of distinct parquet files a (filtered) plan actually reads at
    execution — partition pruning makes this a strict subset of the table's
    files.  (``DataFrame.inputFiles()`` reports the unpruned relation, so we
    observe the executed scan via ``input_file_name()``.)"""
    return df.select(F.input_file_name().alias("f")).distinct().count()
