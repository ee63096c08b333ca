"""local_df (r15 optimization): small driver-side relations must become
LocalTableScan (Arrow) rather than pickled Python RDDs, with values
identical to the classic createDataFrame path for every type the engine
ships through it (longs, strings, timestamps, arrays, binary, NULLs)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from qcfractal_spark.session import local_df

SCHEMA = (
    "id long, s string, ts timestamp, arr array<string>, bin binary, d double"
)
ROWS = [
    (1, None, datetime(2024, 1, 2, 3), ["a", "b"], b"\x00\x01", 2.5),
    (None, "x", None, None, None, None),
]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_local_df_is_local_table_scan(spark):
    df = local_df(spark, ROWS, SCHEMA)
    plan = _plan(df)
    assert "LocalTableScan" in plan and "ExistingRDD" not in plan


def test_local_df_values_match_classic_path(spark):
    got = local_df(spark, ROWS, SCHEMA).collect()
    want = spark.createDataFrame(ROWS, SCHEMA).collect()
    assert sorted(map(tuple, got), key=str) == sorted(map(tuple, want), key=str)
    assert local_df(spark, ROWS, SCHEMA).dtypes == spark.createDataFrame(ROWS, SCHEMA).dtypes


def test_local_df_empty_has_schema_and_no_python_rdd(spark):
    df = local_df(spark, [], SCHEMA)
    assert df.count() == 0
    assert df.dtypes == spark.createDataFrame([], SCHEMA).dtypes
    assert "ExistingRDD" not in _plan(df)


def test_union_find_labels_are_local(spark):
    from qcfractal_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (None, 5)], "id_a long, id_b long"
    )
    comp = connected_components(edges, "id_a", "id_b", approx_edges=4)
    assert "LocalTableScan" in _plan(comp)
    got = sorted((r["id"], r["component"]) for r in comp.collect())
    assert got == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]
