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


def test_local_df_naive_datetime_is_utc_both_paths(spark):
    """r15 ADVICE (medium): naive datetimes must mean UTC regardless of the
    driver's OS timezone — local_df normalizes them to tz-aware UTC before
    the frame is built, so the Arrow path and the classic fallback agree."""
    from datetime import timezone

    naive = datetime(2024, 1, 2, 3, 4, 5)
    aware = naive.replace(tzinfo=timezone.utc)
    got_naive = local_df(spark, [(1, naive)], "id long, ts timestamp").collect()
    got_aware = local_df(spark, [(1, aware)], "id long, ts timestamp").collect()
    assert got_naive == got_aware
    # Under the engine's UTC session tz the collected (naive) value must be
    # the same wall clock that went in.
    assert got_naive[0]["ts"] == naive


def test_local_df_empty_preserves_nullability_and_metadata(spark):
    """r15 ADVICE: the empty path must reproduce the recorded schema
    exactly (MutableTable.empty feeds commit schemas through it) — the old
    cast-NULL projection coerced every field nullable and dropped field
    metadata."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    st = StructType(
        [
            StructField("a", LongType(), nullable=False, metadata={"k": "v"}),
            StructField("b", StringType(), nullable=True),
        ]
    )
    df = local_df(spark, [], st)
    assert df.count() == 0
    assert [f.nullable for f in df.schema.fields] == [False, True]
    assert df.schema.fields[0].metadata == {"k": "v"}
    assert "ExistingRDD" not in _plan(df)
