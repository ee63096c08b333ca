"""tools/check.py comparator — must be exactly as strict as the driver's
TYPE-sensitive value hash (r7 lesson: pk_length_buckets/v1_variant_rollup
passed the old local gate, failed the driver, because Int64 == float64 was
treated as equal).  No Spark needed: the comparator is pandas-level."""

from __future__ import annotations

import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

from tools.check import compare


def test_int_vs_float_dtype_divergence_fails():
    """DuckDB SUM(BIGINT) → HUGEINT → fetchdf float64, Spark int64: values
    numerically equal, driver hash red — compare must FAIL."""
    spark_pdf = pd.DataFrame({"k": ["a", "b"], "s": pd.array([105, 7], dtype="int64")})
    duck_pdf = pd.DataFrame({"k": ["a", "b"], "s": [105.0, 7.0]})
    problems = compare(spark_pdf, duck_pdf)
    assert any("dtype divergence" in p for p in problems), problems


def test_matched_int_types_pass():
    spark_pdf = pd.DataFrame({"k": ["a", "b"], "s": pd.array([105, 7], dtype="int64")})
    duck_pdf = pd.DataFrame({"k": ["a", "b"], "s": pd.array([105, 7], dtype="Int64")})
    assert compare(spark_pdf, duck_pdf) == []


def test_matched_float_types_pass_and_value_mismatch_fails():
    a = pd.DataFrame({"x": [1.5, 2.5]})
    assert compare(a, pd.DataFrame({"x": [1.5, 2.5]})) == []
    bad = compare(a, pd.DataFrame({"x": [1.5, 2.6]}))
    assert bad and "mismatch" in bad[0]
