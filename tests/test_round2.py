"""Round-2 additions: F10 formula canonicalization, D4 short description,
S5 mixed id-or-object insert, and the S2 pushdown/broadcast guard."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from qcfractal_spark.functions.scalars import (
    order_formula_py,
    order_molecular_formula,
    short_description,
)
from qcfractal_spark.operators.keyed import bulk_get_ordered, insert_mixed_classify

SETTINGS = dict(max_examples=20, deadline=None)


# ---------------------------------------------------------------- F10 ------

HILL_CASES = {
    # qcelemental order_molecular_formula semantics (Hill system)
    "O2H4C2": "C2H4O2",  # carbon present: C, H, then alphabetical
    "H2O": "H2O",  # no carbon: alphabetical (H before O)
    "OH2": "H2O",
    "ClNaH": "ClHNa",  # no carbon: alphabetical by symbol string ("Cl" < "H")
    "CH4": "CH4",
    "C6H12O6": "C6H12O6",
    "SCl2": "Cl2S",
    "C": "C",
    "HC": "CH",
}


def test_order_formula_py_hill_cases():
    for raw, want in HILL_CASES.items():
        assert order_formula_py(raw) == want, raw


def test_order_molecular_formula_matches_python_mirror(spark):
    rows = [(r,) for r in HILL_CASES]
    df = spark.createDataFrame(rows, "raw string").select(
        "raw", order_molecular_formula("raw").alias("hill")
    )
    got = {r["raw"]: r["hill"] for r in df.collect()}
    assert got == HILL_CASES


_ELEMENTS = ["H", "C", "N", "O", "S", "P", "Cl", "Na", "Fe", "Br"]


@given(
    picks=st.lists(
        st.tuples(st.sampled_from(_ELEMENTS), st.integers(1, 40)),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    )
)
@settings(**SETTINGS)
def test_order_formula_property(spark_global, picks):
    """Spark column function ≡ python mirror on arbitrary unique-element
    formulas (the fixture invariant the registry query relies on)."""
    raw = "".join(el + (str(n) if n > 1 else "") for el, n in picks)
    df = spark_global.createDataFrame([(raw,)], "raw string").select(
        order_molecular_formula("raw").alias("hill")
    )
    assert df.collect()[0]["hill"] == order_formula_py(raw)


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


# ---------------------------------------------------------------- D4 -------


def test_short_description(spark):
    rows = [
        ("singlepoint", "H2O", "prog1", "hf", "sto-3g"),
        ("singlepoint", "CH4", "prog1", None, ""),
        ("optimization", "H2O", "prog2", "b3lyp", "def2-tzvp"),
        ("torsiondrive", "H2O", "prog1", "hf", "sto-3g"),
    ]
    df = spark.createDataFrame(
        rows, "record_type string, formula string, program string, method string, basis string"
    ).select(
        short_description(
            F.col("record_type"),
            F.col("formula"),
            F.col("program"),
            F.col("method"),
            F.col("basis"),
        ).alias("d")
    )
    got = [r["d"] for r in df.collect()]
    assert got == [
        "H2O prog1/hf/sto-3g",
        "CH4 prog1/(none)/(none)",
        "H2O prog2+prog2/b3lyp/def2-tzvp",
        "short_description not implemented for torsiondrive",
    ]


# ---------------------------------------------------------------- S5 -------


def test_insert_mixed_classify(spark):
    table = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
    )
    items = [
        1,  # existing id
        99,  # missing id -> error
        {"id": 10, "name": "zz"},  # new object -> inserted
        {"id": 11, "name": "b"},  # object matching existing key -> existing
        {"id": 12, "name": "zz"},  # in-batch duplicate -> existing (of idx 2)
        3.14,  # bad type -> error
        2,  # existing id
    ]
    inserted, existing, errors = insert_mixed_classify(
        spark, table, items, id_col="id", search_cols=("name",)
    )
    assert inserted == [2]
    assert existing == [0, 3, 4, 6]
    assert [i for i, _ in errors] == [1, 5]
    assert "not found" in errors[0][1]
    assert "not understood" in errors[1][1]


# ---------------------------------------------------------------- S2 -------


def test_bulk_get_pushdown_plan(spark):
    """The id list must reach the parquet scan as a pushed In filter and the
    broadcast side must be the filtered (id-sized) scan — never the full
    fact table (VERDICT r1 #4)."""
    from qcfractal_spark.catalog import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    df = bulk_get_ordered(
        spark, orders, [1, 2, 3, 77777777], id_col="o_orderkey", missing_ok=True
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "In(o_orderkey" in plan
    assert "SortMergeJoin" not in plan
    got = df.collect()
    assert [r["_input_idx"] for r in got] == [0, 1, 2, 3]
    assert got[3]["o_custkey"] is None  # missing id survives as null row


def test_bulk_get_large_list_falls_back_to_shuffle(spark):
    from qcfractal_spark.catalog import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    df = bulk_get_ordered(
        spark,
        orders,
        list(range(1, 30)),
        id_col="o_orderkey",
        missing_ok=False,
        max_pushdown_ids=10,
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    # beyond the threshold there must be no broadcast of the fact table
    assert "In(o_orderkey" not in plan
    assert df.count() == len([r for r in df.collect() if r["o_custkey"] is not None])
