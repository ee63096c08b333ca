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


# ------------------------------------------------------------ similarity ---


def test_lit_array_bit_exact(spark):
    """lit_array builds literals through the SQL parser; values must bind to
    the identical IEEE doubles as the Python floats."""
    import struct

    from qcfractal_spark.functions.similarity import lit_array

    vals = [0.1, -1.234567890123456e-05, 2.0, 5e-324, 1.7976931348623157e308, -0.0]
    got = spark.range(1).select(lit_array(vals).alias("a")).first()["a"]
    assert all(
        struct.pack("<d", a) == struct.pack("<d", b) for a, b in zip(got, vals)
    )


def test_lsh_bucket_py_matches_column(spark):
    """Driver-side bucket (used for the query vector) must be bit-identical
    to the JVM fold used for row vectors."""
    from qcfractal_spark.catalog import load_table
    from qcfractal_spark.functions.similarity import (
        _hyperplanes,
        lsh_bucket,
        lsh_bucket_py,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    planes = _hyperplanes(64, 8)
    rows = emb.select(
        "vec_id",
        F.col("embedding").alias("v"),
        lsh_bucket(F.col("embedding"), planes).alias("b"),
    ).collect()
    for r in rows:
        assert lsh_bucket_py(list(r["v"]), planes) == r["b"], r["vec_id"]


# ------------------------------------------------------------- winnowing ---


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing's defining property: two documents sharing a substring of
    length ≥ k + w - 1 share at least one selected fingerprint."""
    from qcfractal_spark.functions.dedup import winnow_fingerprints, winnow_pairs

    k, w = 8, 4
    shared = "the quick brown fox jumps over the lazy dog"  # 43 >= k+w-1
    docs = spark.createDataFrame(
        [
            (1, "AAAA xxxx " + shared + " yyyy unique one text"),
            (2, "BBBB zzzz different prefix " + shared + " qqq two"),
            (3, "completely unrelated content with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=k, w=w)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "docs sharing a >=k+w-1 substring must share a fp"
    pairs = {
        (r["id_a"], r["id_b"]): r["n_common"]
        for r in winnow_pairs(docs, k=k, w=w, min_common=1).collect()
    }
    assert (1, 2) in pairs


def test_stream_dedup_within_watermark(spark):
    """Streaming exact dedup drops key repeats within the watermark horizon;
    state is bounded (dropDuplicatesWithinWatermark, not dropDuplicates)."""
    import os
    import tempfile
    from datetime import datetime

    from qcfractal_spark.streaming.ingest import stream_dedup

    rows = [
        (1, datetime(2024, 1, 1, 0, 0), "fp_a"),
        (2, datetime(2024, 1, 1, 0, 5), "fp_a"),  # dup of fp_a -> dropped
        (3, datetime(2024, 1, 1, 0, 10), "fp_b"),
        (4, datetime(2024, 1, 1, 0, 15), "fp_b"),  # dup of fp_b -> dropped
        (5, datetime(2024, 1, 1, 0, 20), "fp_c"),
    ]
    src = spark.createDataFrame(rows, "id long, ts timestamp, fp string")
    # batch arm
    assert stream_dedup(src, ("fp",)).count() == 3
    # streaming arm
    with tempfile.TemporaryDirectory() as d:
        land = os.path.join(d, "landing")
        src.coalesce(1).write.parquet(land)
        stream = (
            spark.readStream.schema(src.schema)
            .parquet(land)
        )
        out = stream_dedup(stream, ("fp",), ts_col="ts", watermark="1 hour")
        qh = (
            out.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        qh.awaitTermination(120)
        got = sorted(
            r["fp"] for r in spark.sql("SELECT fp FROM dedup_out").collect()
        )
        assert got == ["fp_a", "fp_b", "fp_c"]


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
