"""operators/joins.py:spec_chain_join — J2 join-ELISION plan contracts
(VERDICT r10 item 4): each spec level joins ONLY when a filter or
projection needs it (reference optimization/record_socket.py:413-457
builds the statement lazily the same way).  Registry parity vs the
3-table DuckDB oracle is covered by test_queries_oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from qcfractal_spark.operators.joins import spec_chain_join


def _tables(spark):
    records = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 10), (4, 12)], "rec_id long, spec_id long"
    )
    spec = spark.createDataFrame(
        [(10, "s10", 100), (11, "s11", 101), (12, "s12", 100)],
        "spec_id long, spec_name string, sub_id long",
    )
    subspec = spark.createDataFrame(
        [(100, "basisA"), (101, "basisB")], "sub_id long, basis string"
    )
    return records, spec, subspec


def _chain(records, spec, subspec, **kw):
    return spec_chain_join(
        records,
        spec,
        subspec,
        record_spec_key=("spec_id", "spec_id"),
        spec_subspec_key=("sub_id", "sub_id"),
        **kw,
    )


def _njoins(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Join")


def test_no_filters_elides_every_join(spark):
    records, spec, subspec = _tables(spark)
    df = _chain(records, spec, subspec)
    assert _njoins(df) == 0  # bare record scan
    assert df.columns == ["rec_id", "spec_id"]
    assert df.count() == 4


def test_spec_only_joins_one_level(spark):
    records, spec, subspec = _tables(spark)
    df = _chain(records, spec, subspec, spec_cols=["spec_name"])
    assert _njoins(df) == 1
    got = {(r["rec_id"], r["spec_name"]) for r in df.collect()}
    assert got == {(1, "s10"), (2, "s11"), (3, "s10"), (4, "s12")}


def test_subspec_filter_bridges_through_spec(spark):
    """A subspec-level filter with NO spec columns requested still needs
    the spec join as the bridge — two joins, filter applied."""
    records, spec, subspec = _tables(spark)
    df = _chain(
        records, spec, subspec, subspec_filter=F.col("basis") == "basisA"
    )
    assert _njoins(df) == 2
    assert {r["rec_id"] for r in df.collect()} == {1, 3, 4}
    assert df.columns == ["rec_id", "spec_id"]  # projection stays record-level


def test_full_chain_with_both_filters(spark):
    records, spec, subspec = _tables(spark)
    df = _chain(
        records,
        spec,
        subspec,
        spec_cols=["spec_name"],
        subspec_cols=["basis"],
        spec_filter=F.col("spec_name") != "s12",
        subspec_filter=F.col("basis") == "basisA",
    )
    assert _njoins(df) == 2
    got = {(r["rec_id"], r["spec_name"], r["basis"]) for r in df.collect()}
    assert got == {(1, "s10", "basisA"), (3, "s10", "basisA")}


def test_joins_are_broadcast(spark):
    """Both dimension levels broadcast — the record side never shuffles
    (no Exchange hash-partitioning on the probe side)."""
    records, spec, subspec = _tables(spark)
    df = _chain(
        records,
        spec,
        subspec,
        spec_cols=["spec_name"],
        subspec_cols=["basis"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


# -- N-level generalization (VERDICT r11 item 4) ------------------------------


def _tables3(spark):
    records, spec, subspec = _tables(spark)
    subsub = spark.createDataFrame(
        [(100, "progX"), (101, "progY")], "sub_id long, prog string"
    )
    # subspec gains a key into the third level (its own sub_id doubles)
    return records, spec, subspec, subsub


def _chain3(records, spec, subspec, subsub, l1=None, l2=None, l3=None):
    from qcfractal_spark.operators.joins import spec_chain_join_n

    l1, l2, l3 = l1 or {}, l2 or {}, l3 or {}
    return spec_chain_join_n(
        records,
        [
            {"df": spec, "key": ("spec_id", "spec_id"), **l1},
            {"df": subspec, "key": ("sub_id", "sub_id"), **l2},
            {"df": subsub, "key": ("sub_id", "sub_id"), **l3},
        ],
    )


def test_n_level_elision_depths(spark):
    """The chain joins exactly levels 0..deepest-needed: 0, 1, 2, and 3
    joins as the needed depth moves down the chain."""
    records, spec, subspec, subsub = _tables3(spark)
    assert _njoins(_chain3(records, spec, subspec, subsub)) == 0
    assert (
        _njoins(_chain3(records, spec, subspec, subsub, l1={"cols": ["spec_name"]}))
        == 1
    )
    assert (
        _njoins(_chain3(records, spec, subspec, subsub, l2={"cols": ["basis"]})) == 2
    )
    df3 = _chain3(records, spec, subspec, subsub, l3={"cols": ["prog"]})
    assert _njoins(df3) == 3
    # deep-level projection bridges through both intermediate levels
    got = {(r["rec_id"], r["prog"]) for r in df3.collect()}
    assert got == {(1, "progX"), (2, "progY"), (3, "progX"), (4, "progX")}


def test_n_level_full_chain_filters_and_broadcast(spark):
    records, spec, subspec, subsub = _tables3(spark)
    df = _chain3(
        records,
        spec,
        subspec,
        subsub,
        l1={"cols": ["spec_name"], "filter": F.col("spec_name") != "s12"},
        l2={"cols": ["basis"]},
        l3={"cols": ["prog"], "filter": F.col("prog") == "progX"},
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan and "Exchange hashpartitioning" not in plan
    got = {(r["rec_id"], r["spec_name"], r["basis"], r["prog"]) for r in df.collect()}
    assert got == {(1, "s10", "basisA", "progX"), (3, "s10", "basisA", "progX")}


def test_two_level_api_delegates_identically(spark):
    """spec_chain_join (the J2 API) now routes through the N-level
    builder — same rows, same single-broadcast plan as before."""
    records, spec, subspec = _tables(spark)
    df = _chain(records, spec, subspec, spec_cols=["spec_name"])
    assert _njoins(df) == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 1
