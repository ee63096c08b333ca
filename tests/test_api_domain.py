"""Domain-facade tests over the combinatorial fixture grid — the reference's
own test strategy (test_record_client_query.py: build a grid, assert exact
counts for each filter and combination)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from qcfractal_spark import api, ingest


@pytest.fixture(scope="module")
def domain(spark):
    recs = ingest.records(spark, 320).cache()
    specs = ingest.specifications(spark).cache()
    edges = ingest.record_edges(spark, 320).cache()
    entries, dspecs, items = ingest.dataset_tables(spark)
    return {
        "records": recs,
        "specs": specs,
        "edges": edges,
        "entries": entries,
        "dspecs": dspecs,
        "items": items,
    }


def test_status_filter_exact_counts(domain):
    recs = domain["records"]
    # 320 records over 7 cycling statuses: statuses 0..5 → 46, status 6 → 44
    got = {r["status"]: r["count"] for r in api.record_status_counts(recs).collect()}
    assert sum(got.values()) == 320
    f = api.RecordQueryFilters(status=["complete"])
    assert api.query_records(recs, f).count() == got["complete"]
    f2 = api.RecordQueryFilters(status=["complete", "error"])
    assert api.query_records(recs, f2).count() == got["complete"] + got["error"]


def test_combined_filters_and_elision(domain):
    recs, specs = domain["records"], domain["specs"]
    # spec filter triggers the spec join; program prog1 = spec_ids 1..16
    f = api.RecordQueryFilters(program=["prog1"])
    n_prog1 = api.query_records(recs, f, specs=specs).count()
    assert n_prog1 == recs.where(F.col("spec_id") <= 16).count()
    # combining with a status filter intersects
    f2 = api.RecordQueryFilters(program=["prog1"], status=["waiting"])
    expect = recs.where((F.col("spec_id") <= 16) & (F.col("status") == "waiting")).count()
    assert api.query_records(recs, f2, specs=specs).count() == expect
    # no spec filter → no specs table needed (join elision)
    api.query_records(recs, api.RecordQueryFilters(status=["waiting"]))


def test_time_range_and_pagination(domain):
    recs = domain["records"]
    f = api.RecordQueryFilters(
        created_after=datetime(2024, 1, 1, 1), created_before=datetime(2024, 1, 1, 2)
    )
    # created = base + i minutes → minutes 60..120 inclusive
    assert api.query_records(recs, f).count() == 61
    page1 = api.query_records(recs, api.RecordQueryFilters(limit=50))
    rows1 = [r["id"] for r in page1.collect()]
    assert rows1 == list(range(320, 270, -1))
    page2 = api.query_records(recs, api.RecordQueryFilters(cursor=rows1[-1], limit=50))
    rows2 = [r["id"] for r in page2.collect()]
    assert rows2 == list(range(270, 220, -1))


def test_parent_child_filters(domain, spark):
    recs, edges = domain["records"], domain["edges"]
    some_parent = edges.first()["parent_id"]
    f = api.RecordQueryFilters(parent_id=[some_parent])
    got = {r["id"] for r in api.query_records(recs, f, edges=edges).collect()}
    expect = {
        r["child_id"] for r in edges.where(F.col("parent_id") == some_parent).collect()
    }
    assert got == expect
    # closure: descendants of one torsiondrive span 2 levels (opt → sp)
    seeds = spark.createDataFrame([(some_parent,)], "id long")
    desc = {r["id"] for r in api.record_children(seeds, edges).collect()}
    assert expect < desc  # direct children strictly contained in closure


def test_basis_normalization(domain, spark):
    recs, specs = domain["records"], domain["specs"]
    # basis=None must match '' rows after P10 normalization
    f = api.RecordQueryFilters(basis=[None])
    n_none = api.query_records(recs, f, specs=specs).count()
    none_specs = [r["spec_id"] for r in specs.where(F.col("basis") == "").collect()]
    assert n_none == recs.where(F.col("spec_id").isin(none_specs)).count()


def test_get_records_projection_and_order(domain, spark):
    recs = domain["records"]
    out = api.get_records(spark, recs, [5, 99999, 1], include=["status"])
    rows = out.collect()
    assert [r["_input_idx"] for r in rows] == [0, 1, 2]
    assert rows[1]["status"] is None
    assert set(out.columns) == {"_input_idx", "id", "status"}


def test_dataset_matrix_and_compile_values(domain):
    entries, dspecs, items, recs = (
        domain["entries"],
        domain["dspecs"],
        domain["items"],
        domain["records"],
    )
    # every matrix cell accounted for: filled + missing = entries × specs
    filled = items.count()
    missing = api.dataset_submit_missing(entries, dspecs, items).count()
    assert filled + missing == entries.count() * dspecs.count()

    mat = api.compile_values(
        items, recs, F.element_at("properties", "return_energy"),
        spec_values=[f"spec_{k}" for k in range(4)],
    )
    assert set(mat.columns) == {"entry_name", "spec_0", "spec_1", "spec_2", "spec_3"}
    # complete-only: a cell is non-null iff its record is complete
    joined = items.join(
        recs.withColumnRenamed("id", "record_id"), on="record_id"
    ).where(F.col("status") == "complete")
    n_values = joined.count()
    total_nonnull = 0
    for row in mat.collect():
        total_nonnull += sum(row[c] is not None for c in ["spec_0", "spec_1", "spec_2", "spec_3"])
    assert total_nonnull == n_values

    props = api.get_properties_df(items, recs, ["return_energy", "missing_key"])
    assert all(not c.endswith("missing_key") for c in props.columns)  # all-null dropped


def test_status_matrix_counts(domain):
    items, recs = domain["items"], domain["records"]
    mat = api.dataset_status_matrix(items, recs)
    assert mat.agg(F.sum("count")).first()[0] == items.count()


def test_dataset_id_filter_joins_membership(domain):
    recs, items = domain["records"], domain["items"]
    f = api.RecordQueryFilters(dataset_id=[1])
    got = api.query_records(recs, f, record_items=items).count()
    member_ids = {r["record_id"] for r in items.select("record_id").collect()}
    assert got == recs.where(F.col("id").isin(list(member_ids))).count()
    # an absent dataset matches nothing; missing table raises
    assert api.query_records(
        recs, api.RecordQueryFilters(dataset_id=[999]), record_items=items
    ).count() == 0
    with pytest.raises(ValueError, match="record_items"):
        api.query_records(recs, api.RecordQueryFilters(dataset_id=[1]))
