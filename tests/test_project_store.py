"""Project link/unlink/add/import ops (sources/project_store.py;
reference project_socket.py:483-728).  Registry parity is covered by
s16_project_links; these tests pin the conflict, cascade, and
returning-ids arms the fixture exercises only partially."""

from __future__ import annotations

import pytest

from qcfractal_spark.sources.dataset_store import DATASET_SCHEMA, DatasetStore
from qcfractal_spark.sources.project_store import (
    PROJECT_RECORD_SCHEMA,
    PROJECT_SCHEMA,
    AlreadyExistsError,
    MissingDataError,
    ProjectStore,
)
from qcfractal_spark.sources.table import MutableTable

RECORD_SCHEMA = "record_id long, record_type string, status string"
META = {"name": "ds_a", "description": "A", "tagline": "tA", "tags": ["x"]}


def _store(spark, tmp_path, links=()):
    records = MutableTable(spark, str(tmp_path / "p" / "records"))
    records.overwrite(
        spark.createDataFrame(
            [(1, "sp", "complete"), (2, "sp", "error"), (3, "opt", "complete")],
            RECORD_SCHEMA,
        )
    )
    st = ProjectStore(spark, str(tmp_path / "p"), records=records)
    st.init(
        spark.createDataFrame(
            [(1, "main", "d", "t", []), (2, "other", "d2", "t2", [])],
            PROJECT_SCHEMA,
        ),
        project_records=spark.createDataFrame(
            [(p, r, n, d, []) for p, r, n, d in links], PROJECT_RECORD_SCHEMA
        ),
    )
    return st


def test_link_dataset_defaults_and_overrides(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.link_dataset(1, 10, META)
    st.link_dataset(1, 11, META, name="custom", tagline="tX")
    rows = {
        r["dataset_id"]: r.asDict()
        for r in st.project_datasets.read().collect()
    }
    assert rows[10]["name"] == "ds_a" and rows[10]["tags"] == ["x"]
    assert rows[11]["name"] == "custom" and rows[11]["tagline"] == "tX"


def test_link_dataset_duplicate_raises_and_mutates_nothing(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.link_dataset(1, 10, META)
    v = st.project_datasets.current_version()
    with pytest.raises(AlreadyExistsError):
        st.link_dataset(1, 10, META)
    assert st.project_datasets.current_version() == v
    # the same dataset CAN link to a different project
    st.link_dataset(2, 10, META)
    assert st.project_datasets.read().count() == 2


def test_unlink_datasets_returns_only_removed_and_cascades(spark, tmp_path):
    st = _store(spark, tmp_path)
    ds = DatasetStore(spark, str(tmp_path / "ds"))
    ds.init(
        spark.createDataFrame([(10, "sp", "ds_a", "d", "t", 1)], DATASET_SCHEMA),
        spark.createDataFrame(
            [(10, "e1", "p")], "dataset_id long, entry_name string, payload string"
        ),
        spark.createDataFrame(
            [(10, "sA", "a", 7)],
            "dataset_id long, name string, description string, specification_id long",
        ),
        spark.createDataFrame(
            [(10, "e1", "sA", 2)],
            "dataset_id long, entry_name string, specification_name string, "
            "record_id long",
        ),
    )
    st.link_dataset(1, 10, META)
    # 99 was never linked: RETURNING semantics — only 10 comes back
    removed = st.unlink_datasets(
        1, [10, 99], dataset_store=ds, delete_datasets=True,
        delete_dataset_records=True,
    )
    assert removed == [10]
    assert st.project_datasets.read().count() == 0
    assert ds.datasets.read().count() == 0
    assert ds.entries.read().count() == 0
    assert ds.specs.read().count() == 0
    assert ds.record_items.read().count() == 0
    # delete_dataset_records cascaded to the records table (record 2)
    got = sorted(r["record_id"] for r in st.records.read().collect())
    assert got == [1, 3]


def test_unlink_datasets_without_delete_keeps_dataset(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.link_dataset(1, 10, META)
    assert st.unlink_datasets(1, [10]) == [10]
    assert st.records.read().count() == 3


def test_link_record_and_assert_belongs(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.link_record(1, 2, "rec_b", "adopted")
    st.assert_record_belongs(1, 2)
    with pytest.raises(MissingDataError):
        st.assert_record_belongs(2, 2)
    with pytest.raises(AlreadyExistsError):
        st.link_record(1, 2, "other_name")


def test_record_name_gate_is_case_insensitive(spark, tmp_path):
    st = _store(spark, tmp_path, links=[(1, 1, "MyRec", "d")])
    assert st.record_name_exists(1, "myrec")
    assert not st.record_name_exists(2, "myrec")
    v = st.records.current_version()
    with pytest.raises(AlreadyExistsError):
        st.add_record(1, "MYREC", "d", [], {"record_type": "sp", "status": "A"})
    # the lname gate ran BEFORE the record insert: nothing committed
    assert st.records.current_version() == v


def test_add_and_import_allocate_serial_ids(spark, tmp_path):
    st = _store(spark, tmp_path)
    a = st.add_record(1, "n1", "d", [], {"record_type": "sp", "status": "A"})
    b = st.import_record(2, "n1", "d", [], {"record_type": "sp", "status": "C"})
    assert (a, b) == (4, 5)  # max existing id 3, then serial
    # same name in a DIFFERENT project is fine; same project is gated
    meta = {r["record_id"]: r for r in st.get_record_metadata(1).collect()}
    assert meta[4]["status"] == "A" and meta[4]["name"] == "n1"
    with pytest.raises(AlreadyExistsError):
        st.import_record(2, "N1", "d", [], {"record_type": "sp", "status": "C"})


def test_unlink_records_cascade_only_removed(spark, tmp_path):
    st = _store(
        spark, tmp_path,
        links=[(1, 1, "a", "d"), (1, 2, "b", "d"), (2, 2, "b2", "d")],
    )
    removed = st.unlink_records(1, [2, 3, 99], delete_records=True)
    assert removed == [2]  # 3 and 99 were never linked to project 1
    # record 2 deleted from the records table; 1 and 3 survive
    assert sorted(r["record_id"] for r in st.records.read().collect()) == [1, 3]
    # project 2's link row to the deleted record is untouched (the
    # reference cascades via records.delete, not via other projects)
    assert st.project_records.read().where("project_id = 2").count() == 1
