"""Dataset clone / copy_from (sources/dataset_store.py; reference
base_dataset_socket.py:1668-1945).  Registry parity is covered by
s14_dataset_clone; these tests pin the conflict/skip/error arms the
fixture deliberately avoids."""

from __future__ import annotations

import pytest

from qcfractal_spark.sources.dataset_store import (
    DATASET_SCHEMA,
    DatasetCopyError,
    DatasetStore,
)

ENTRY_SCHEMA = "dataset_id long, entry_name string, payload string"
SPEC_SCHEMA = (
    "dataset_id long, name string, description string, specification_id long"
)
ITEM_SCHEMA = (
    "dataset_id long, entry_name string, specification_name string, record_id long"
)


def _store(spark, tmp_path, *, dst_entries=(), dst_specs=(), dst_type="sp"):
    st = DatasetStore(spark, str(tmp_path / "ds"))
    st.init(
        spark.createDataFrame(
            [(1, "sp", "main", "d", "t0", 1), (2, dst_type, "other", "d2", "t1", 2)],
            DATASET_SCHEMA,
        ),
        spark.createDataFrame(
            [(1, "e1", "p1"), (1, "e2", "p2"), (1, "e3", "p3")]
            + [(2, n, p) for n, p in dst_entries],
            ENTRY_SCHEMA,
        ),
        spark.createDataFrame(
            [(1, "sA", "a", 100), (1, "sB", "b", 200)]
            + [(2, n, d, i) for n, d, i in dst_specs],
            SPEC_SCHEMA,
        ),
        spark.createDataFrame(
            [(1, "e1", "sA", 10), (1, "e2", "sA", 11), (1, "e2", "sB", 12)],
            ITEM_SCHEMA,
        ),
    )
    return st


def test_copy_from_full_and_filtered(spark, tmp_path):
    st = _store(spark, tmp_path)
    out = st.copy_from(1, 2, entry_names=["e1", "e2"], copy_records=True)
    assert out == {"specs": 2, "entries": 2, "record_items": 3}
    items = {
        (r["entry_name"], r["specification_name"], r["record_id"])
        for r in st.record_items.read().where("dataset_id = 2").collect()
    }
    assert items == {("e1", "sA", 10), ("e2", "sA", 11), ("e2", "sB", 12)}
    # spec filter applies to items too
    st2 = _store(spark, tmp_path / "b")
    out = st2.copy_from(1, 2, specification_names=["sA"], copy_records=True)
    assert out == {"specs": 1, "entries": 3, "record_items": 2}


def test_same_name_same_id_spec_skips_silently(spark, tmp_path):
    st = _store(spark, tmp_path, dst_specs=[("sA", "a", 100)])
    out = st.copy_from(1, 2, copy_specifications=True)
    assert out["specs"] == 1  # only sB inserted; sA skipped
    got = {
        (r["name"], r["specification_id"])
        for r in st.specs.read().where("dataset_id = 2").collect()
    }
    assert got == {("sA", 100), ("sB", 200)}


def test_same_name_different_id_spec_conflicts_and_mutates_nothing(spark, tmp_path):
    st = _store(spark, tmp_path, dst_specs=[("sA", "a", 999)])
    with pytest.raises(DatasetCopyError, match="specifications with the same name"):
        st.copy_from(1, 2, copy_records=True)
    # rejected copy mutates NOTHING (conflict gates run before any commit)
    assert st.entries.read().where("dataset_id = 2").count() == 0
    assert st.record_items.read().where("dataset_id = 2").count() == 0
    assert st.specs.read().where("dataset_id = 2").count() == 1


def test_entry_name_conflict_rejects(spark, tmp_path):
    st = _store(spark, tmp_path, dst_entries=[("e2", "other-payload")])
    with pytest.raises(DatasetCopyError, match="entries with the same name"):
        st.copy_from(1, 2, copy_entries=True)
    assert st.entries.read().where("dataset_id = 2").count() == 1


def test_type_mismatch_and_missing_dataset_reject(spark, tmp_path):
    st = _store(spark, tmp_path, dst_type="optimization")
    with pytest.raises(DatasetCopyError, match="does not match"):
        st.copy_from(1, 2, copy_records=True)
    with pytest.raises(DatasetCopyError, match="does not exist"):
        st.copy_from(1, 99, copy_records=True)


def test_clone_copies_metadata_and_rejects_existing_name(spark, tmp_path):
    st = _store(spark, tmp_path)
    new_id = st.clone(1, "fresh")
    assert new_id == 3
    row = (
        st.datasets.read().where("dataset_id = 3").collect()[0].asDict()
    )
    assert row["name"] == "fresh" and row["dataset_type"] == "sp"
    assert row["default_compute_tag"] == "t0"
    assert row["default_compute_priority"] == 1
    assert st.entries.read().where("dataset_id = 3").count() == 3
    assert st.specs.read().where("dataset_id = 3").count() == 2
    assert st.record_items.read().where("dataset_id = 3").count() == 3
    # record ids are SHARED, never duplicated
    src = {r["record_id"] for r in st.record_items.read().where("dataset_id = 1").collect()}
    dst = {r["record_id"] for r in st.record_items.read().where("dataset_id = 3").collect()}
    assert src == dst
    with pytest.raises(DatasetCopyError, match="already exists"):
        st.clone(1, "other")
    with pytest.raises(DatasetCopyError, match="Cannot find dataset"):
        st.clone(77, "nope")
