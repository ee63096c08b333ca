"""External files / dataset attachments (sources/external_files.py;
reference external_files/socket.py:31-372, dataset_socket.py:374-462).
Registry parity: s15_attachments; these tests pin the single-file
two-phase arm, the blob roundtrip, and the scoped/missing-id errors."""

from __future__ import annotations

import hashlib

import pytest

from qcfractal_spark.sources.external_files import (
    ExternalFileStore,
    MissingFileError,
)


def _store(spark, tmp_path):
    st = ExternalFileStore(spark, str(tmp_path / "xf"))
    st.init()
    return st


def test_add_data_roundtrip_and_metadata_excludes(spark, tmp_path):
    st = _store(spark, tmp_path)
    payload = b"hello attachment bytes"
    fid = st.add_data(payload, "a.bin", now=111, description="d",
                      dataset_id=7, attachment_type="view")
    assert fid == 1
    meta = st.get_metadata(fid)
    assert meta["status"] == "available"
    assert meta["sha256sum"] == hashlib.sha256(payload).hexdigest()
    assert meta["file_size"] == len(payload)
    assert meta["created_on"] == 111
    # bucket/object_key are client-excluded (ExternalFileORM excludes)
    assert "bucket" not in meta and "object_key" not in meta
    assert st.read_file(fid) == payload
    name, url = st.get_url(fid)
    assert name == "a.bin" and url.endswith(f"obj-{fid}")


def test_attach_many_bulk_digests_match_python(spark, tmp_path):
    st = _store(spark, tmp_path)
    rows = [(i, f"f{i}", "d", "{}", bytearray(f"content-{i}".encode()), i % 2, "view")
            for i in range(1, 6)]
    files = spark.createDataFrame(
        rows,
        "file_id long, file_name string, description string, provenance string, "
        "content binary, dataset_id long, attachment_type string",
    )
    assert st.attach_many(files, now=5) == 5
    for i in range(1, 6):
        meta = st.get_metadata(i)
        assert meta["sha256sum"] == hashlib.sha256(f"content-{i}".encode()).hexdigest()
        assert st.read_file(i) == f"content-{i}".encode()
    # dataset-scoped listing
    assert st.get_attachments(0).count() == 2
    assert st.get_attachments(1).count() == 3


def test_delete_removes_blob_and_missing_id_raises(spark, tmp_path):
    st = _store(spark, tmp_path)
    f1 = st.add_data(b"one", "1.bin", now=1)
    f2 = st.add_data(b"two", "2.bin", now=2)
    st.delete([f1])
    assert st.blobs.read().count() == 1  # f1's blob gone with its row
    with pytest.raises(MissingFileError):
        st.get_metadata(f1)
    with pytest.raises(MissingFileError):
        st.delete([f1])
    assert st.read_file(f2) == b"two"


def test_delete_attachment_is_dataset_scoped(spark, tmp_path):
    st = _store(spark, tmp_path)
    fid = st.add_data(b"x", "x.bin", now=1, dataset_id=3, attachment_type="view")
    with pytest.raises(MissingFileError, match="not found in dataset 4"):
        st.delete_attachment(4, fid)  # wrong dataset: refused
    st.delete_attachment(3, fid)
    assert st.get_attachments(3).count() == 0
    assert st.blobs.read().count() == 0
