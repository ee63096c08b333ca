"""Scan fan-out (r15 optimization): the scale-adaptive small-scan
repartition in catalog.load_table must be a no-op at scale, value-neutral
where it fires, and disabled by the env kill-switch."""

from __future__ import annotations

import os

import pytest

from qcfractal_spark import catalog


SF = "/root/testdata/sf0.1"
DOCS = os.path.join(SF, "documents.parquet")


def test_estimator_no_op_at_scale(spark, monkeypatch):
    """A table whose estimated split count already meets the session's
    parallelism must NOT be fanned — the production-scale branch."""
    monkeypatch.delenv("SPARK_GRAFT_SCAN_FANOUT", raising=False)
    # Pretend the table is huge: bytes >> maxPartitionBytes * parallelism.
    par = spark.sparkContext.defaultParallelism
    catalog._fanout_bytes_cache["/fake/huge"] = 128 * 1024 * 1024 * (par + 1)
    assert catalog._scan_fanout_partitions(spark, "/fake/huge") == 0


def test_estimator_skips_tiny_tables(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCAN_FANOUT", raising=False)
    catalog._fanout_bytes_cache["/fake/tiny"] = 10 * 1024
    assert catalog._scan_fanout_partitions(spark, "/fake/tiny") == 0


def test_estimator_fans_small_scan(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCAN_FANOUT", raising=False)
    monkeypatch.setattr(catalog, "_table_bytes", lambda p: 1024 * 1024)
    assert (
        catalog._scan_fanout_partitions(spark, "/fake/small")
        == spark.sparkContext.defaultParallelism
    )


def test_env_kill_switch(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCAN_FANOUT", "0")
    monkeypatch.setattr(catalog, "_table_bytes", lambda p: 1024 * 1024)
    assert catalog._scan_fanout_partitions(spark, "/fake/small2") == 0


def test_parse_bytes_flavors():
    assert catalog._parse_bytes("134217728") == 128 * 1024 * 1024
    assert catalog._parse_bytes("128m") == 128 * 1024 * 1024
    assert catalog._parse_bytes("128MB") == 128 * 1024 * 1024
    assert catalog._parse_bytes("1g") == 1024**3


@pytest.mark.skipif(not os.path.exists(DOCS), reason="sf0.1 testdata absent")
def test_fanned_read_is_value_identical(spark, monkeypatch):
    """fanout=True must change partitioning only: same rows, same schema,
    >1 partitions where the plain read has 1."""
    monkeypatch.delenv("SPARK_GRAFT_SCAN_FANOUT", raising=False)
    plain = catalog.load_table(spark, SF, "documents")
    fanned = catalog.load_table(spark, SF, "documents", fanout=True)
    assert plain.rdd.getNumPartitions() == 1
    assert fanned.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert fanned.schema == plain.schema
    # Order-insensitive equality via a commutative checksum of doc_ids and
    # text lengths (cheap; full-row hashes are the oracle gate's job).
    from pyspark.sql import functions as F

    agg = [
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("sid"),
        F.sum(F.length("text")).alias("slen"),
    ]
    assert plain.agg(*agg).collect() == fanned.agg(*agg).collect()


@pytest.mark.skipif(not os.path.exists(DOCS), reason="sf0.1 testdata absent")
def test_broadcast_dims_never_fan(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCAN_FANOUT", raising=False)
    cust = catalog.load_table(spark, SF, "customer", fanout=True)
    assert cust.rdd.getNumPartitions() == 1


def test_table_bytes_cache_invalidates_on_mtime(tmp_path):
    """r15 ADVICE: a regenerated/grown parquet must refresh the cached
    byte count the fan-out decision reads."""
    from qcfractal_spark.catalog import _table_bytes

    p = tmp_path / "t.parquet"
    p.write_bytes(b"x" * 10)
    assert _table_bytes(str(p)) == 10
    import os as _os
    import time as _time

    p.write_bytes(b"x" * 1000)
    _os.utime(p, (_time.time() + 2, _time.time() + 2))
    assert _table_bytes(str(p)) == 1000
