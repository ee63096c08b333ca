"""sources/layout.py:compact_small_files — lossless rewrite, file-count
reduction, size-targeted output count, idempotence, swap atomicity
leftovers (no scratch residue), and scratch-dir invisibility to hive
partition discovery (ADVICE r9: dot-prefixed siblings)."""

from __future__ import annotations

import glob
import os

from qcfractal_spark.sources.layout import compact_small_files


def _files(path):
    return [
        f for f in glob.glob(os.path.join(path, "*"))
        if os.path.isfile(f) and not os.path.basename(f).startswith((".", "_"))
    ]


def test_compact_reduces_files_losslessly(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 5000).selectExpr("id", "id % 7 AS k", "cast(id as string) AS s")
    df.repartition(32).write.parquet(path)
    before = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert len(_files(path)) == 32
    stats = compact_small_files(spark, path, target_bytes=1 << 30)
    assert stats["files_before"] == 32 and stats["files_after"] == 1
    after = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert after == before
    # no swap residue
    parent = os.path.dirname(path)
    assert not glob.glob(os.path.join(parent, ".compact_*"))


def test_compact_is_idempotent_and_size_targeted(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.range(0, 20000).selectExpr(
        "id", "repeat(cast(id as string), 8) AS pad"
    ).repartition(24).write.parquet(path)
    total = sum(os.path.getsize(f) for f in _files(path))
    target = max(total // 3, 1)
    stats = compact_small_files(spark, path, target_bytes=target)
    # ceil sizing: more than one output, far fewer than 24
    assert 1 < stats["files_after"] <= stats["n_out"] < 24
    # Re-running converges to a fixpoint: the rewrite re-compresses, so
    # total bytes (and thus n_out) can shrink once more — but within a
    # bounded number of passes the op must become a strict no-op that
    # leaves the files untouched.
    for _ in range(3):
        s = compact_small_files(spark, path, target_bytes=target)
        if s["files_before"] == s["files_after"]:
            break
    mtimes = {f: os.path.getmtime(f) for f in _files(path)}
    s_fix = compact_small_files(spark, path, target_bytes=target)
    assert s_fix["files_before"] == s_fix["files_after"]
    assert {f: os.path.getmtime(f) for f in _files(path)} == mtimes


def test_compact_file_uri_scheme(spark, tmp_path):
    """The Hadoop-FS rewrite (VERDICT r8 item 3) must accept a real
    ``file://`` URI — the smallest proof the op no longer shells out to
    glob/os.path and would run against hdfs:// and s3a:// the same way."""
    local = str(tmp_path / "t3")
    spark.range(0, 3000).selectExpr("id", "id % 5 AS k").repartition(
        16
    ).write.parquet(local)
    uri = "file://" + local
    stats = compact_small_files(spark, uri, target_bytes=1 << 30)
    assert stats["files_before"] == 16 and stats["files_after"] == 1
    got = sorted(r["id"] for r in spark.read.parquet(local).collect())
    assert got == list(range(3000))
    assert not glob.glob(os.path.join(os.path.dirname(local), ".compact_*"))


def test_compact_missing_dir_raises(spark, tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError, match="no such directory"):
        compact_small_files(spark, str(tmp_path / "nope"), target_bytes=1)


def test_compact_unreadable_scheme_raises(spark):
    """An unregistered URI scheme must surface as an error, never the
    silent 0-file no-op the glob version produced."""
    import pytest

    with pytest.raises(Exception, match="(?i)no filesystem|unsupported|scheme"):
        compact_small_files(spark, "nosuchfs://bucket/table", target_bytes=1)


def test_compact_partitioned_per_leaf(spark, tmp_path):
    """Per-partition compaction: only fragmented leaves are rewritten,
    values and partition columns survive, and a re-run is a no-op."""
    from qcfractal_spark.sources.layout import compact_partitioned

    root = str(tmp_path / "pt")
    df = spark.range(0, 6000).selectExpr("id", "id % 3 AS k")
    # k=0/1 fragmented (16 files each), k=2 already compact (1 file)
    df.where("k < 2").repartition(16).write.partitionBy("k").parquet(root)
    df.where("k = 2").coalesce(1).write.mode("append").partitionBy("k").parquet(root)
    before = sorted(r["id"] for r in spark.read.parquet(root).collect())

    stats = compact_partitioned(spark, root, target_bytes=1 << 30)
    assert stats["partitions"] == 3
    assert stats["rewritten"] == 2  # k=2 skipped (already 1 file)
    after_df = spark.read.parquet(root)
    assert sorted(r["id"] for r in after_df.collect()) == before
    assert set(r["k"] for r in after_df.select("k").distinct().collect()) == {0, 1, 2}

    again = compact_partitioned(spark, root, target_bytes=1 << 30)
    assert again["rewritten"] == 0
    assert again["files_before"] == again["files_after"]


def test_scratch_dirs_invisible_to_partition_discovery(spark, tmp_path):
    """A full-table reader racing the rewrite window must never see the
    scratch dirs as partitions (ADVICE r9: the old ``k=v.compact_tmp``
    naming was hive-parseable and double-counted the leaf).  Simulate the
    mid-swap state by hand and assert discovery skips it."""
    import shutil

    root = str(tmp_path / "pt")
    df = spark.range(0, 300).selectExpr("id", "id % 2 AS k")
    df.write.partitionBy("k").parquet(root)
    n = spark.read.parquet(root).count()
    # mid-rewrite snapshot: a same-content copy in the dot-prefixed scratch dir
    shutil.copytree(os.path.join(root, "k=1"),
                    os.path.join(root, ".compact_tmp_k=1"))
    shutil.copytree(os.path.join(root, "k=1"),
                    os.path.join(root, ".compact_old_k=1"))
    assert spark.read.parquet(root).count() == n  # no double count
    assert set(
        r["k"] for r in spark.read.parquet(root).select("k").distinct().collect()
    ) == {0, 1}


def test_compact_partitioned_sweeps_crash_leftovers(spark, tmp_path):
    """Crash-recovery sweep: stale ``.compact_tmp_*`` is deleted, and an
    orphaned ``.compact_old_*`` (crash between the two renames, leaf
    missing) is renamed back so no data is lost."""
    import shutil

    from qcfractal_spark.sources.layout import compact_partitioned

    root = str(tmp_path / "pt")
    df = spark.range(0, 400).selectExpr("id", "id % 2 AS k")
    df.write.partitionBy("k").parquet(root)
    before = sorted(r["id"] for r in spark.read.parquet(root).collect())
    # crash state 1: incomplete rewrite left a tmp dir (leaf intact)
    shutil.copytree(os.path.join(root, "k=0"),
                    os.path.join(root, ".compact_tmp_k=0"))
    # crash state 2: swap half-done — leaf k=1 moved to old, never replaced
    shutil.move(os.path.join(root, "k=1"),
                os.path.join(root, ".compact_old_k=1"))

    stats = compact_partitioned(spark, root, target_bytes=1 << 30)
    assert stats["partitions"] == 2  # both leaves seen after recovery
    assert not glob.glob(os.path.join(root, ".compact_*"))
    after = sorted(r["id"] for r in spark.read.parquet(root).collect())
    assert after == before
