"""sources/export.py — the materialized training-shard flagship
(VERDICT r9 item 5): the written artifact must round-trip losslessly,
carry a dense per-shard epoch order, keep the leak-safe split, and the
re-read verification must actually DETECT tampering (a verification that
can't fail verifies nothing).  Registry parity vs the source-table
oracle is covered by test_queries_oracle."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from qcfractal_spark.sources.export import (
    export_training_shards,
    shard_verification,
    training_shard_rows,
)


def _survivors(spark, n=400):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 5).cast("string")).alias("source"),
        (F.col("id") % 700 + 10).alias("n_tokens"),
        F.round(F.lit(0.5) + (F.col("id") % 50) / 100.0, 6).alias("quality"),
    )


def test_roundtrip_is_lossless_and_shard_partitioned(spark, tmp_path):
    surv = _survivors(spark)
    path = str(tmp_path / "shards")
    export_training_shards(surv, path, n_shards=8)
    # physical layout: one hive dir per shard
    assert len(glob.glob(os.path.join(path, "shard=*"))) == 8
    reread = spark.read.parquet(path)
    assert reread.count() == 400
    assert set(r["doc_id"] for r in reread.select("doc_id").collect()) == set(
        range(400)
    )


def test_pos_is_dense_per_shard_and_order_deterministic(spark, tmp_path):
    surv = _survivors(spark)
    path = str(tmp_path / "shards2")
    export_training_shards(surv, path, n_shards=4)
    reread = spark.read.parquet(path)
    for shard, rows in (
        (s, sorted(r["pos"] for r in g))
        for s, g in __import__("itertools").groupby(
            sorted(reread.select("shard", "pos").collect(), key=lambda r: r["shard"]),
            key=lambda r: r["shard"],
        )
    ):
        assert rows == list(range(1, len(rows) + 1)), shard
    # a re-export reproduces the identical order (seeded, no RNG state)
    export_training_shards(surv, str(tmp_path / "shards2b"), n_shards=4)
    a = sorted(
        (r["doc_id"], r["shard"], r["pos"]) for r in reread.collect()
    )
    b = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in spark.read.parquet(str(tmp_path / "shards2b")).collect()
    )
    assert a == b


def test_split_counts_and_no_epoch_rank_clumping(spark, tmp_path):
    rows = training_shard_rows(_survivors(spark), n_shards=4)
    got = rows.groupBy("split").count().collect()
    by_split = {r["split"]: r["count"] for r in got}
    assert set(by_split) == {"train", "valid", "test"}
    assert by_split["train"] > by_split["valid"]
    assert by_split["train"] > by_split["test"]
    # interleave key: within any source, ranks are dense, so sorting by
    # interleave_key round-robins the 5 sources
    first10 = [
        r["source"]
        for r in rows.orderBy("interleave_key").limit(10).collect()
    ]
    assert len(set(first10[:5])) == 5  # one of each source first


def test_verification_detects_tampering(spark, tmp_path):
    """Delete one shard's data file, then duplicate another's: both
    corruptions must move the verification aggregate."""
    import shutil

    surv = _survivors(spark)
    path = str(tmp_path / "shards3")
    export_training_shards(surv, path, n_shards=4)
    baseline = {
        r["shard"]: (r["n_docs"], r["order_check"])
        for r in shard_verification(spark.read.parquet(path)).collect()
    }
    files = sorted(glob.glob(os.path.join(path, "shard=0", "part-*.parquet")))
    assert files
    os.remove(files[0])  # drop rows
    dup_src = sorted(glob.glob(os.path.join(path, "shard=1", "part-*.parquet")))[0]
    shutil.copy(dup_src, dup_src.replace("part-", "part-dup-"))  # duplicate rows
    tampered = {
        r["shard"]: (r["n_docs"], r["order_check"])
        for r in shard_verification(spark.read.parquet(path)).collect()
    }
    assert tampered.get(0) != baseline[0]
    assert tampered.get(1) != baseline[1]
    assert tampered.get(2) == baseline[2]  # untouched shards still agree


def test_reexport_swaps_atomically(spark, tmp_path):
    """Re-export commits via tmp-then-rename (r10 ADVICE): the dataset
    root is never deleted-then-rebuilt in place.  After a re-export with
    different content the artifact is fully replaced, no dot-prefixed
    scratch dirs are left behind, and a file handle listed BEFORE the
    swap still reads its old bytes (POSIX rename keeps the inode alive —
    the local stand-in for a reader holding the old snapshot)."""
    surv = _survivors(spark)
    path = str(tmp_path / "shards4")
    export_training_shards(surv, path, n_shards=4)
    old_files = sorted(glob.glob(os.path.join(path, "shard=0", "part-*.parquet")))
    fh = open(old_files[0], "rb")  # simulate an in-flight reader
    export_training_shards(_survivors(spark, n=200), path, n_shards=4)
    assert spark.read.parquet(path).count() == 200
    leftovers = [
        p
        for p in os.listdir(os.path.dirname(path))
        if p.startswith((".export_tmp_", ".export_old_"))
    ]
    assert leftovers == []
    assert len(fh.read()) > 0  # old snapshot bytes still readable
    fh.close()


def test_crash_window_recovery_restores_old_export(spark, tmp_path):
    """r11 ADVICE: a crash between the swap's two renames leaves both
    siblings dot-prefixed — no visible dataset.  recover_export restores
    the old artifact, and the next export self-heals the same state."""
    from qcfractal_spark.sources.export import recover_export

    surv = _survivors(spark)
    path = str(tmp_path / "shards5")
    export_training_shards(surv, path, n_shards=4)
    n0 = spark.read.parquet(path).count()

    # simulate the crash: path was renamed to .export_old_<leaf>, the
    # tmp->path rename never ran
    old = os.path.join(os.path.dirname(path), ".export_old_" + os.path.basename(path))
    os.rename(path, old)
    assert not os.path.exists(path)

    assert recover_export(spark, path) is True
    assert spark.read.parquet(path).count() == n0
    assert recover_export(spark, path) is False  # idempotent no-op now

    # the export itself also self-heals before swapping
    os.rename(path, old)
    export_training_shards(_survivors(spark, n=120), path, n_shards=4)
    assert spark.read.parquet(path).count() == 120
    leftovers = [
        p
        for p in os.listdir(os.path.dirname(path))
        if p.startswith((".export_tmp_", ".export_old_"))
    ]
    assert leftovers == []
