"""SPARK_GRAFT_FAST_HASH=1 contract: xxhash64-backed portable_hash64 keeps
every consumer invariant of the md5-derived default — non-negative 32-bit
range (so MinHash permutations ``(a*h + b) % p`` never overflow 64-bit ANSI
arithmetic and ``% n`` bucketing stays non-negative) and per-mode
determinism.  Oracle runs keep the default; this is the production mode
(SCALE.md §4 records the measured win)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qcfractal_spark.functions import dedup as dd
from qcfractal_spark.functions.text import portable_hash64


def _hashes(spark, monkeypatch, fast: bool):
    if fast:
        monkeypatch.setenv("SPARK_GRAFT_FAST_HASH", "1")
    else:
        monkeypatch.delenv("SPARK_GRAFT_FAST_HASH", raising=False)
    df = spark.createDataFrame([(f"doc-{i}",) for i in range(200)], "s string")
    return [r["h"] for r in df.select(portable_hash64(F.col("s")).alias("h")).collect()]


def test_fast_hash_range_and_determinism(spark, monkeypatch):
    fast1 = _hashes(spark, monkeypatch, fast=True)
    fast2 = _hashes(spark, monkeypatch, fast=True)
    slow = _hashes(spark, monkeypatch, fast=False)
    assert fast1 == fast2  # deterministic
    assert all(0 <= h <= 0xFFFFFFFF for h in fast1)  # masked 32-bit range
    assert all(0 <= h <= 0xFFFFFFFF for h in slow)
    assert fast1 != slow  # genuinely different hash family


def test_minhash_pipeline_runs_in_fast_mode(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_FAST_HASH", "1")
    docs = spark.createDataFrame(
        [(i, ("the quick brown fox %d " % (i % 5)) * 20) for i in range(40)],
        "doc_id long, text string",
    )
    sigs = dd.minhash_signatures(docs)
    # permutation arithmetic must not overflow under ANSI mode
    n = dd.minhash_lsh_candidates(sigs).count()
    assert n >= 0
    dups = sigs.groupBy().count().first()[0]
    assert dups == 40


def test_samplers_and_split_run_in_fast_mode(spark, monkeypatch):
    """The round-7 hash consumers keep their contracts under the xxhash64
    fast path: split co-assignment, exact-k, determinism."""
    monkeypatch.setenv("SPARK_GRAFT_FAST_HASH", "1")
    from qcfractal_spark.functions.dedup import leakproof_split
    from qcfractal_spark.functions.packing import weighted_sample_topk

    labeled = spark.createDataFrame(
        [(i, i // 2) for i in range(100)], "id long, cluster_id long"
    )
    out = leakproof_split(labeled).toPandas()
    assert set(out["split"]) <= {"train", "valid", "test"}
    assert (out.groupby("cluster_id")["split"].nunique() == 1).all()

    w = spark.createDataFrame([(i, 1.0 + i % 3) for i in range(60)],
                              "id long, w double")
    s1 = [r["id"] for r in weighted_sample_topk(w, "w", "id", k=10).collect()]
    s2 = [r["id"] for r in weighted_sample_topk(w, "w", "id", k=10).collect()]
    assert s1 == s2 and len(set(s1)) == 10
