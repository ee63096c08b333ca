"""Streaming heartbeat maintenance — the manager-liveness write path:
the stream advances only ACTIVE managers' clocks, never backwards,
replayed epochs are skipped, and the batch reap operator consumes the
refreshed table unchanged (stream maintains the clock, the periodic
job decides)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from qcfractal_spark.operators.diagnostics import reap_dead_managers
from qcfractal_spark.sources.table import MutableTable
from qcfractal_spark.streaming.ingest import (
    maintain_heartbeat_stream,
    merge_heartbeat_batch,
)

SCHEMA_M = "m_name string, m_status string, m_modified_on bigint"
SCHEMA_HB = "m_name string, hb_ts bigint"


def _seed(spark, path):
    t = MutableTable(spark, path)
    t.overwrite(
        spark.createDataFrame(
            [
                ("m1", "active", 100),
                ("m2", "active", 100),
                ("m3", "inactive", 100),
            ],
            SCHEMA_M,
        )
    )
    return t


def test_heartbeat_stream_advances_clocks_and_feeds_reap(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _seed(spark, os.path.join(d, "managers"))
        land = os.path.join(d, "landing")
        spark.createDataFrame(
            [("m1", 500), ("m1", 450), ("m3", 900)], SCHEMA_HB
        ).coalesce(1).write.parquet(land)
        stream = spark.readStream.schema(SCHEMA_HB).parquet(land)
        q = maintain_heartbeat_stream(
            stream, t, os.path.join(d, "ckpt")
        )
        q.awaitTermination(120)
        rows = {r["m_name"]: r for r in t.read().collect()}
        assert rows["m1"]["m_modified_on"] == 500  # max of the batch
        assert rows["m2"]["m_modified_on"] == 100  # no heartbeat
        assert rows["m3"]["m_modified_on"] == 100  # inactive: clock frozen

        # the batch reap consumes the refreshed table unchanged:
        # cutoff 400 -> m2 (active, stale) dies; m1 survives
        rep = {
            r["m_name"]: r for r in reap_dead_managers(t.read(), _empty_records(spark), 400).collect()
        }
        assert rep["m1"]["status_after"] == "active"
        assert rep["m2"]["status_after"] == "inactive"
        assert rep["m2"]["reason"] == "missing heartbeat"


def _empty_records(spark):
    return spark.createDataFrame(
        [], "record_id long, status string, is_service boolean, manager_name string"
    )


def test_heartbeat_merge_is_idempotent_and_monotone(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _seed(spark, os.path.join(d, "managers"))
        batch = spark.createDataFrame([("m1", 300)], SCHEMA_HB)
        assert merge_heartbeat_batch(t, batch, epoch_id=0) is True
        # at-least-once redelivery of the same epoch: skipped
        assert merge_heartbeat_batch(t, batch, epoch_id=0) is False
        assert {r["m_name"]: r["m_modified_on"] for r in t.read().collect()}[
            "m1"
        ] == 300
        # an out-of-order LATER epoch carrying an OLDER timestamp can
        # never move the clock backwards (GREATEST merge)
        stale = spark.createDataFrame([("m1", 200)], SCHEMA_HB)
        assert merge_heartbeat_batch(t, stale, epoch_id=1) is True
        assert {r["m_name"]: r["m_modified_on"] for r in t.read().collect()}[
            "m1"
        ] == 300
        # empty batch: skipped without burning the epoch guard
        empty = spark.createDataFrame([], SCHEMA_HB)
        assert merge_heartbeat_batch(t, empty, epoch_id=2) is False


def test_heartbeat_reapply_after_unrelated_commit_is_harmless(spark):
    """An unrelated table commit (a reap writing statuses) replaces the
    meta dict and drops the hb_epoch guard; a redelivered batch then
    re-applies — and must be a no-op on the clocks (GREATEST merge):
    exactly-once EFFECT survives the lost guard."""
    with tempfile.TemporaryDirectory() as d:
        t = _seed(spark, os.path.join(d, "managers"))
        batch = spark.createDataFrame([("m1", 300)], SCHEMA_HB)
        assert merge_heartbeat_batch(t, batch, epoch_id=0) is True
        # unrelated commit: flip m2's status; meta (and hb_epoch) replaced
        t.overwrite(
            t.read().withColumn(
                "m_status",
                F.when(F.col("m_name") == "m2", "inactive").otherwise(
                    F.col("m_status")
                ),
            ),
            meta={"reason": "reap"},
        )
        assert t.current_meta().get("hb_epoch") is None
        before = {r["m_name"]: r["m_modified_on"] for r in t.read().collect()}
        assert merge_heartbeat_batch(t, batch, epoch_id=0) is True  # re-applied
        after = {r["m_name"]: r["m_modified_on"] for r in t.read().collect()}
        assert after == before  # no clock moved: idempotent effect


def test_heartbeat_merge_never_clobbers_a_concurrent_reap(spark):
    """The clobber race, interleaved deterministically: a reap commits
    m1 active->inactive AFTER the heartbeat merge has read its snapshot
    but BEFORE its publish.  The merge goes through the CAS transform,
    so its first publish conflicts and the retry re-merges against the
    POST-reap snapshot: the reap's status survives, and the dead
    manager's clock does not move (a plain read-then-overwrite would
    resurrect m1 as active with a fresh clock)."""
    with tempfile.TemporaryDirectory() as d:
        t = _seed(spark, os.path.join(d, "managers"))
        reaper = MutableTable(spark, os.path.join(d, "managers"))
        fired = {"done": False}
        orig_publish = t._publish

        def racing_publish(stage, base, meta=None, **kw):
            if not fired["done"]:
                fired["done"] = True
                reaper.transform(
                    lambda cur: cur.withColumn(
                        "m_status",
                        F.when(F.col("m_name") == "m1", "inactive").otherwise(
                            F.col("m_status")
                        ),
                    ),
                    meta={"reason": "reap"},
                )
            return orig_publish(stage, base, meta, **kw)

        t._publish = racing_publish
        batch = spark.createDataFrame([("m1", 500), ("m2", 500)], SCHEMA_HB)
        assert merge_heartbeat_batch(t, batch, epoch_id=0) is True
        t._publish = orig_publish

        rows = {r["m_name"]: r for r in t.read().collect()}
        assert rows["m1"]["m_status"] == "inactive"  # the reap survived
        assert rows["m1"]["m_modified_on"] == 100  # dead clock frozen
        assert rows["m2"]["m_modified_on"] == 500  # live clock advanced


def test_epoch_guard_survives_reap_transform(spark):
    """r12 VERDICT item 5: a reap that commits through transform carries
    the prior commit's meta keys forward, so the heartbeat epoch guard
    SURVIVES the unrelated commit and a redelivered epoch is skipped —
    exactly-once SKIP, not merely exactly-once effect."""
    with tempfile.TemporaryDirectory() as d:
        t = _seed(spark, os.path.join(d, "managers"))
        batch = spark.createDataFrame([("m1", 300)], SCHEMA_HB)
        assert merge_heartbeat_batch(t, batch, epoch_id=0) is True
        # unrelated transform commit: the reap flips m2's status
        t.transform(
            lambda cur: cur.withColumn(
                "m_status",
                F.when(F.col("m_name") == "m2", "inactive").otherwise(
                    F.col("m_status")
                ),
            ),
            meta={"reason": "reap"},
        )
        meta = t.current_meta()
        assert meta.get("reason") == "reap"
        assert meta.get("hb_epoch") == 0  # guard carried forward
        # the redelivered epoch is SKIPPED, and no clock moves
        before = {r["m_name"]: r["m_modified_on"] for r in t.read().collect()}
        assert merge_heartbeat_batch(t, batch, epoch_id=0) is False
        after = {r["m_name"]: r["m_modified_on"] for r in t.read().collect()}
        assert after == before
        # a genuinely NEW epoch still applies on top of the merged meta
        assert merge_heartbeat_batch(
            t, spark.createDataFrame([("m1", 700)], SCHEMA_HB), epoch_id=1
        ) is True
        assert t.current_meta().get("hb_epoch") == 1
        assert t.current_meta().get("reason") == "reap"  # still carried


def test_heartbeat_merge_preserves_extra_manager_columns(spark):
    """r12 ADVICE: the merge touches only m_modified_on — additional
    manager-dimension columns (resource stats, versions) must ride
    through the heartbeat commit untouched, and column order must be
    stable."""
    with tempfile.TemporaryDirectory() as d:
        t = MutableTable(spark, os.path.join(d, "managers"))
        t.overwrite(
            spark.createDataFrame(
                [
                    ("m1", "active", 100, 4, "0.5.0"),
                    ("m2", "inactive", 100, 8, "0.4.9"),
                ],
                "m_name string, m_status string, m_modified_on bigint, "
                "n_workers int, client_version string",
            )
        )
        batch = spark.createDataFrame([("m1", 500), ("m2", 500)], SCHEMA_HB)
        assert merge_heartbeat_batch(t, batch, epoch_id=0) is True
        got = t.read()
        assert got.columns == [
            "m_name", "m_status", "m_modified_on", "n_workers", "client_version"
        ]
        rows = {r["m_name"]: r for r in got.collect()}
        assert rows["m1"]["m_modified_on"] == 500  # active clock advanced
        assert rows["m2"]["m_modified_on"] == 100  # inactive frozen
        assert rows["m1"]["n_workers"] == 4 and rows["m1"]["client_version"] == "0.5.0"
        assert rows["m2"]["n_workers"] == 8 and rows["m2"]["client_version"] == "0.4.9"
