"""Stateful streaming: built-in session windows (batch parity + streaming)
and the applyInPandasWithState session state machine (emit on event-time
timeout)."""

from __future__ import annotations

import os
import tempfile
from datetime import datetime

from pyspark.sql import functions as F

from qcfractal_spark.streaming.state import sessionize, stateful_session_stats

SCHEMA = "ts timestamp, user_id long, value double"


def _rows_batch1():
    # user 1: two sessions (gap > 30 min splits); user 2: one session
    return [
        (datetime(2024, 1, 1, 1, 0), 1, 1.0),
        (datetime(2024, 1, 1, 1, 10), 1, 2.0),
        (datetime(2024, 1, 1, 3, 0), 1, 4.0),
        (datetime(2024, 1, 1, 1, 5), 2, 8.0),
    ]


def test_sessionize_batch(spark):
    df = spark.createDataFrame(_rows_batch1(), SCHEMA)
    out = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
        for r in sessionize(df, gap="30 minutes").collect()
    }
    # user 1 splits into [01:00,01:10] and [03:00]; user 2 has one session
    assert out[(1, datetime(2024, 1, 1, 1, 0))] == (2, 3.0)
    assert out[(1, datetime(2024, 1, 1, 3, 0))] == (1, 4.0)
    assert out[(2, datetime(2024, 1, 1, 1, 5))] == (1, 8.0)


def _run_stream(spark, land, sink, ckpt, build):
    stream = spark.readStream.schema(SCHEMA).parquet(land)
    q = (
        build(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_session_stats_emits_on_timeout(spark):
    with tempfile.TemporaryDirectory() as d:
        land, sink, ckpt = (os.path.join(d, p) for p in ("land", "sink", "ckpt"))
        os.makedirs(land)

        spark.createDataFrame(_rows_batch1(), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(land)
        _run_stream(
            spark, land, sink, ckpt, lambda s: stateful_session_stats(s, gap_seconds=1800)
        )

        # batch 2: an event far in the future pushes the watermark past every
        # open session's timeout → all three sessions emit
        spark.createDataFrame(
            [(datetime(2024, 1, 2, 12, 0), 9, 0.0)], SCHEMA
        ).coalesce(1).write.mode("append").parquet(land)
        _run_stream(
            spark, land, sink, ckpt, lambda s: stateful_session_stats(s, gap_seconds=1800)
        )

        rows = {
            (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
            for r in spark.read.parquet(sink).collect()
        }
        assert rows[(1, datetime(2024, 1, 1, 1, 0))] == (2, 3.0)
        assert rows[(1, datetime(2024, 1, 1, 3, 0))] == (1, 4.0)
        assert rows[(2, datetime(2024, 1, 1, 1, 5))] == (1, 8.0)


def test_sessionize_streaming_matches_batch(spark):
    with tempfile.TemporaryDirectory() as d:
        land, sink, ckpt = (os.path.join(d, p) for p in ("land", "sink", "ckpt"))
        os.makedirs(land)
        spark.createDataFrame(_rows_batch1(), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(land)
        # a late-batch future event closes all session windows
        spark.createDataFrame(
            [(datetime(2024, 1, 2, 12, 0), 9, 0.0)], SCHEMA
        ).coalesce(1).write.mode("append").parquet(land)
        _run_stream(spark, land, sink, ckpt, lambda s: sessionize(s, gap="30 minutes"))
        got = spark.read.parquet(sink).where(F.col("user_id") != 9)
        batch = sessionize(spark.createDataFrame(_rows_batch1(), SCHEMA), gap="30 minutes")
        assert got.exceptAll(batch).count() == 0
        assert batch.exceptAll(got).count() == 0
