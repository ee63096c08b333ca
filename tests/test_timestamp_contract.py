"""Timestamp-contract tests (VERDICT r3 items 5-6).

The testdata parquet stores tz-less ``timestamp[us]``; depending on the
Spark version/conf that surfaces as TIMESTAMP_NTZ, which cannot cast to
DOUBLE and is rejected by ``withWatermark`` — the root cause of the round
2/3 j14/streaming/bench breakage.  These tests pin the engine's contract:
after ``load_table`` every timestamp column is TimestampType (LTZ, UTC
session tz), and every epoch/watermark path works against BOTH parquet
timestamp flavors.
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

from qcfractal_spark.catalog import TABLES, load_table, normalize_ntz

SF_DIR = "/root/testdata/sf0.001"


def test_loaded_tables_have_no_ntz_timestamps(spark):
    for name in TABLES:
        df = load_table(spark, SF_DIR, name)
        ntz = [c for c, t in df.dtypes if "timestamp_ntz" in t]
        assert not ntz, f"{name}: NTZ columns survived load_table: {ntz}"


def _write_ntz_parquet(path: str) -> None:
    """A parquet file whose ts column is tz-less timestamp[us] — the flavor
    that reads as TIMESTAMP_NTZ when inferTimestampNTZ is on."""
    ts = [datetime(2024, 1, 1, h) for h in range(10)]
    table = pa.table(
        {
            "event_id": pa.array(range(10), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    pq.write_table(table, path)


def test_normalize_ntz_casts_only_ntz_columns(spark):
    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1))], "id long, ts timestamp"
    ).withColumn("ts_ntz", F.col("ts").cast("timestamp_ntz"))
    out = normalize_ntz(df)
    types = dict(out.dtypes)
    assert types == {"id": "bigint", "ts": "timestamp", "ts_ntz": "timestamp"}


def test_epoch_seconds_works_on_both_flavors(spark):
    from qcfractal_spark.operators.joins import epoch_seconds

    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 0, 0),)], "ts timestamp"
    ).withColumn("ts_ntz", F.col("ts").cast("timestamp_ntz"))
    row = df.select(
        epoch_seconds("ts").alias("a"), epoch_seconds("ts_ntz").alias("b")
    ).first()
    assert row["a"] == row["b"] == 1704067200.0


def test_streaming_watermark_on_ntz_source(spark):
    """An NTZ-schema file stream must still watermark + window (T1 against
    the tz-less parquet flavor)."""
    from qcfractal_spark.streaming.ingest import (
        stream_events_from_directory,
        windowed_event_counts,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampNTZType()),
        ]
    )
    with tempfile.TemporaryDirectory() as d:
        land = os.path.join(d, "landing")
        os.makedirs(land)
        _write_ntz_parquet(os.path.join(land, "part-0.parquet"))
        stream = stream_events_from_directory(spark, land, schema)
        agg = windowed_event_counts(stream, window="1 hour", dims=())
        qh = (
            agg.writeStream.format("memory")
            .queryName("ntz_counts")
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        qh.awaitTermination(120)
        total = spark.sql("SELECT sum(count) FROM ntz_counts").first()[0]
        assert total == 10


def test_sessionize_watermark_on_ntz_source(spark):
    """sessionize must normalize TIMESTAMP_NTZ before watermarking (same
    contract as windowed_event_counts; the session-window path is a
    separate withWatermark call site)."""
    from qcfractal_spark.streaming.state import sessionize

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampNTZType()),
        ]
    )
    with tempfile.TemporaryDirectory() as d:
        land = os.path.join(d, "landing")
        os.makedirs(land)
        _write_ntz_parquet(os.path.join(land, "part-0.parquet"))
        stream = (
            spark.readStream.schema(schema)
            .parquet(land)
            .withColumnRenamed("event_id", "user_id")
            .withColumn("value", F.lit(1.0))
        )
        out = sessionize(stream, gap="30 minutes")
        qh = (
            out.writeStream.format("memory")
            .queryName("ntz_sessions")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        qh.awaitTermination(120)
        n = spark.sql("SELECT count(*) FROM ntz_sessions").first()[0]
        assert n >= 0  # the query RAN — the NTZ watermark no longer throws
