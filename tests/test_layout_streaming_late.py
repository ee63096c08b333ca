"""Partition-pruning assertions and streaming late-data (watermark) drop."""

from __future__ import annotations

import os
import tempfile
from datetime import datetime

from pyspark.sql import functions as F

from qcfractal_spark.catalog import load_table
from qcfractal_spark.sources.layout import pruned_files, read_partitioned, write_partitioned


def test_date_partition_pruning(spark):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "events_by_day")
        write_partitioned(events, path, [], derive_date_from="ts")
        tbl = read_partitioned(spark, path)
        total = pruned_files(tbl)
        one_day = tbl.where(F.col("p_date") == "2024-01-02")
        pruned = pruned_files(one_day)
        assert 0 < pruned < total, (pruned, total)
        # the filter also prunes through the derived ts predicate pushdown
        assert one_day.count() == events.where(F.to_date("ts") == "2024-01-02").count()
        # retention = partition drop: filtering out old partitions reads none of them
        recent = tbl.where(F.col("p_date") >= "2024-01-10")
        assert pruned_files(recent) < total


def test_streaming_watermark_drops_late_rows(spark):
    """Append-mode tumbling window with a 0-tolerance watermark: a row
    arriving after its window's watermark has passed is dropped (T3's
    late-data contract, generalized)."""
    with tempfile.TemporaryDirectory() as d:
        land = os.path.join(d, "landing")
        sink = os.path.join(d, "sink")
        ckpt = os.path.join(d, "ckpt")
        os.makedirs(land)
        schema = "ts timestamp, v int"

        def run_batch():
            stream = (
                spark.readStream.schema(schema).parquet(land)
                .withWatermark("ts", "0 seconds")
                .groupBy(F.window("ts", "1 hour").alias("w"))
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.col("w.start").alias("ws"), "n")
            )
            q = (
                stream.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        # batch 1: two rows in the 01:00 window, one at 03:00 → watermark 03:00
        spark.createDataFrame(
            [(datetime(2024, 1, 1, 1, 5), 1), (datetime(2024, 1, 1, 1, 40), 1),
             (datetime(2024, 1, 1, 3, 0), 1)],
            schema,
        ).coalesce(1).write.mode("append").parquet(land)
        run_batch()

        # batch 2: a LATE row for the already-closed 01:00 window + a fresh
        # 05:00 row that closes the 03:00 window
        spark.createDataFrame(
            [(datetime(2024, 1, 1, 1, 50), 1), (datetime(2024, 1, 1, 5, 0), 1)],
            schema,
        ).coalesce(1).write.mode("append").parquet(land)
        run_batch()

        out = {
            r["ws"]: r["n"] for r in spark.read.parquet(sink).collect()
        }
        # 01:00 window finalized with 2 rows — the late third row was dropped
        assert out.get(datetime(2024, 1, 1, 1, 0)) == 2
        # 03:00 window closed by the 05:00 event
        assert out.get(datetime(2024, 1, 1, 3, 0)) == 1
