"""streaming/ingest.py:stream_shard_append — the streaming ingest arm of
the training-shard export: batch↔stream decoration parity (every field
is a pure function of the id, so arrival batching cannot change it) and
the lazy-order contract (sorting a shard's appended rows by order_key
reproduces the batch arm's dense pos order).  The end-to-end partitioned
writeStream path is gated by the registry query (test_queries_oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qcfractal_spark.sources.export import training_shard_rows
from qcfractal_spark.streaming.ingest import stream_shard_append


def _survivors(spark, n=300):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
        (F.col("id") % 90 + 5).alias("n_tokens"),
        F.lit(0.9).alias("quality"),
    )


def test_stream_decoration_matches_batch_export(spark):
    surv = _survivors(spark)
    batch = {
        r["doc_id"]: (r["shard"], r["split"], r["pos"])
        for r in training_shard_rows(surv, n_shards=8).collect()
    }
    streamed = {
        r["doc_id"]: (r["shard"], r["split"], r["order_key"])
        for r in stream_shard_append(
            surv.select("doc_id", "n_tokens")
        ).collect()
    }
    assert set(batch) == set(streamed)
    for doc_id, (shard, split, _pos) in batch.items():
        s_shard, s_split, _key = streamed[doc_id]
        assert (s_shard, s_split) == (shard, split), doc_id
    # lazy order: per shard, sorting streamed rows by (order_key, doc_id)
    # yields exactly the batch arm's pos order
    by_shard: dict = {}
    for doc_id, (shard, _split, key) in streamed.items():
        by_shard.setdefault(shard, []).append((key, doc_id))
    for shard, rows in by_shard.items():
        lazy_order = [d for _k, d in sorted(rows)]
        batch_order = [
            d for d, (sh, _sp, pos) in sorted(
                batch.items(), key=lambda kv: kv[1][2]
            ) if sh == shard
        ]
        assert lazy_order == batch_order, shard
