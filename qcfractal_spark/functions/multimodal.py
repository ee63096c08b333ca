"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct — the same
pattern as the reference's compressed blob side-tables
(qcfractal/qcfractal/components/record_db_models.py:87-146, zstd LargeBinary
with EXTERNAL storage): keep bulk bytes out of the hot row, carry typed
metadata inline so filters/joins never touch the payload.

Decode/feature-extraction run as Arrow-batched ``mapInPandas`` UDFs.  The
actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the decode
kernel is stubbed behind ``DecoderUnavailable`` with a deterministic fake
used by tests — the Spark-side plumbing (schema, batch shape, partitioning)
is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_s", DoubleType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(DoubleType()), True),
        StructField("decode_ok", StringType(), True),
    ]
)


class DecoderUnavailable(NotImplementedError):
    """Raised when a real media codec would be required (not installed)."""


def _decode_real(content: bytes, kind: str) -> list[float]:  # pragma: no cover
    raise DecoderUnavailable(
        "media codecs (PIL/librosa/ffmpeg) are not available in this "
        "environment; use fake=True for the deterministic test kernel"
    )


def _decode_fake(content: bytes, kind: str, n: int = 8) -> list[float]:
    """Deterministic fake 'feature vector': byte-histogram moments.  Stands
    in for decode→resize→embed so the distributed plumbing is testable."""
    if content is None or len(content) == 0:
        return [0.0] * n
    total = float(len(content))
    return [sum(1 for b in content if b % n == i) / total for i in range(n)]


def extract_features(media: DataFrame, fake: bool = True, batch_hint: int | None = None) -> DataFrame:
    """Decode + featurize media rows via Arrow-batched mapInPandas.

    Partition-size note: repartition upstream by media_id so one executor
    never holds more than ~a few hundred MB of payload per batch; Arrow
    batch size is governed by spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    kernel = _decode_fake if fake else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for content, kind in zip(pdf["content"], pdf["kind"]):
                try:
                    feats.append(kernel(content, kind))
                    oks.append("ok")
                except DecoderUnavailable:
                    feats.append(None)
                    oks.append("decoder_unavailable")
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "decode_ok": oks}
            )

    return media.select("media_id", "kind", "content").mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, kind string, content binary, width int, height int, "
    "resize_ok string"
)


def _resize_fake(content: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: re-tile the payload bytes to width×height
    by index striding — stands in for a PIL/ffmpeg resample so the schema,
    batch shape and binary round-trip are real and testable."""
    if content is None or len(content) == 0:
        return bytes(width * height)
    n = width * height
    src = len(content)
    return bytes(content[(i * src) // n] for i in range(n))


def resize_media(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize kernel over Arrow-batched mapInPandas: binary in → binary out
    with typed size metadata.  Same partitioning contract as
    :func:`extract_features`; the real decoder slot raises
    :class:`DecoderUnavailable` (codecs not installed here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, oks = [], []
            for content in pdf["content"]:
                try:
                    if not fake:
                        _decode_real(content, "image")
                    outs.append(_resize_fake(content, width, height))
                    oks.append("ok")
                except DecoderUnavailable:
                    outs.append(None)
                    oks.append("decoder_unavailable")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": outs,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "resize_ok": oks,
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(run, RESIZE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into per-frame
    stub rows (timestamps) without decoding — the real frame extraction
    would run in the same mapInPandas kernel as extract_features."""
    # frames at ts = 0, every_s, ... strictly BEFORE the duration: a seek
    # to ts == duration lands past the last frame, and a NULL/0-duration
    # video has no frames at all (sequence(0, n) was end-inclusive, so
    # exact multiples emitted one frame too many and empty videos one).
    n_frames = F.ceil(
        F.coalesce(F.col("duration_s"), F.lit(0.0)) / F.lit(every_s)
    ).cast("long")
    return (
        media.where((F.col("kind") == "video") & (F.coalesce("duration_s", F.lit(0.0)) > 0))
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_ts", F.col("frame_idx") * F.lit(every_s))
        .select("media_id", "frame_idx", "frame_ts")
    )


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("phash", LongType(), True),
    ]
)


def _phash_fake(content: bytes, n_blocks: int = 9) -> int | None:
    """dHash-style perceptual hash over the payload: ``n_blocks`` block
    means → ``n_blocks - 1`` gradient bits (bit k = mean[k] > mean[k+1]).
    A real deployment decodes + grayscale-resizes to 9×8 and compares
    adjacent pixels (classic dHash); the fake kernel applies the identical
    gradient rule to raw payload byte blocks, so the Spark-side plumbing
    and the dedup semantics are exercised end-to-end without codecs.
    Block membership is ``(j * n_blocks) // len`` — chosen because the
    oracle re-derives it with the same integer floor division in SQL.
    Payloads shorter than ``n_blocks`` bytes cannot fill every block (an
    empty block has no mean) and hash to NULL, same as empty payloads."""
    if content is None or len(content) < n_blocks:
        return None
    n = len(content)
    sums = [0] * n_blocks
    cnts = [0] * n_blocks
    for j, byte in enumerate(content):
        k = (j * n_blocks) // n
        sums[k] += byte
        cnts[k] += 1
    means = [s / c for s, c in zip(sums, cnts)]
    bits = 0
    for k in range(n_blocks - 1):
        bits = (bits << 1) | (1 if means[k] > means[k + 1] else 0)
    return bits


def perceptual_hash(media: DataFrame, fake: bool = True, n_blocks: int = 9) -> DataFrame:
    """Per-media perceptual hash via Arrow-batched mapInPandas (binary in,
    one long out — the image analog of text fingerprinting)."""
    if not fake:  # pragma: no cover
        raise DecoderUnavailable(
            "real perceptual hashing needs image codecs; use fake=True"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [
                        _phash_fake(c, n_blocks) for c in pdf["content"]
                    ],
                }
            )

    return media.select("media_id", "content").mapInPandas(run, PHASH_SCHEMA)


def phash_dedup(media: DataFrame, fake: bool = True, n_blocks: int = 9) -> DataFrame:
    """Exact dedup on the perceptual key: media sharing a hash form one
    duplicate group; the lowest media_id survives (same keeper rule as
    ``dedup.exact_dedup``).  One kernel scan + one map-combinable groupBy —
    the image-dedup pipeline shape: at scale the hash is written at ingest
    and this reduces to the group-by."""
    hashes = perceptual_hash(media, fake=fake, n_blocks=n_blocks)
    # NULL hashes (empty / too-short payloads) are unhashable, not
    # duplicates of each other — grouping them would report distinct
    # content as droppable copies.  They are excluded from the report.
    return (
        hashes.where(F.col("phash").isNotNull())
        .groupBy("phash")
        .agg(
            F.min("media_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (no codecs needed)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes((i * 31 + j * 7) % 256 for j in range(128 + (i % 5) * 64))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                float(i % 7) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
