"""Multimodal plumbing tests — the decode kernel is a deterministic fake
(codecs not installed); the Spark-side schema/batch plumbing is real."""

from __future__ import annotations

import pytest

from qcfractal_spark.functions import multimodal as mm


def test_extract_features_fake_kernel(spark):
    media = mm.make_fake_media(spark, n=30)
    feats = mm.extract_features(media, fake=True).collect()
    assert len(feats) == 30
    for r in feats:
        assert r["decode_ok"] == "ok"
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-9  # histogram sums to 1
    # determinism
    again = mm.extract_features(mm.make_fake_media(spark, n=30), fake=True).collect()
    assert [r["feature"] for r in again] == [r["feature"] for r in feats]


def test_real_decoder_reports_unavailable(spark):
    media = mm.make_fake_media(spark, n=3)
    out = mm.extract_features(media, fake=False).collect()
    assert all(r["decode_ok"] == "decoder_unavailable" for r in out)
    assert all(r["feature"] is None for r in out)


def test_frame_sample_plan(spark):
    import math

    media = mm.make_fake_media(spark, n=16)  # includes a 0-duration video
    frames = mm.frame_sample_plan(media, every_s=1.0)
    rows = frames.collect()
    assert all(r["frame_ts"] == r["frame_idx"] * 1.0 for r in rows)
    # per-video frame count = ceil(duration / every): strictly before the
    # duration (no frame at ts == duration), none for 0-duration videos
    from collections import Counter

    per = Counter(r["media_id"] for r in rows)
    for m in media.where("kind = 'video'").collect():
        want = math.ceil(m["duration_s"]) if m["duration_s"] > 0 else 0
        assert per.get(m["media_id"], 0) == want


def test_resize_media_binary_roundtrip(spark):
    from qcfractal_spark.functions.multimodal import make_fake_media, resize_media

    media = make_fake_media(spark, n=16)
    out = resize_media(media, width=4, height=3).collect()
    assert len(out) == 16
    for r in out:
        assert r["resize_ok"] == "ok"
        assert (r["width"], r["height"]) == (4, 3)
        assert len(r["content"]) == 12  # binary payload re-tiled to w*h
    # real-decoder slot degrades gracefully, never crashes the job
    degraded = resize_media(media, width=2, height=2, fake=False).collect()
    assert all(r["resize_ok"] == "decoder_unavailable" for r in degraded)
    assert all(r["content"] is None for r in degraded)
