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


# ---------------------------------------------------------------------------
# Real decoders (codec-free formats): hand-built fixtures, exact expectations
# ---------------------------------------------------------------------------

def _bmp_2x2() -> bytes:
    """24-bit bottom-up BMP, 2x2: top row = red, green; bottom = blue, white."""
    import struct

    # pixel rows are bottom-up and BGR, padded to 4 bytes (2*3=6 -> pad 2)
    bottom = bytes([255, 0, 0,  255, 255, 255]) + b"\x00\x00"  # blue, white
    top = bytes([0, 0, 255,  0, 255, 0]) + b"\x00\x00"         # red, green
    pixels = bottom + top
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    return header + info + pixels


def _ppm_2x1() -> bytes:
    # comment in header exercises the '#' skip; pixels: black, white
    return b"P6\n# tiny\n2 1\n255\n" + bytes([0, 0, 0, 255, 255, 255])


def _wav_mono() -> bytes:
    """16-bit PCM mono, 4 samples: 0, max, 0, min."""
    import struct

    data = struct.pack("<4h", 0, 32767, 0, -32768)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def test_real_image_decode_exact():
    px = mm._decode_image_pixels(_bmp_2x2())
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]    # top-left red
    assert px[0, 1].tolist() == [0, 255, 0]    # top-right green
    assert px[1, 0].tolist() == [0, 0, 255]    # bottom-left blue
    assert px[1, 1].tolist() == [255, 255, 255]
    feats = mm._decode_real(_bmp_2x2(), "image")
    assert feats[:2] == [2.0, 2.0]
    assert feats[2:5] == [127.5, 127.5, 127.5]  # channel means over the 4 px
    px2 = mm._decode_image_pixels(_ppm_2x1())
    assert px2.shape == (1, 2, 3)
    assert px2[0, 0].tolist() == [0, 0, 0] and px2[0, 1].tolist() == [255] * 3


def test_real_wav_decode_exact():
    f = mm._decode_real(_wav_mono(), "audio")
    n, ch, rate, mean, rms, lo, hi, zc = f
    assert (n, ch, rate) == (4.0, 1.0, 8000.0)
    assert hi == 32767 / 32768.0 and lo == -1.0
    assert abs(mean - (32767 / 32768.0 - 1.0) / 4.0) < 1e-12


def test_real_kernels_through_spark(spark):
    """fake=False is REAL end-to-end for codec-free payloads and degrades
    per-row (not per-job) for payloads that need a codec."""
    rows = [
        (1, "image", _bmp_2x2(), "image/bmp", 2, 2, None),
        (2, "image", _ppm_2x1(), "image/x-portable-pixmap", 2, 1, None),
        (3, "audio", _wav_mono(), "audio/wav", None, None, 0.0005),
        (4, "image", b"\x89PNG\r\n\x1a\nfake", "image/png", 8, 8, None),
        # MALFORMED payloads (lying/truncated headers) must degrade per-row,
        # never crash the job: a BMP header claiming pixels it doesn't have,
        # a PPM whose comment never terminates, a WAV with channels=0
        (5, "image", _bmp_2x2()[:54], "image/bmp", 2, 2, None),
        (6, "image", b"P6\n# endless comment", "image/x-portable-pixmap", 1, 1, None),
        (7, "audio", _wav_mono().replace(b"\x01\x00\x01\x00", b"\x01\x00\x00\x00", 1),
         "audio/wav", None, None, 0.0005),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.extract_features(media, fake=False).collect()}
    assert out[1]["decode_ok"] == out[2]["decode_ok"] == out[3]["decode_ok"] == "ok"
    for bad in (4, 5, 6, 7):
        assert out[bad]["decode_ok"] == "decoder_unavailable" and out[bad]["feature"] is None
    assert out[1]["feature"][:2] == [2.0, 2.0]
    assert out[3]["feature"][2] == 8000.0

    # real resize: BMP 2x2 -> 4x4 P6, nearest-neighbor => quadrant colors
    rs = {r["media_id"]: r for r in mm.resize_media(media, 4, 4, fake=False).collect()}
    assert rs[1]["resize_ok"] == "ok"
    px = mm._decode_image_pixels(bytes(rs[1]["content"]))
    assert px.shape == (4, 4, 3)
    assert px[0, 0].tolist() == [255, 0, 0] and px[3, 3].tolist() == [255, 255, 255]
    assert rs[4]["resize_ok"] == "decoder_unavailable"

    # real dHash: identical images hash equal, gradient image differs, and
    # phash_dedup groups the real duplicates
    # DECREASING left-to-right so dHash bits are 1 (an increasing gradient
    # and the quadrant image both hash to 0 — all comparisons false)
    grad = b"P6\n4 3\n255\n" + bytes(
        v
        for row in range(3)
        for col in range(4)
        for v in (180 - col * 60, 180 - col * 60, 180 - col * 60)
    )
    media2 = spark.createDataFrame(
        [
            (10, "image", _bmp_2x2(), "image/bmp", 2, 2, None),
            (11, "image", _bmp_2x2(), "image/bmp", 2, 2, None),
            (12, "image", grad, "image/x-portable-pixmap", 4, 3, None),
            (13, "image", b"not an image", "image/jpeg", None, None, None),
        ],
        mm.MEDIA_SCHEMA,
    )
    ph = {r["media_id"]: r["phash"] for r in mm.perceptual_hash(media2, fake=False).collect()}
    assert ph[10] == ph[11] and ph[10] is not None
    assert ph[12] is not None and ph[12] != ph[10]
    assert ph[13] is None
    groups = {r["phash"]: r for r in mm.phash_dedup(media2, fake=False).collect()}
    assert groups[ph[10]]["dup_count"] == 2 and groups[ph[10]]["keep_id"] == 10


def test_real_resize_composes(spark):
    """P6 output of a real resize is itself decodable, so resize chains
    compose: 2x2 BMP -> 8x8 -> 4x4 equals the direct 2x2 -> 4x4 result
    (nearest-neighbor on exact quadrants)."""
    media = spark.createDataFrame(
        [(1, "image", _bmp_2x2(), "image/bmp", 2, 2, None)], mm.MEDIA_SCHEMA
    )
    once = mm.resize_media(media, 8, 8, fake=False).collect()[0]
    assert once["resize_ok"] == "ok"
    mid = spark.createDataFrame(
        [(1, "image", bytes(once["content"]), "image/x-portable-pixmap", 8, 8, None)],
        mm.MEDIA_SCHEMA,
    )
    twice = mm.resize_media(mid, 4, 4, fake=False).collect()[0]
    direct = mm.resize_media(media, 4, 4, fake=False).collect()[0]
    assert bytes(twice["content"]) == bytes(direct["content"])


def test_null_content_degrades_per_row_in_real_kernels(spark):
    """ADVICE r6: MEDIA_SCHEMA.content is nullable, so a NULL-content row
    must degrade per-row in every fake=False path (features, resize, phash)
    exactly like an undecodable payload — one NULL row previously
    TypeError'd past the per-row handlers and failed the whole job."""
    media = spark.createDataFrame(
        [
            (1, "image", _bmp_2x2(), "image/bmp", 2, 2, None),
            (2, "image", None, "image/bmp", None, None, None),
            (3, "audio", None, "audio/wav", None, None, None),
        ],
        mm.MEDIA_SCHEMA,
    )
    feats = {r["media_id"]: r for r in mm.extract_features(media, fake=False).collect()}
    assert feats[1]["decode_ok"] == "ok"
    for null_row in (2, 3):
        assert feats[null_row]["decode_ok"] == "decoder_unavailable"
        assert feats[null_row]["feature"] is None
    rs = {r["media_id"]: r for r in mm.resize_media(media, 4, 4, fake=False).collect()}
    assert rs[1]["resize_ok"] == "ok" and rs[2]["resize_ok"] == "decoder_unavailable"
    ph = {r["media_id"]: r["phash"] for r in mm.perceptual_hash(media, fake=False).collect()}
    assert ph[1] is not None and ph[2] is None and ph[3] is None


def test_real_phash_rejects_wide_n_blocks(spark):
    """ADVICE r6: the real dHash kernel emits (n_blocks-1)^2 bits, so
    n_blocks=10 (81 bits) would overflow the signed-64 phash column at
    Arrow conversion — rejected driver-side with a clear error; the fake
    kernel (n_blocks-1 bits) still accepts wide n_blocks."""
    import pytest

    media = spark.createDataFrame(
        [(1, "image", _bmp_2x2(), "image/bmp", 2, 2, None)], mm.MEDIA_SCHEMA
    )
    with pytest.raises(ValueError, match="n_blocks"):
        mm.perceptual_hash(media, fake=False, n_blocks=10)
    with pytest.raises(ValueError, match="n_blocks"):
        mm._phash_real(_bmp_2x2(), n_blocks=10)
    assert mm.perceptual_hash(media, fake=True, n_blocks=10).collect()[0]["phash"] is not None


def test_external_decode_fn_hook(spark):
    """VERDICT r6 item 6: a user-supplied decode_fn plugs real codecs into
    the fake=False paths without touching the built-in decoder — built-in
    formats still decode built-in, hook formats decode via the hook, rows
    neither handles (and rows where the HOOK ITSELF raises) still degrade
    per-row.  Hooks are defined inside the test so cloudpickle ships them
    by value, exactly as a user-supplied closure would ship."""

    def _xdecode(content):
        # fake 'external codec': b'XIMG' + w + h + raw RGB bytes — a format
        # the built-in decoder rejects, standing in for Pillow/ffmpeg
        import numpy as np

        if not content or content[:4] != b"XIMG":
            raise ValueError("not an XIMG payload")
        w, h = content[4], content[5]
        return np.frombuffer(content[6 : 6 + w * h * 3], dtype=np.uint8).reshape(h, w, 3)

    # XIMG 2x2 with the same quadrant colors as the BMP fixture
    xpx = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255])
    ximg = b"XIMG" + bytes([2, 2]) + xpx
    media = spark.createDataFrame(
        [
            (1, "image", _bmp_2x2(), "image/bmp", 2, 2, None),     # built-in
            (2, "image", ximg, "image/x-test", 2, 2, None),        # hook
            (3, "image", b"\x89PNG\r\n\x1a\nzz", "image/png", 4, 4, None),  # neither
            (4, "image", None, "image/png", None, None, None),     # NULL
        ],
        mm.MEDIA_SCHEMA,
    )
    feats = {
        r["media_id"]: r
        for r in mm.extract_features(media, fake=False, decode_fn=_xdecode).collect()
    }
    assert feats[1]["decode_ok"] == feats[2]["decode_ok"] == "ok"
    assert feats[3]["decode_ok"] == feats[4]["decode_ok"] == "decoder_unavailable"
    # the hook-decoded XIMG has the same pixels as the BMP -> same features
    assert feats[2]["feature"] == feats[1]["feature"]

    # phash: hook-decoded pixels hash identically to the same built-in image
    ph = {
        r["media_id"]: r["phash"]
        for r in mm.perceptual_hash(media, fake=False, decode_fn=_xdecode).collect()
    }
    assert ph[2] == ph[1] and ph[1] is not None and ph[3] is None
    # ...so phash_dedup groups the cross-codec duplicates
    groups = {
        r["phash"]: r
        for r in mm.phash_dedup(media, fake=False, decode_fn=_xdecode).collect()
    }
    assert groups[ph[1]]["dup_count"] == 2 and groups[ph[1]]["keep_id"] == 1

    # resize through the hook; output is P6, decodable, quadrant-correct
    rs = {
        r["media_id"]: r
        for r in mm.resize_media(media, 4, 4, fake=False, decode_fn=_xdecode).collect()
    }
    assert rs[2]["resize_ok"] == "ok" and rs[3]["resize_ok"] == "decoder_unavailable"
    assert bytes(rs[2]["content"]) == bytes(rs[1]["content"])

    # a hook that raises mid-batch degrades ONLY its own row
    def bad_hook(content):
        raise RuntimeError("codec exploded")

    feats_bad = {
        r["media_id"]: r["decode_ok"]
        for r in mm.extract_features(media, fake=False, decode_fn=bad_hook).collect()
    }
    assert feats_bad == {
        1: "ok", 2: "decoder_unavailable", 3: "decoder_unavailable",
        4: "decoder_unavailable",
    }

    # no hook: unchanged honest degradation (the built-in path untouched)
    feats_none = {
        r["media_id"]: r["decode_ok"]
        for r in mm.extract_features(media, fake=False).collect()
    }
    assert feats_none == {
        1: "ok", 2: "decoder_unavailable", 3: "decoder_unavailable",
        4: "decoder_unavailable",
    }
