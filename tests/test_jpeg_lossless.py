"""Lossless JPEG (T.81 SOF3, Annex H; r12 — was the documented plug
point): per-sample predictive coding with Huffman-coded differences.
Lossless decode must be BIT-EXACT for arbitrary content — the strongest
possible roundtrip property, fuzzed over every predictor, channel
count, and the SSSS=16 special case."""

from __future__ import annotations

import numpy as np
import pytest

from sql_to_ibis_spark.operators import multimodal as mm


def test_random_roundtrip_all_predictors():
    rng = np.random.default_rng(2)
    for pred in range(1, 8):
        for ch in (1, 3):
            shape = (11, 17) if ch == 1 else (11, 17, ch)
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
            got = mm.decode_jpeg(mm.encode_jpeg_lossless(px, predictor=pred))
            assert got == (17, 11, ch, float(px.mean()))


def test_degenerate_shapes():
    for h, w in ((1, 1), (1, 9), (9, 1), (2, 2)):
        px = (np.arange(h * w, dtype=np.uint8).reshape(h, w) * 7) % 251
        got = mm.decode_jpeg(mm.encode_jpeg_lossless(px, predictor=4))
        assert got == (w, h, 1, float(px.mean()))


def test_point_transform():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    got = mm.decode_jpeg(mm.encode_jpeg_lossless(px, predictor=7, pt=3))
    assert got == (13, 9, 1, float(((px.astype(int) >> 3) << 3).mean()))


def test_extreme_differences_hit_ssss16():
    # alternating 0/255 with left-prediction produces ±255 diffs; a
    # crafted wrap exercises the mod-2^16 reconstruction path
    px = np.zeros((4, 8), np.uint8)
    px[:, 1::2] = 255
    got = mm.decode_jpeg(mm.encode_jpeg_lossless(px, predictor=1))
    assert got == (8, 4, 1, float(px.mean()))


def test_closed_form_fixture():
    for i in (0, 7, 123, 999, 4321):
        w, h, v = 4 + i % 16, 4 + (i // 16) % 16, i % 200
        grid = (v + np.arange(w)[None, :] + np.arange(h)[:, None]) \
            .astype(np.uint8)
        got = mm.decode_jpeg(mm.encode_jpeg_lossless(grid,
                                                     predictor=1 + i % 7))
        assert got == (w, h, 1,
                       v + (w - 1) / 2.0 + (h - 1) / 2.0)


def test_invalid_predictor_raises():
    with pytest.raises(ValueError):
        mm.encode_jpeg_lossless(np.zeros((4, 4), np.uint8), predictor=0)
    blob = bytearray(mm.encode_jpeg_lossless(np.zeros((4, 4), np.uint8)))
    sos = bytes(blob).find(b"\xff\xda")
    # predictor byte sits after ns + (cid, td) pairs
    blob[sos + 2 + 2 + 1 + 2] = 0
    with pytest.raises(ValueError):
        mm.decode_jpeg(bytes(blob))


def test_truncated_raises():
    blob = mm.encode_jpeg_lossless(
        np.arange(64, dtype=np.uint8).reshape(8, 8))
    with pytest.raises(ValueError):
        mm.decode_jpeg(blob[:len(blob) // 3])


def test_distributed_decode(spark):
    docs = spark.createDataFrame([(i,) for i in range(48)], "doc_id long")
    out = mm.decode_images(mm.synthesize_jpeg_lossless_blobs(docs)).collect()
    assert len(out) == 48
    for r in out:
        i = r["doc_id"]
        w, h, v = 4 + i % 16, 4 + (i // 16) % 16, i % 200
        assert (r["width"], r["height"], r["channels"]) == (w, h, 1)
        assert r["mean_pixel"] == v + (w - 1) / 2.0 + (h - 1) / 2.0
