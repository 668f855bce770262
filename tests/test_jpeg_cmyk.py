"""4-component CMYK/YCCK JPEG decode (r12; was the documented plug
point): Adobe APP14 parsing, inverted-ink storage, the YCCK transform
(CMY channels as YCbCr of their RGB complements), and 4-component MCU
interleave — pure-numpy roundtrips against the from-scratch fixture
encoder, no Spark."""

from __future__ import annotations

import numpy as np
import pytest

from sql_to_ibis_spark.operators import multimodal as mm


def _solid(c, m, y, k, h=16, w=24):
    ink = np.zeros((h, w, 4), np.uint8)
    ink[..., 0], ink[..., 1], ink[..., 2], ink[..., 3] = c, m, y, k
    return ink


def test_cmyk_solid_roundtrip_exact():
    # odd ink values quantize losslessly (even level shifts through the
    # Annex K DC step) — brute-force verified across the odd domain
    for v in (1, 17, 127, 201, 255, 0):
        got = mm.decode_jpeg(mm.encode_jpeg_cmyk(_solid(v, v, v, v)))
        assert got == (24, 16, 4, float(v))


def test_cmyk_independent_channels():
    got = mm.decode_jpeg(mm.encode_jpeg_cmyk(_solid(11, 61, 111, 221)))
    assert got == (24, 16, 4, (11 + 61 + 111 + 221) / 4.0)


def test_ycck_equal_cmy_exact():
    # YCCK with C=M=Y (gray in RGB space) pins Cb=Cr=128 — exact
    for v, k in ((1, 255), (77, 3), (255, 1)):
        got = mm.decode_jpeg(
            mm.encode_jpeg_cmyk(_solid(v, v, v, k), transform=2))
        assert got == (24, 16, 4, (3 * v + k) / 4.0)


def test_ycck_mixed_channels_close():
    # mixed CMY under YCCK is quantization-approximate (the forward /
    # inverse YCbCr pair does not commute with Annex K quantization)
    ink = _solid(11, 61, 111, 221)
    w, h, ch, mean = mm.decode_jpeg(mm.encode_jpeg_cmyk(ink, transform=2))
    assert (w, h, ch) == (24, 16, 4)
    assert mean == pytest.approx(ink.mean(), abs=2.0)


def test_missing_app14_defaults_to_inverted_cmyk():
    # strip APP14: a 4-component stream without it must decode as plain
    # inverted CMYK (Adobe files always carry it; foreign ones may not)
    blob = bytearray(mm.encode_jpeg_cmyk(_solid(17, 17, 17, 17)))
    assert blob[2:4] == b"\xff\xee"
    ln = int.from_bytes(blob[4:6], "big")
    stripped = bytes(blob[:2]) + bytes(blob[4 + ln:])
    got = mm.decode_jpeg(stripped)
    assert got == (24, 16, 4, 17.0)


def test_arithmetic_relabel_of_cmyk_fails_fast():
    blob = bytearray(mm.encode_jpeg_cmyk(_solid(1, 1, 1, 1)))
    sof = bytes(blob).find(b"\xff\xc0")
    blob[sof + 1] = 0xC9  # arithmetic coding stays the plug point
    with pytest.raises(NotImplementedError):
        mm.decode_jpeg(bytes(blob))


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        mm.encode_jpeg_cmyk(np.zeros((8, 8, 3), np.uint8))
    with pytest.raises(ValueError):
        mm.encode_jpeg_cmyk(np.zeros((7, 8, 4), np.uint8))
    with pytest.raises(ValueError):
        mm.encode_jpeg_cmyk(np.zeros((8, 8, 4), np.uint8), transform=1)


def test_cmyk_distributed_decode(spark):
    docs = spark.createDataFrame([(i,) for i in range(64)], "doc_id long")
    out = mm.decode_images(mm.synthesize_jpeg_cmyk_blobs(docs)).collect()
    assert len(out) == 64
    for r in out:
        i = r["doc_id"]
        k = 2 * ((i // 11) % 127) + 1
        if i % 2 == 0:
            exp = (2 * (i % 127) + 1 + 2 * ((i // 3) % 127) + 1
                   + 2 * ((i // 7) % 127) + 1 + k) / 4.0
        else:
            exp = (3 * (2 * (i % 127) + 1) + k) / 4.0
        assert r["width"] == 8 * (1 + i % 3)
        assert r["height"] == 8 * (1 + (i // 3) % 3)
        assert r["channels"] == 4
        assert r["mean_pixel"] == exp
