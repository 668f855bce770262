"""Baseline color JPEG decode (r11): interleaved MCUs, chroma
subsampling (4:2:0 / 4:2:2 / 4:4:4), multiple quantization/Huffman table
ids, restart markers (DRI/RSTn), and the JFIF YCbCr→RGB transform —
all pure numpy, tested against closed forms and encoder roundtrips."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sql_to_ibis_spark.operators import multimodal as mm


def _expected_mean(yv: float, cbv: float, crv: float) -> float:
    dcb, dcr = cbv - 128.0, crv - 128.0
    r = round(yv + 1.402 * dcr)
    g = round(yv - 0.344136 * dcb - 0.714136 * dcr)
    b = round(yv + 1.772 * dcb)
    return (r + g + b) / 3.0


@pytest.mark.parametrize("sampling", [(2, 2), (2, 1), (1, 2), (1, 1)])
def test_constant_color_exact_all_subsamplings(sampling):
    y = np.full((32, 48), 150.0)
    cb = np.full((32, 48), 108.0)
    cr = np.full((32, 48), 140.0)
    blob = mm.encode_jpeg_ycbcr(y, cb, cr, sampling)
    w, h, c, mean = mm.decode_jpeg(blob)
    assert (w, h, c) == (48, 32, 3)
    assert mean == pytest.approx(_expected_mean(150, 108, 140), abs=1e-9)


def test_gradient_rgb_roundtrip_close():
    xx, yy = np.meshgrid(np.arange(48), np.arange(32))
    rgb = np.stack([(xx * 3) % 200 + 20, (yy * 5) % 200 + 20,
                    ((xx + yy) * 2) % 200 + 20], axis=-1).astype(np.uint8)
    w, h, c, mean = mm.decode_jpeg(mm.encode_jpeg_rgb(rgb, (2, 2)))
    assert (w, h, c) == (48, 32, 3)
    # quantization + 4:2:0 chroma loss only — mean must stay close
    assert mean == pytest.approx(float(rgb.mean()), abs=1.5)


def test_gray_still_exact_through_general_decoder():
    px = np.full((16, 24), 180, dtype=np.uint8)
    w, h, c, mean = mm.decode_jpeg(mm.encode_jpeg_gray(px))
    assert (w, h, c, mean) == (24, 16, 1, 180.0)


def _segments(blob: bytes) -> list[tuple[int, bytes]]:
    """Split a JPEG into (marker, payload) segments up to SOS; the last
    element is (0xDA, payload + entropy-tail)."""
    assert blob[:2] == b"\xff\xd8"
    pos, out = 2, []
    while True:
        assert blob[pos] == 0xFF
        marker = blob[pos + 1]
        ln = int.from_bytes(blob[pos + 2:pos + 4], "big")
        payload = blob[pos + 4:pos + 2 + ln]
        if marker == 0xDA:
            out.append((marker, payload, blob[pos + 2 + ln:]))
            return out
        out.append((marker, payload, b""))
        pos += 2 + ln


def _rebuild(segs) -> bytes:
    out = b"\xff\xd8"
    for marker, payload, tail in segs:
        out += bytes([0xFF, marker]) \
            + (len(payload) + 2).to_bytes(2, "big") + payload + tail
    return out


def test_separate_chroma_table_ids():
    # rewrite the fixture blob to use Tq=1 / Td=Ta=1 for chroma (table
    # CONTENTS identical, so the entropy stream still decodes the same)
    y = np.full((16, 16), 152.0)
    cb = np.full((16, 16), 120.0)
    cr = np.full((16, 16), 136.0)
    blob = mm.encode_jpeg_ycbcr(y, cb, cr, (2, 2))
    base = mm.decode_jpeg(blob)
    segs = _segments(blob)
    out = []
    for marker, payload, tail in segs:
        if marker == 0xDB:
            out.append((marker, payload, tail))                # Tq=0
            out.append((marker, bytes([0x01]) + payload[1:], tail))
        elif marker == 0xC4:
            out.append((marker, payload, tail))                # Th=0
            out.append((marker, bytes([payload[0] | 0x01]) + payload[1:],
                        tail))
        elif marker == 0xC0:
            p = bytearray(payload)
            p[8] = 1   # Cb: Tq=1
            p[11] = 1  # Cr: Tq=1
            out.append((marker, bytes(p), tail))
        elif marker == 0xDA:
            p = bytearray(payload)
            p[4] = 0x11  # Cb: Td=1, Ta=1
            p[6] = 0x11  # Cr: Td=1, Ta=1
            out.append((marker, bytes(p), tail))
        else:
            out.append((marker, payload, tail))
    assert mm.decode_jpeg(_rebuild(out)) == base


def test_restart_markers():
    # two-MCU image (32×16 at 4:2:0) with DRI=1: encode each MCU with
    # reset DC predictors, join with RST0 — must decode identically to
    # the plain single-stream encoding
    vals = [(150.0, 108.0, 140.0), (170.0, 148.0, 116.0)]
    m = mm._jpeg_dct_matrix()
    dc = mm._huff_codes(mm._JPEG_DC_BITS, mm._JPEG_DC_VALS)
    ac = mm._huff_codes(mm._JPEG_AC_BITS, mm._JPEG_AC_VALS)
    qflat = mm._JPEG_QTAB.reshape(-1)[mm._JPEG_ZIGZAG]
    chunks = []
    for yv, cbv, crv in vals:
        bw = mm._BitWriter()
        prev = [0, 0, 0]
        for ci, v in enumerate([yv, yv, yv, yv, cbv, crv]):
            comp = 0 if ci < 4 else ci - 3
            blk = np.full((8, 8), v - 128.0)
            prev[comp] = mm._jpeg_encode_block(
                bw, blk, prev[comp], dc, ac, qflat, m)
        bw.flush()
        chunks.append(bytes(bw.out))
    entropy = chunks[0] + b"\xff\xd0" + chunks[1]

    def seg(marker, payload):
        return bytes([0xFF, marker]) \
            + (len(payload) + 2).to_bytes(2, "big") + payload

    blob = (b"\xff\xd8"
            + seg(0xDB, bytes([0]) + bytes(int(v) for v in qflat))
            + seg(0xC0, bytes([8]) + (16).to_bytes(2, "big")
                  + (32).to_bytes(2, "big")
                  + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
            + seg(0xC4, bytes([0x00]) + bytes(mm._JPEG_DC_BITS)
                  + bytes(mm._JPEG_DC_VALS))
            + seg(0xC4, bytes([0x10]) + bytes(mm._JPEG_AC_BITS)
                  + bytes(mm._JPEG_AC_VALS))
            + seg(0xDD, (1).to_bytes(2, "big"))
            + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
            + entropy + b"\xff\xd9")
    w, h, c, mean = mm.decode_jpeg(blob)
    assert (w, h, c) == (32, 16, 3)
    exp = (_expected_mean(*vals[0]) + _expected_mean(*vals[1])) / 2
    assert mean == pytest.approx(exp, abs=1e-9)


def test_decode_images_dispatches_color_for_real(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [7]}))
    blobs = mm.synthesize_jpeg_color_blobs(df)
    row = mm.decode_images(blobs).collect()[0]
    i = 7
    yv = 128 + 2 * (i % 32)
    cbv = 128 + 2 * ((i // 7) % 21 - 10)
    crv = 128 + 2 * ((i // 11) % 21 - 10)
    assert (row.width, row.height, row.channels) == \
        (16 * (1 + i % 3), 16 * (1 + (i // 3) % 3), 3)
    assert row.mean_pixel == pytest.approx(
        _expected_mean(yv, cbv, crv), abs=1e-9)


def test_progressive_now_decodes_truncated_fails():
    # r12: SOF2 routes to the progressive decoder (no longer a plug
    # point — see test_jpeg_progressive.py); a bare SOF2 with no scans
    # is a malformed stream and fails fast
    with pytest.raises(ValueError):
        mm.decode_jpeg(b"\xff\xd8\xff\xc2\x00\x0b" + bytes(9) + b"\xff\xd9")


def test_five_component_count_raises():
    # 4-component CMYK decodes since r12 (tests/test_jpeg_cmyk.py); a
    # 5-component SOF stays the documented plug point — parse succeeds,
    # the color-model tail refuses (or the starved entropy stream trips
    # the Huffman decoder first)
    y = np.full((16, 16), 150.0)
    blob = mm.encode_jpeg_ycbcr(y, y, y, (1, 1))
    segs = _segments(blob)
    out = []
    for marker, payload, tail in segs:
        if marker == 0xC0:
            p = bytearray(payload)
            p[5] = 5
            p.extend([4, 0x11, 0, 5, 0x11, 0])
            out.append((marker, bytes(p), tail))
        elif marker == 0xDA:
            p = bytearray(payload)
            p[0] = 5
            p.insert(7, 0x00)
            p.insert(7, 4)
            p.insert(9, 0x00)
            p.insert(9, 5)
            out.append((marker, bytes(p), tail))
        else:
            out.append((marker, payload, tail))
    with pytest.raises((NotImplementedError, ValueError)):
        mm.decode_jpeg(_rebuild(out))
