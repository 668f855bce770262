"""PNG decode generalization (r11): grayscale, palette, gray+alpha,
16-bit, and sub-8-bit packed depths — pure-numpy roundtrips against
hand-built chunk streams (no codec, no Spark)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sql_to_ibis_spark.operators import multimodal as mm


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload)) + tag + payload \
        + struct.pack(">I", zlib.crc32(tag + payload))


def _png(width, height, depth, color_type, rows, plte=None,
         interlace=0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type,
                       0, 0, interlace)
    raw = b"".join(r for r in rows)
    out = mm._PNG_MAGIC + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _none(row: bytes) -> bytes:
    return b"\x00" + row


def test_gray8():
    blob = _png(4, 2, 8, 0, [_none(bytes([0, 1, 2, 3])),
                             _none(bytes([4, 5, 6, 7]))])
    assert mm.decode_png(blob) == (4, 2, 1, 3.5)


def test_palette_4bit():
    plte = bytes([10, 20, 30, 40, 50, 60])
    blob = _png(4, 1, 4, 3, [_none(bytes([0x01, 0x10]))], plte)
    w, h, c, mean = mm.decode_png(blob)
    assert (w, h, c) == (4, 1, 3)
    assert mean == pytest.approx((2 * 60 + 2 * 150) / 12)


def test_palette_8bit():
    plte = bytes([0, 0, 0, 255, 255, 255])
    blob = _png(2, 2, 8, 3, [_none(bytes([0, 1])), _none(bytes([1, 0]))],
                plte)
    assert mm.decode_png(blob) == (2, 2, 3, 127.5)


def test_rgb16_exact_scaling():
    # 65535 -> 255, 0 -> 0, 32896 = 128*257 -> 128 (exact v/257 mapping)
    row = bytes([0xFF, 0xFF, 0, 0, 0x80, 0x80])
    blob = _png(1, 1, 16, 2, [_none(row)])
    w, h, c, mean = mm.decode_png(blob)
    assert (w, h, c) == (1, 1, 3)
    assert mean == pytest.approx((255 + 0 + 128) / 3)


def test_gray1_scales_to_full_range():
    blob = _png(8, 1, 1, 0, [_none(bytes([0b10110000]))])
    assert mm.decode_png(blob) == (8, 1, 1, 3 * 255 / 8)


def test_gray_alpha8():
    blob = _png(2, 1, 8, 4, [_none(bytes([100, 200, 50, 60]))])
    assert mm.decode_png(blob) == (2, 1, 2, 102.5)


def test_sub_filter_16bit_uses_byte_distance():
    # Sub filter on 16-bit gray: reconstruction is BYTE-wise with
    # distance bpp=2 — sample1 = 300 (0x01 0x2C); sample2's raw bytes
    # (0x00, 0x64) add per-byte: hi 0x00+0x01=0x01, lo 0x64+0x2C=0x90
    # -> 0x0190 = 400
    v1 = (300).to_bytes(2, "big")
    row = b"\x01" + v1 + bytes([0x00, 0x64])
    blob = _png(2, 1, 16, 0, [row])
    w, h, c, mean = mm.decode_png(blob)
    assert mean == pytest.approx((300 / 257 + 400 / 257) / 2)


def test_up_filter_packed_palette():
    plte = bytes(bytearray(range(48)))  # 16 entries
    rows = [_none(bytes([0x23])), b"\x02" + bytes([0x11])]  # Up: +0x11
    blob = _png(2, 2, 4, 3, rows, plte)
    w, h, c, mean = mm.decode_png(blob)
    # row0 idx (2,3); row1 raw 0x23+0x11=0x34 -> idx (3,4)
    exp = np.array([[2, 3], [3, 4]])
    pl = np.frombuffer(plte, np.uint8).reshape(-1, 3)
    assert mean == pytest.approx(float(pl[exp].mean()))


def test_palette_index_out_of_range_raises():
    plte = bytes([1, 2, 3])  # 1 entry
    blob = _png(1, 1, 8, 3, [_none(bytes([5]))], plte)
    with pytest.raises(ValueError, match="palette index"):
        mm.decode_png(blob)


def test_interlace_single_pixel():
    # 1×1 Adam7: only pass 1 is non-empty (r12; was a raise)
    blob = _png(1, 1, 8, 0, [_none(bytes([7]))], interlace=1)
    assert mm.decode_png(blob) == (1, 1, 1, 7.0)


def test_interlace_2x2_gray_pass_order():
    # 2×2 Adam7 carries: pass1 → (0,0), pass6 → (1,0), pass7 → row 1;
    # passes 2-5 are empty and contribute NO scanline bytes
    a, b, c, d = 10, 20, 30, 40
    blob = _png(2, 2, 8, 0, [_none(bytes([a])), _none(bytes([b])),
                             _none(bytes([c, d]))], interlace=1)
    assert mm.decode_png(blob) == (2, 2, 1, (a + b + c + d) / 4.0)


def test_interlace_roundtrip_all_filters():
    rng = np.random.default_rng(3)
    for (h, w) in [(1, 7), (5, 3), (9, 13), (16, 16), (17, 31)]:
        for ft in range(5):
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            plain = mm.decode_png(mm.encode_png(px, filter_type=ft))
            inter = mm.decode_png(
                mm.encode_png(px, filter_type=ft, interlace=True))
            assert inter == plain == (w, h, 3, float(px.mean()))


def test_interlace_truncated_raises():
    blob = bytearray(mm.encode_png(
        np.zeros((9, 9, 3), np.uint8), interlace=True))
    # corrupt: re-deflate a truncated scanline stream
    import zlib
    start = blob.find(b"IDAT") - 4
    (ln,) = struct.unpack_from(">I", blob, start)
    raw = zlib.decompress(bytes(blob[start + 8:start + 8 + ln]))
    short = zlib.compress(raw[:len(raw) // 2])
    rebuilt = (bytes(blob[:start]) + _chunk(b"IDAT", short)
               + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="truncated PNG"):
        mm.decode_png(rebuilt)


def test_rgb8_rgba8_still_work():
    blob = _png(1, 1, 8, 2, [_none(bytes([10, 20, 30]))])
    assert mm.decode_png(blob) == (1, 1, 3, 20.0)
    blob = _png(1, 1, 8, 6, [_none(bytes([10, 20, 30, 40]))])
    assert mm.decode_png(blob) == (1, 1, 4, 25.0)
