"""Progressive (SOF2) JPEG decode — r11 VERDICT mandate 8 ("progressive
is the common real-world case"). The decoder accumulates quantized
coefficients over multiple scans (spectral selection + successive
approximation with EOB-run/correction-bit coding, T.81 Annex G) and then
runs the SAME dequantize/IDCT/upsample/color tail as the baseline path —
so a progressive and a baseline encoding of identical pixels must decode
BIT-IDENTICALLY. That equivalence (against the already-hash-verified
baseline decoder) is the main oracle here; the driver entry
pipeline_multimodal_decode_jpeg_progressive pins the closed form.
"""

from __future__ import annotations

import numpy as np
import pytest

from sql_to_ibis_spark.operators import multimodal as mm


def _gradient(h: int, w: int) -> "np.ndarray":
    yy, xx = np.mgrid[0:h, 0:w]
    return ((xx * 3 + yy * 2) % 256).astype(np.uint8)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_gray_progressive_equals_baseline_random(seed):
    rng = np.random.RandomState(seed)
    h, w = 8 * rng.randint(1, 5), 8 * rng.randint(1, 5)
    px = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    assert mm.decode_jpeg(mm.encode_jpeg_progressive_gray(px)) \
        == mm.decode_jpeg(mm.encode_jpeg_gray(px))


def test_gray_progressive_equals_baseline_gradient():
    # smooth content: small ACs, long EOB runs, many correction-only
    # refinement blocks
    px = _gradient(32, 24)
    assert mm.decode_jpeg(mm.encode_jpeg_progressive_gray(px)) \
        == mm.decode_jpeg(mm.encode_jpeg_gray(px))


@pytest.mark.parametrize("sampling", [(1, 1), (2, 1), (2, 2)])
def test_color_progressive_equals_baseline(sampling):
    sh, sv = sampling
    rng = np.random.RandomState(7)
    h, w = 8 * sv * 3, 8 * sh * 2
    y = rng.randint(0, 256, size=(h, w)).astype(np.float64)
    cb = rng.randint(0, 256, size=(h, w)).astype(np.float64)
    cr = rng.randint(0, 256, size=(h, w)).astype(np.float64)
    assert mm.decode_jpeg(mm.encode_jpeg_progressive_ycbcr(y, cb, cr,
                                                           sampling)) \
        == mm.decode_jpeg(mm.encode_jpeg_ycbcr(y, cb, cr, sampling))


def test_constant_fixture_closed_form():
    # the driver oracle's closed form: constant blocks survive the
    # quantize → multi-scan → reconstruct pipeline exactly
    for i in (0, 17, 63, 200):
        w, h = 8 * (1 + i % 4), 8 * (1 + (i // 4) % 4)
        v = 2 * (i % 64) + 128
        px = np.full((h, w), v, dtype=np.uint8)
        got = mm.decode_jpeg(mm.encode_jpeg_progressive_gray(px))
        assert got == (w, h, 1, float(v)), (i, got)


def test_strong_ac_content_exercises_refinement():
    # hard case for AC refinement: isolated spikes produce newly
    # significant coefficients at every successive-approximation level,
    # interleaved with correction bits and ZRL runs
    px = np.zeros((16, 16), dtype=np.uint8)
    px[::3, ::5] = 255
    px[1::4, 2::3] = 64
    assert mm.decode_jpeg(mm.encode_jpeg_progressive_gray(px)) \
        == mm.decode_jpeg(mm.encode_jpeg_gray(px))


def test_truncated_progressive_raises():
    px = _gradient(16, 16)
    blob = mm.encode_jpeg_progressive_gray(px)
    with pytest.raises(ValueError):
        mm.decode_jpeg(blob[:30])  # cut inside the tables


def test_arithmetic_sof_still_plug_point():
    # SOF9 (arithmetic sequential) remains the documented plug point
    px = _gradient(8, 8)
    blob = bytearray(mm.encode_jpeg_gray(px))
    idx = blob.find(b"\xff\xc0")
    blob[idx + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        mm.decode_jpeg(bytes(blob))


def test_decode_images_routes_progressive(spark):
    # the Spark-side plumbing: progressive blobs flow through the same
    # mapInPandas decode operator
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": range(12)}))
    blobs = mm.synthesize_jpeg_progressive_blobs(docs)
    out = mm.decode_images(blobs).toPandas().sort_values(
        "doc_id").reset_index(drop=True)
    for _, row in out.iterrows():
        i = int(row.doc_id)
        assert row.width == 8 * (1 + i % 4)
        assert row.height == 8 * (1 + (i // 4) % 4)
        assert row.channels == 1
        assert row.mean_pixel == float(2 * (i % 64) + 128)


def test_decode_on_error_contract(spark):
    # corpus-scale failure contract (r12): "null" keeps failed rows with
    # NULL metrics + the error string, "skip" drops them, "fail" raises;
    # successes are identical across all three modes
    import pandas as pd
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": range(28)}))
    blobs = mm.synthesize_jpeg_blobs_with_corruption(docs)

    acc = mm.decode_images(blobs, on_error="null").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(acc) == 28
    failed = set(acc[acc.decode_error.notna()].doc_id)
    assert failed == {3, 10, 17, 24}, failed
    bad = acc[acc.decode_error.notna()]
    assert bad.width.isna().all() and bad.mean_pixel.isna().all()
    ok = acc[acc.decode_error.isna()]
    for _, row in ok.iterrows():
        i = int(row.doc_id)
        assert row.width == 8 * (1 + i % 4)
        assert row.mean_pixel == float(2 * (i % 64) + 128)

    skipped = mm.decode_images(blobs, on_error="skip").toPandas()
    assert set(skipped.columns) == {"doc_id", "width", "height",
                                    "channels", "mean_pixel"}
    assert set(skipped.doc_id) == set(range(28)) - {3, 10, 17, 24}

    import pytest as _pytest
    with _pytest.raises(Exception):
        mm.decode_images(blobs, on_error="fail").toPandas()
    with _pytest.raises(ValueError):
        mm.decode_images(blobs, on_error="bogus")


def test_decode_error_rate_aggregation(spark):
    # the accounting use: one aggregate gives the corpus error rate
    import pandas as pd
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": range(70)}))
    out = mm.decode_images(
        mm.synthesize_jpeg_blobs_with_corruption(docs), on_error="null")
    rate = out.agg(
        F.avg(F.col("decode_error").isNotNull().cast("double"))
    ).collect()[0][0]
    assert rate == 10 / 70
