"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata.

Uncompressed formats need no external codec, so BMP (images) and WAV/PCM
(audio) are decoded for real with pure-Python/numpy header parsing inside
the same ``mapInPandas`` plumbing a PIL/ffmpeg deployment would use.
Compressed/exotic codecs are stubbed behind ``use_stub_decoder`` (a
deterministic fake) or raise ``NotImplementedError``.

Scale notes: media bytes dominate row size, so these operators (a) never
collect, (b) use ``mapInPandas`` so one Arrow batch holds few rows of big
blobs (bound via ``spark.sql.execution.arrow.maxRecordsPerBatch``), and
(c) keep metadata-only projections separate from blob-touching stages so
column pruning drops the bytes when only metadata is needed.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

DECODED_IMAGE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("mean_pixel", T.DoubleType()),
])

AUDIO_FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
])


def attach_blob_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Cheap, JVM-side metadata for a binary column: byte length + content
    hash (dedup key for exact blob dedup). Never decodes."""
    b = F.col(blob_col)
    return df.withColumn("blob_bytes", F.length(b).cast("long")) \
             .withColumn("blob_sha", F.sha2(b, 256))


# --------------------------------------------------------------- BMP (real)


def encode_bmp(width: int, height: int, pixel_value: int) -> bytes:
    """Build a minimal 24bpp uncompressed BMP (BITMAPINFOHEADER) whose
    pixels all hold ``pixel_value`` in each channel. Rows padded to 4-byte
    boundaries per the format. Used to synthesize real image blobs in tests
    and oracle entries."""
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    pixel_data = (bytes([pixel_value & 0xFF] * row_bytes) + b"\x00" * pad) \
        * height
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_data), 0, 0,
                         14 + 40)
    return header + info + pixel_data


def decode_bmp(data: bytes) -> tuple[int, int, int, float]:
    """Parse an uncompressed 24/32bpp BMP: returns (width, height, channels,
    mean_pixel). Pure header+numpy — no codec needed (the format is raw)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP blob")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError("unsupported BMP header (BITMAPCOREHEADER)")
    width = struct.unpack_from("<i", data, 18)[0]
    height_raw = struct.unpack_from("<i", data, 22)[0]
    height = abs(height_raw)  # negative height = top-down row order
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    channels = bpp // 8
    row_bytes = width * channels
    stride = (row_bytes + 3) & ~3
    px = np.frombuffer(data, dtype=np.uint8, count=stride * height,
                       offset=pixel_offset)
    # drop per-row padding before the statistic
    rows = px.reshape(height, stride)[:, :row_bytes]
    return width, height, channels, float(rows.mean())


def decode_images(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    use_stub_decoder: bool = False,
) -> DataFrame:
    """Decode image blobs → (doc_id, width, height, channels, mean_pixel).

    BMP blobs (uncompressed 24/32bpp) are decoded FOR REAL — header parse +
    numpy pixel statistics, no codec required. Other formats fall back to
    the deterministic stub when ``use_stub_decoder=True`` (fake-but-stable
    dimensions derived from the bytes, so downstream stages and tests run
    with the true schema and batch shape) or raise ``NotImplementedError``
    (plug PIL/libvips here in a real deployment).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "channels": [], "mean_pixel": []}
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(blob or b"")
                if data[:2] == b"BM":
                    w, h, c, mean = decode_bmp(data)
                elif not use_stub_decoder:
                    raise NotImplementedError(
                        "only uncompressed BMP decodes without a codec in "
                        "this environment; pass use_stub_decoder=True or "
                        "plug a real decoder here"
                    )
                else:
                    # deterministic fake from the bytes
                    w = 16 + (len(data) % 64)
                    h = 16 + ((len(data) // 64) % 64)
                    c = 3
                    mean = (sum(data[:256]) / max(1, min(len(data), 256))) \
                        if data else 0.0
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["mean_pixel"].append(mean)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        decode_batches, schema=DECODED_IMAGE_SCHEMA
    )


def synthesize_bmp_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministically synthesize a real BMP blob per row from its id
    (width = 4 + id % 16, height = 4 + (id // 16) % 16, all pixels =
    id % 256) — gives the decode path an oracle: after decode, width/
    height/mean_pixel must equal those closed-form expressions."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            blobs = [
                encode_bmp(4 + int(i) % 16, 4 + (int(i) // 16) % 16,
                           int(i) % 256)
                for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("blob", T.BinaryType()),
    ])
    return df.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(build, schema=schema)


# ----------------------------------------------------------- WAV/PCM (real)


def encode_wav(samples: "np.ndarray", sample_rate: int = 16000,
               channels: int = 1) -> bytes:
    """Build a 16-bit PCM WAV blob from an int16 sample array. Used to
    synthesize real audio blobs in tests."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
                      byte_rate, channels * 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data),
                      b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(data: bytes) -> tuple[int, int, "np.ndarray"]:
    """Parse a 16-bit PCM WAV: returns (sample_rate, channels, samples as
    int16 ndarray). RIFF chunk walk — no codec needed (PCM is raw)."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV blob")
    pos, rate, channels, bits, samples = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_tag != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (format={fmt_tag}, bits={bits}); "
                    f"only 16-bit PCM decodes without a codec")
        elif cid == b"data":
            samples = np.frombuffer(body[: len(body) & ~1], dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, channels, samples


def synthesize_wav_blobs(df: DataFrame, id_col: str = "doc_id",
                         n_samples: int = 8000) -> DataFrame:
    """Deterministically synthesize a real 16-bit PCM WAV blob per row from
    its id (constant amplitude = id % 1000) — gives the audio decode path
    an oracle: every frame's RMS must equal exactly ``id % 1000``."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            blobs = [
                encode_wav(np.full(n_samples, int(i) % 1000, dtype=np.int16))
                for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("blob", T.BinaryType()),
    ])
    return df.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(build, schema=schema)


def sample_audio_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    frames: int = 4,
    use_stub_decoder: bool = False,
) -> DataFrame:
    """Frame-sample an audio blob → one row per sampled frame with RMS
    energy. WAV/PCM blobs decode FOR REAL (RIFF parse + numpy RMS over
    equal sample slices); other formats use the deterministic stub or
    raise (plug ffmpeg here in a real deployment)."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "rms": []}
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(blob or b"")
                if data[:4] == b"RIFF":
                    _, _, samples = decode_wav(data)
                    step = max(1, len(samples) // frames)
                    for i in range(frames):
                        chunk = samples[i * step : (i + 1) * step]
                        if not len(chunk):
                            chunk = np.zeros(1, dtype="<i2")
                        rms = float(np.sqrt(
                            np.mean(chunk.astype(np.float64) ** 2)))
                        rows["doc_id"].append(doc_id)
                        rows["frame_idx"].append(i)
                        rows["rms"].append(rms)
                    continue
                if not use_stub_decoder:
                    raise NotImplementedError(
                        "only 16-bit PCM WAV decodes without a codec in this "
                        "environment; pass use_stub_decoder=True or plug a "
                        "real decoder here"
                    )
                step = max(1, len(data) // frames)
                for i in range(frames):
                    chunk = data[i * step : (i + 1) * step] or b"\x00"
                    rms = (sum(x * x for x in chunk) / len(chunk)) ** 0.5
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["rms"].append(rms)
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(
        sample_batches, schema=AUDIO_FRAME_SCHEMA
    )


def exact_blob_dedup(df: DataFrame, blob_col: str = "blob",
                     order_col: str = "doc_id") -> DataFrame:
    """Exact dedup of binary payloads by content hash — hashes shuffle, the
    blobs themselves only move with their surviving rows."""
    from sql_to_ibis_spark.operators.dedup import exact_dedup

    with_hash = df.withColumn("__blob_sha", F.sha2(F.col(blob_col), 256))
    return exact_dedup(with_hash, ["__blob_sha"], order_col).drop("__blob_sha")
