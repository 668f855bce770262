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
                elif data[:8] == _PNG_MAGIC:
                    w, h, c, mean = decode_png(data)
                elif not use_stub_decoder:
                    raise NotImplementedError(
                        "only BMP and 8-bit RGB/RGBA PNG decode without an "
                        "external codec in this environment; pass "
                        "use_stub_decoder=True or plug a real decoder here"
                    )
                else:
                    # deterministic fake from the byte length (closed form,
                    # so the oracle gate can hash-check the stub path; the
                    # REAL byte-touching decodes are the BMP/PNG/WAV paths)
                    w = 16 + (len(data) % 64)
                    h = 16 + ((len(data) // 64) % 64)
                    c = 3
                    mean = (len(data) % 251) / 7.0
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


# --------------------------------------------------------------- PNG (real)
# Pure-stdlib PNG codec (zlib is in the standard library; PNG's DEFLATE +
# per-row filtering needs no external codec). Supports 8-bit RGB/RGBA,
# non-interlaced — the overwhelmingly common training-image case. Spec:
# RFC 2083 (filter types 0-4 §6; Paeth predictor §6.6).

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import zlib as _z

    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", _z.crc32(tag + payload) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (RFC 2083 §6.6), vectorized over a scanline."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    return np.where((pa <= pb) & (pa <= pc), a,
                    np.where(pb <= pc, b, c)).astype(np.uint8)


def encode_png(pixels: "np.ndarray", filter_type: int = 0) -> bytes:
    """Encode an (H, W, 3|4) uint8 array as a real PNG using one filter
    type for every scanline (0=None, 1=Sub, 2=Up, 3=Average, 4=Paeth)."""
    import zlib as _z

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    bpp = ch  # bytes per pixel (8-bit samples)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        line = px[y].reshape(-1)
        left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
        if filter_type == 0:
            enc = line
        elif filter_type == 1:
            enc = (line.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:
            enc = (line.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:
            enc = (line.astype(np.int16)
                   - ((left.astype(np.int16) + prev.astype(np.int16)) // 2)
                   ).astype(np.uint8)
        elif filter_type == 4:
            enc = (line.astype(np.int16)
                   - _paeth(left, prev, upleft)).astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {filter_type}")
        raw.append(filter_type)
        raw.extend(enc.tobytes())
        prev = line
    color_type = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _z.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> tuple[int, int, int, float]:
    """Parse + inflate + un-filter a PNG: returns (width, height, channels,
    mean_pixel). Real decode: zlib-inflates IDAT and inverts filter types
    0-4 per scanline (RFC 2083 §6). 8-bit RGB/RGBA non-interlaced only —
    exotic variants (palette, 16-bit, interlace) raise."""
    import zlib as _z

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG blob")
    pos = 8
    width = height = None
    idat = bytearray()
    channels = 0
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color_type not in (2, 6) or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color_type}, "
                    f"interlace={interlace}); only 8-bit RGB/RGBA "
                    f"non-interlaced decodes here")
            channels = 3 if color_type == 2 else 4
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = _z.decompress(bytes(idat))
    stride = width * channels
    bpp = channels
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, count=stride,
                             offset=y * (stride + 1) + 1).copy()
        if ft == 0:
            cur = line
        elif ft == 2:  # Up (vectorizable: only depends on prev row)
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ft in (1, 3, 4):  # Sub/Average/Paeth: left-to-right recurrence
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                up = prev[i]
                upleft = prev[i - bpp] if i >= bpp else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (int(left) + int(up)) // 2
                else:
                    pred = int(_paeth(np.array([left], np.uint8),
                                      np.array([up], np.uint8),
                                      np.array([upleft], np.uint8))[0])
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = cur
        prev = cur
    return width, height, channels, float(out.mean())


def synthesize_png_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministically synthesize a real PNG blob per row from its id
    (width = 4 + id % 16, height = 4 + (id // 16) % 16, all pixels =
    id % 256, scanline filter = id % 3) — after decode, width/height/
    mean_pixel must equal those closed-form expressions, so any inflate/
    un-filter/stride bug breaks the oracle hash."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            blobs = []
            for i in ids:
                i = int(i)
                w, h, v = 4 + i % 16, 4 + (i // 16) % 16, i % 256
                px = np.full((h, w, 3), v, dtype=np.uint8)
                blobs.append(encode_png(px, filter_type=i % 3))
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
