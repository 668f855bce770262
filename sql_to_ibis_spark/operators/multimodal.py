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

from collections.abc import Iterator

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


def decode_images(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    use_stub_decoder: bool = False,
) -> DataFrame:
    """Decode image blobs → (doc_id, width, height, channels, mean_pixel).

    Real deployment plugs PIL/libvips into ``_decode_batch``; in this
    container only the deterministic stub is available
    (``use_stub_decoder=True``): it derives fake-but-stable dimensions and a
    mean-pixel value from the blob bytes, so downstream stages and tests run
    with the true schema and batch shape.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "channels": [], "mean_pixel": []}
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                if not use_stub_decoder:
                    raise NotImplementedError(
                        "image codec not available in this environment; pass "
                        "use_stub_decoder=True or plug a real decoder here"
                    )
                data = bytes(blob or b"")
                # deterministic fake: dimensions/statistics from the bytes
                out["doc_id"].append(doc_id)
                out["width"].append(16 + (len(data) % 64))
                out["height"].append(16 + ((len(data) // 64) % 64))
                out["channels"].append(3)
                out["mean_pixel"].append(
                    (sum(data[:256]) / max(1, min(len(data), 256))) if data else 0.0
                )
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        decode_batches, schema=DECODED_IMAGE_SCHEMA
    )


def sample_audio_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    frames: int = 4,
    use_stub_decoder: bool = False,
) -> DataFrame:
    """Frame-sample an audio blob → one row per sampled frame with RMS
    energy. Stub derives deterministic pseudo-RMS from byte slices."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "rms": []}
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                if not use_stub_decoder:
                    raise NotImplementedError(
                        "audio codec not available in this environment; pass "
                        "use_stub_decoder=True or plug a real decoder here"
                    )
                data = bytes(blob or b"")
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
