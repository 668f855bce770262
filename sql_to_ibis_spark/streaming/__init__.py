from sql_to_ibis_spark.streaming.ops import (
    dedup_within_watermark,
    ingest_dedup_stream,
    interval_join,
    sessionize,
    sliding_counts,
    stateful_dedup_stream,
    stream_from_table,
    stream_to_parquet,
    tumbling_counts,
)

__all__ = [
    "dedup_within_watermark",
    "ingest_dedup_stream",
    "interval_join",
    "sessionize",
    "sliding_counts",
    "stateful_dedup_stream",
    "stream_from_table",
    "stream_to_parquet",
    "tumbling_counts",
]
