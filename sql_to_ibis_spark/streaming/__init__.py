from sql_to_ibis_spark.streaming.ops import (
    sessionize,
    sliding_counts,
    stateful_dedup_stream,
    stream_from_table,
    stream_to_parquet,
    tumbling_counts,
)

__all__ = [
    "sessionize",
    "sliding_counts",
    "stateful_dedup_stream",
    "stream_from_table",
    "stream_to_parquet",
    "tumbling_counts",
]
