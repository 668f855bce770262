from sql_to_ibis_spark.streaming.ops import (
    sessionize,
    sliding_counts,
    stateful_dedup_stream,
    stream_from_table,
    tumbling_counts,
)

__all__ = [
    "sessionize",
    "sliding_counts",
    "stateful_dedup_stream",
    "stream_from_table",
    "tumbling_counts",
]
