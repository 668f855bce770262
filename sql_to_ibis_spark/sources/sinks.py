"""Sink helpers.

The reference has no sinks at all — it returns an expression and the caller
executes (SURVEY §2.1). Our engine returns a lazy DataFrame, so every Spark
writer already works; these helpers encode the scale-relevant knobs:
partitioned layout for pruning, bucketing for co-located joins, and
compaction control, so downstream readers get the layout a 100 TB pipeline
needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_files: int | None = None,
) -> None:
    """Parquet sink. ``partition_by`` gives directory-partitioned layout
    (readers get partition pruning); ``target_files`` repartitions before the
    write to control file count/size (small-files problem at scale)."""
    out = df.repartition(target_files) if target_files else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on ``bucket_cols`` between
    tables bucketed the same way skip the shuffle entirely — the co-location
    primitive for repeated big-big joins.

    The frame is repartitioned to ``num_buckets`` on the bucket columns
    first so each bucket lands in exactly ONE file (Spark's bucket hash
    and ``repartition`` use the same Murmur3 partitioning): without it
    every write task emits its own file per bucket, and a sorted bucket
    split over several files loses its scan-reported ordering — the
    property that lets a window/merge-join on the key elide its sort
    entirely (see session.py's bucketedTableScan.outputOrdering)."""
    writer = (df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
              .write.mode(mode)
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True, **options) -> None:
    df.write.mode(mode).options(header=str(header).lower(), **options).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite",
               **options) -> None:
    df.write.mode(mode).options(**options).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
