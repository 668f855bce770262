"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]``; the settings below are chosen to also be the
right defaults on a large cluster (AQE handles runtime re-planning, skew joins
and partition coalescing at any scale; Arrow keeps any pandas-interchange
vectorized).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sql_to_ibis_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime shuffle-partition coalescing, skew-join splitting,
        # dynamic broadcast conversion — the scale-survival switches
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # dimension tables (region/nation/customer/part/supplier at test SF)
        # should broadcast; AQE also converts at runtime
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Arrow for any pandas interchange (UDF paths, toPandas)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # keep timestamps deterministic across engines/oracles
        .config("spark.sql.session.timeZone", "UTC")
        # parquet TIMESTAMP(NANOS) is otherwise unreadable; sources/readers.py
        # converts the long nanos back to TimestampType JVM-side
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()
