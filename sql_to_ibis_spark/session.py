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
        # STATIC broadcast threshold stays at Spark's 10m default on purpose:
        # the static estimate for parquet is file-size × column fraction,
        # which at 64m let the column-pruned FACT table (lineitem, 79 MB
        # file at sf1) "broadcast" — a 6M-row driver-built hash relation
        # probed by a single-task stream side (measured: q5 4.0 s → 2.0 s,
        # q18 −67%, q17 −71% at sf1 after the fix). True dims
        # (region/nation/supplier/customer/part) are well under 10m.
        .config("spark.sql.autoBroadcastJoinThreshold", "10m")
        # the RUNTIME threshold is generous: AQE sees actual shuffle bytes,
        # not estimates, so converting a ≤64 MB side to broadcast is safe
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        # Prefer shuffled-hash over sort-merge when a side can build a
        # local hash map (Spark still falls back to SMJ otherwise, and AQE
        # skew-splitting keeps build sides bounded): skips sorting the big
        # shuffled side. Interleaved A/B at sf10 (scripts/ab_shj.py): q13
        # −27%, q5 −21%, dedup_exact −15%, q7 −13%, q21 −12%, q18/q3/
        # multiway within noise — no regressions across two sweeps.
        # SPARK_GRAFT_PREFER_SMJ=1 restores the sort-merge preference.
        .config("spark.sql.join.preferSortMergeJoin",
                "true" if os.environ.get("SPARK_GRAFT_PREFER_SMJ")
                else "false")
        # Arrow for any pandas interchange (UDF paths, toPandas)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # keep timestamps deterministic across engines/oracles
        .config("spark.sql.session.timeZone", "UTC")
        # Spark still DEFAULTS to the deprecated INT96 parquet timestamp
        # encoding, which carries NO min/max statistics — every sink the
        # engine writes (snapshots, z-ordered layouts, sized writes)
        # would produce timestamp columns that no reader can footer- or
        # row-group-prune. TIMESTAMP_MICROS is the modern INT64 form
        # with full statistics (and what the driver's own testdata
        # uses). Found via the r10 shipdate-clustering A/B: the
        # clustered snapshot showed 1.00 footer admission because the
        # INT96 shipdate had no stats to prune on.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # Report the sortBy() ordering of bucketed scans: our bucketed
        # sink writes exactly ONE file per bucket (sinks.py repartitions
        # to num_buckets on the bucket key first), so the per-bucket sort
        # is a true whole-bucket ordering and downstream sorts on the key
        # (window partitions, merge joins) are ELIDED. Spark disables the
        # report by default only because multi-file buckets would need a
        # sorted-merge read; with one file the report is exact. Measured
        # sf10 q21 over a sorted-bucketed lineitem: 2.21 s (agg-join) →
        # 1.78 s (window, sort elided) vs DuckDB 1.51 s.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        # parquet TIMESTAMP(NANOS) is otherwise unreadable; sources/readers.py
        # converts the long nanos back to TimestampType JVM-side
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.showConsoleProgress", "false")
        # UI off by default (driver/bench runs); SPARK_GRAFT_UI=1 enables
        # it so instrumentation scripts can read per-stage spill/GC/peak-
        # memory metrics from the REST API (scripts/memory_profile.py)
        .config("spark.ui.enabled",
                "true" if os.environ.get("SPARK_GRAFT_UI") == "1"
                else "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()
