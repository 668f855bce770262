"""Source readers.

The reference reads nothing itself (tests load CSVs with pandas —
``sql_to_ibis/tests/conftest.py:30-61``); our engine delegates to Spark's
native readers, which give columnar scans, predicate pushdown, column pruning
and partition pruning for free at any scale.

One real-world wrinkle handled here: parquet files with TIMESTAMP(NANOS)
columns (pandas/pyarrow default). Spark cannot represent nanosecond precision;
with ``spark.sql.legacy.parquet.nanosAsLong=true`` the column arrives as a
raw long which we convert to ``TimestampType`` JVM-side via integer division
(``div 1000`` — micros), keeping full codegen and avoiding any Python/driver
round-trip.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) in the file footer."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
    except Exception:
        return []
    out = []
    for fld in schema:
        t = fld.type
        if str(t).startswith("timestamp[ns"):
            out.append(fld.name)
    return out


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    probe = path
    if os.path.isdir(path):
        inner = sorted(glob.glob(os.path.join(path, "*.parquet")))
        probe = inner[0] if inner else path
    dtypes = dict(df.dtypes)
    for col in _nanos_timestamp_columns(probe):
        # only when the nanosAsLong flag actually surfaced the column as a
        # raw long — Spark-written INT96 timestamps also show as
        # timestamp[ns] in the footer but arrive as TIMESTAMP already
        if dtypes.get(col) != "bigint":
            continue
        # integer division keeps exactness (ns-since-epoch exceeds double
        # precision); timestamp_micros stays inside whole-stage codegen
        df = df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
        )
    # tz-less parquet timestamps (timestamp[us]/[ms] without isAdjustedToUTC)
    # arrive as TIMESTAMP_NTZ, which Spark refuses for event-time watermarks
    # and which would diverge from the engine's TimestampType surface. The
    # session runs in UTC, so the NTZ→TZ cast is value-exact.
    from pyspark.sql import types as T

    for fld in df.schema.fields:
        if isinstance(fld.dataType, T.TimestampNTZType):
            df = df.withColumn(fld.name, F.col(fld.name).cast("timestamp"))
    return df


def read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    opts = {"header": "true", "inferSchema": "true", **options}
    return spark.read.options(**opts).csv(path)


def read_json(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).json(path)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).orc(path)


def read_table_dir(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load every ``<name>.parquet`` under a directory (the /root/testdata
    layout) → {name: DataFrame}."""
    out: dict[str, DataFrame] = {}
    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.splitext(os.path.basename(p))[0]
        if tables is not None and name not in tables:
            continue
        out[name] = read_parquet(spark, p)
    return out
