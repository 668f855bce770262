"""Shared fixtures: one SparkSession, one engine over sf0.001 testdata, one
DuckDB connection with matching views — plus the oracle-comparison helper.

Test strategy (SURVEY §5): primary correctness check is execution equality
against DuckDB on the driver's parquet testdata; reference-parity semantics
(naming, casing, duplicate renaming) are asserted directly.
"""

from __future__ import annotations

import datetime as _dt
import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from sql_to_ibis_spark import SqlEngine
from sql_to_ibis_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark(app_name="tests", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def engine(spark) -> SqlEngine:
    eng = SqlEngine(spark)
    eng.register_dir(SF_DIR)
    return eng


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for path in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Make engine/oracle frames comparable: unify numeric widths, µs
    timestamps, sort columns by name then rows by value."""
    out = df.copy()
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_integer_dtype(s):
            out[col] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            out[col] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[col] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif s.dtype == object:
            first = s.dropna().head(1)
            if len(first) and isinstance(first.iloc[0], (int,)):
                out[col] = s.astype("Int64")
            elif len(first) and isinstance(first.iloc[0], _dt.date) \
                    and not isinstance(first.iloc[0], _dt.datetime):
                # Spark DATE → datetime.date objects; DuckDB DATE →
                # datetime64 — unify
                out[col] = pd.to_datetime(s).astype("datetime64[us]")
    out = out[sorted(out.columns)]
    if len(out):
        out = out.sort_values(by=list(out.columns), na_position="last",
                              kind="mergesort").reset_index(drop=True)
    return out.reset_index(drop=True)


def compare_frames(actual: pd.DataFrame, expected: pd.DataFrame,
                   ordered: bool = False) -> None:
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"column mismatch: {sorted(actual.columns)} vs {sorted(expected.columns)}"
    )
    if ordered:
        a = actual[sorted(actual.columns)].reset_index(drop=True)
        e = expected[sorted(expected.columns)].reset_index(drop=True)
        a, e = _normalize_types_only(a), _normalize_types_only(e)
    else:
        a, e = _normalize(actual), _normalize(expected)
    pd.testing.assert_frame_equal(a, e, check_dtype=False, check_exact=False,
                                  rtol=1e-6, atol=1e-9)


def _normalize_types_only(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_integer_dtype(s):
            out[col] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            out[col] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[col] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
    return out


@pytest.fixture(scope="session")
def oracle(engine, ddb):
    """assert engine(sql) == duckdb(oracle_sql or sql)."""

    def check(sql: str, oracle_sql: str | None = None, ordered: bool = False):
        actual = engine.query(sql).toPandas()
        expected = ddb.execute(oracle_sql or sql).fetchdf()
        compare_frames(actual, expected, ordered=ordered)
        return actual

    return check
