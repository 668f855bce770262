"""FILTER (WHERE ...) and IGNORE NULLS semantics.

The reference grammar has neither clause (extension surface), but their
NULL-handling corners are easy to get silently wrong: masking non-matching
rows to NULL is only equivalent to row filtering for aggregates that *skip*
NULL inputs. first/last/any_value do not, so they need ignorenulls=True when
filtered; user UDAFs have unknown NULL semantics and must be rejected.
"""

from __future__ import annotations

import pandas as pd
import pytest

from sql_to_ibis_spark import SqlEngine
from sql_to_ibis_spark.errors import InvalidQueryException


@pytest.fixture(scope="module")
def feng(spark) -> SqlEngine:
    eng = SqlEngine(spark)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2, 3, 4, 5, 6],
                "grp": ["a", "a", "a", "b", "b", "b"],
                "v": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
                "flag": [False, True, True, False, False, True],
            }
        )
    ).coalesce(1)
    eng.register_temp_table(df, "t")
    yield eng
    eng.remove_temp_table("t")


def test_filter_sum_count(feng, ddb):
    sql = ("SELECT grp, sum(v) FILTER (WHERE flag) AS s, "
           "count(*) FILTER (WHERE flag) AS c FROM t GROUP BY grp")
    got = feng.query(sql).toPandas().sort_values("grp").reset_index(drop=True)
    assert got["s"].tolist() == [50.0, 60.0]
    assert got["c"].tolist() == [2, 1]


def test_filter_first_skips_masked_rows(feng):
    # row 1 (flag=False) masks to NULL; a naive mask-only first() would
    # return that NULL instead of the first matching value (ADVICE r3)
    sql = ("SELECT grp, first(v) FILTER (WHERE flag) AS fv, "
           "last(v) FILTER (WHERE flag) AS lv "
           "FROM (SELECT * FROM t ORDER BY id) s GROUP BY grp")
    got = feng.query(sql).toPandas().sort_values("grp").reset_index(drop=True)
    assert got["fv"].tolist() == [20.0, 60.0]
    assert got["lv"].tolist() == [30.0, 60.0]


def test_filter_any_value_never_null_when_match_exists(feng):
    sql = ("SELECT grp, any_value(v) FILTER (WHERE flag) AS av "
           "FROM t GROUP BY grp")
    got = feng.query(sql).toPandas()
    assert got["av"].notna().all()
    assert set(got.loc[got["av"].notna(), "av"]) <= {20.0, 30.0, 60.0}


def test_filter_windowed_first(feng):
    sql = ("SELECT id, first(v) FILTER (WHERE flag) OVER "
           "(PARTITION BY grp ORDER BY id) AS fv FROM t ORDER BY id")
    got = feng.query(sql).toPandas()
    # partition a: rows 1..3 — first matching v is 20 (row 2); row 1 has no
    # matching row in its frame yet → NULL
    assert got["fv"].tolist()[:3] == [None, 20.0, 20.0] or (
        pd.isna(got["fv"].iloc[0]) and got["fv"].tolist()[1:3] == [20.0, 20.0]
    )
    assert pd.isna(got["fv"].iloc[3]) and pd.isna(got["fv"].iloc[4])
    assert got["fv"].iloc[5] == 60.0


def test_filter_user_aggregate_rejected(feng):
    def total(s: pd.Series) -> float:
        return float(s.sum())

    feng.register_aggregate("my_total", total, "double")
    try:
        with pytest.raises(InvalidQueryException, match="user-registered"):
            feng.query(
                "SELECT my_total(v) FILTER (WHERE flag) AS x FROM t").collect()
        # unfiltered user aggregate still works
        got = feng.query("SELECT my_total(v) AS x FROM t").toPandas()
        assert got["x"].iloc[0] == 210.0
    finally:
        feng.remove_aggregate("my_total")


def test_ignore_nulls_windowed_first(feng, spark):
    eng = SqlEngine(spark)
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "v": [None, 7.0, 8.0]})
    ).coalesce(1)
    eng.register_temp_table(df, "n")
    try:
        got = eng.query(
            "SELECT id, first(v) IGNORE NULLS OVER (ORDER BY id) AS fv "
            "FROM n ORDER BY id").toPandas()
        assert pd.isna(got["fv"].iloc[0])
        assert got["fv"].tolist()[1:] == [7.0, 7.0]
    finally:
        eng.remove_temp_table("n")


def test_ignore_nulls_plain_aggregate_rejected(feng):
    with pytest.raises(InvalidQueryException):
        feng.query("SELECT avg(v) IGNORE NULLS OVER () AS a FROM t").collect()
    with pytest.raises(InvalidQueryException):
        feng.query("SELECT sum(v) IGNORE NULLS AS a FROM t").collect()


def test_lag_ignore_nulls_non_literal_offset_rejected(feng):
    with pytest.raises(InvalidQueryException, match="literal"):
        feng.query(
            "SELECT lag(v, 1 + 1) IGNORE NULLS OVER (ORDER BY id) AS x "
            "FROM t").collect()
