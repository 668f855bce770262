"""PIVOT / UNPIVOT relation postfixes (SQL-standard form, DuckDB-compatible):
differential tests against DuckDB on the same parquet + error contracts."""

from __future__ import annotations

import pytest

from sql_to_ibis_spark.errors import InvalidQueryException
from tests.conftest import compare_frames


def _cmp(engine, ddb, sql):
    compare_frames(engine.query(sql).toPandas(), ddb.execute(sql).fetchdf())


def test_pivot_sum_matches_duckdb(engine, ddb):
    _cmp(engine, ddb, """
        SELECT * FROM (SELECT user_id % 3 AS ub, event_type, value
                       FROM events)
        PIVOT (sum(value) FOR event_type IN ('click', 'view', 'error'))
    """)


def test_pivot_alias_projection_where(engine, ddb):
    _cmp(engine, ddb, """
        SELECT p.ub, p.click FROM
        (SELECT user_id % 3 AS ub, event_type, value FROM events)
        PIVOT (count(value) FOR event_type IN ('click', 'view')) p
        WHERE p.ub < 2
    """)


def test_pivot_groups_by_all_unreferenced_columns(engine, ddb):
    _cmp(engine, ddb, """
        SELECT * FROM (SELECT user_id % 2 AS a, user_id % 3 AS b,
                              event_type, value FROM events)
        PIVOT (min(value) FOR event_type IN ('click'))
    """)


def test_unpivot_matches_duckdb(engine, ddb):
    _cmp(engine, ddb, """
        SELECT * FROM (SELECT o_orderkey, o_totalprice AS a,
                              o_totalprice * 2 AS b
                       FROM orders WHERE o_orderkey < 50) t
        UNPIVOT (v FOR k IN (a, b))
    """)


@pytest.mark.parametrize("include", ["INCLUDE NULLS", ""])
def test_unpivot_null_semantics(engine, ddb, include):
    _cmp(engine, ddb, f"""
        SELECT k, count(*) AS n FROM
        (SELECT o_orderkey, o_totalprice AS a, CAST(NULL AS DOUBLE) AS b
         FROM orders WHERE o_orderkey < 50) t
        UNPIVOT {include} (v FOR k IN (a, b))
        GROUP BY k
    """)


def test_pivot_requires_literal_values(engine):
    with pytest.raises(InvalidQueryException):
        engine.query("""
            SELECT * FROM events
            PIVOT (sum(value) FOR event_type IN (user_id))
        """)


def test_pivot_rejects_unknown_aggregate(engine):
    with pytest.raises(InvalidQueryException):
        engine.query("""
            SELECT * FROM events
            PIVOT (median(value) FOR event_type IN ('click'))
        """)


def test_pivot_unpivot_stay_soft_keywords(engine):
    df = engine.query("SELECT n_name AS pivot, n_regionkey AS unpivot "
                      "FROM nation LIMIT 1")
    assert df.columns == ["pivot", "unpivot"]


def test_pivot_plans_partial_aggregation(engine):
    from tests.test_plan_quality import plan_of
    df = engine.query("""
        SELECT * FROM (SELECT user_id % 3 AS ub, event_type, value
                       FROM events)
        PIVOT (sum(value) FOR event_type IN ('click', 'view'))
    """)
    plan = plan_of(df, "simple")
    # Spark's pivot shape: partial_sum on (keys, pivot col) then
    # partial_pivotfirst on keys — two map-side-combined exchanges, and
    # with explicit values NO third job for value discovery
    assert plan.count("Exchange") == 2
    assert "partial_sum" in plan and "partial_pivotfirst" in plan
