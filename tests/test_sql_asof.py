"""ASOF JOIN SQL surface (DuckDB-compatible syntax): differential tests
against DuckDB's NATIVE ASOF JOIN on the same parquet, error contracts, and
the plan-shape guarantee (union+window, never join-all-candidates)."""

from __future__ import annotations

import pytest

from sql_to_ibis_spark.errors import InvalidQueryException
from tests.conftest import compare_frames
from tests.test_plan_quality import plan_of

BACKWARD = """
    SELECT p.event_id AS pid, p.ts AS pts, v.event_id AS view_id,
           v.value AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF {kind} JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts {op} v.ts
"""


@pytest.mark.parametrize("kind,op", [
    ("", ">="),          # inner backward inclusive (DuckDB default shape)
    ("LEFT", ">="),      # left: unmatched purchases kept with nulls
    ("", ">"),           # strict backward
    ("", "<="),          # forward inclusive
    ("", "<"),           # strict forward
])
def test_asof_sql_matches_duckdb_native(engine, ddb, kind, op):
    sql = BACKWARD.format(kind=kind, op=op)
    compare_frames(engine.query(sql).toPandas(), ddb.execute(sql).fetchdf())


def test_asof_sql_mirrored_operands(engine, ddb):
    # v.ts <= p.ts is the same backward join written right-to-left
    sql = """
        SELECT p.event_id AS pid, v.event_id AS view_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON v.user_id = p.user_id AND v.ts <= p.ts
    """
    compare_frames(engine.query(sql).toPandas(), ddb.execute(sql).fetchdf())


def test_asof_sql_expression_inequality(engine, ddb):
    sql = """
        SELECT p.event_id AS pid, v.event_id AS view_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts + INTERVAL 5 MINUTE
    """
    compare_frames(engine.query(sql).toPandas(), ddb.execute(sql).fetchdf())


def test_asof_sql_aggregation_on_top(engine, ddb):
    sql = """
        SELECT p.user_id AS uid, count(*) AS n
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
        GROUP BY p.user_id
    """
    compare_frames(engine.query(sql).toPandas(), ddb.execute(sql).fetchdf())


def test_asof_sql_star_expansion(engine):
    df = engine.query("""
        SELECT * FROM (SELECT event_id, ts, user_id FROM events
                       WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT event_id AS vid, ts AS vts, user_id AS vuid
                   FROM events WHERE event_type = 'view') v
          ON p.user_id = v.vuid AND p.ts >= v.vts
    """)
    assert df.columns == ["event_id", "ts", "user_id", "vid", "vts", "vuid"]


def test_asof_sql_single_shuffle_no_candidate_join(engine):
    df = engine.query(BACKWARD.format(kind="", op=">="))
    plan = plan_of(df, "simple")
    # union+window: ONE exchange on the key; a naive lowering would show a
    # join (2+ exchanges / nested loop) producing all candidates
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_asof_sql_requires_inequality(engine):
    with pytest.raises(InvalidQueryException):
        engine.query("""
            SELECT 1 AS x FROM events e ASOF JOIN orders o
              ON e.user_id = o.o_custkey
        """)


def test_asof_sql_rejects_two_inequalities(engine):
    with pytest.raises(InvalidQueryException):
        engine.query("""
            SELECT 1 AS x FROM events e ASOF JOIN orders o
              ON e.ts >= o.o_orderdate AND e.value >= o.o_totalprice
        """)


def test_asof_sql_rejects_mixed_side_operand(engine):
    with pytest.raises(InvalidQueryException):
        engine.query("""
            SELECT 1 AS x FROM events e ASOF JOIN orders o
              ON e.user_id + o.o_custkey = 0 AND e.ts >= o.o_orderdate
        """)


def test_asof_is_not_reserved(engine):
    # 'asof' stays usable as an alias/identifier
    df = engine.query("SELECT n_name AS asof FROM nation LIMIT 1")
    assert df.columns == ["asof"]


def test_asof_followed_by_regular_join(engine, ddb):
    # the remapped post-ASOF scope must keep feeding later joins
    sql = """
        SELECT p.event_id AS pid, v.event_id AS view_id,
               c.c_name AS customer
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
        JOIN customer c ON p.user_id = c.c_custkey
    """
    compare_frames(engine.query(sql).toPandas(), ddb.execute(sql).fetchdf())


def test_join_followed_by_asof(engine, ddb):
    # multi-relation LEFT side of the ASOF (two tables already in scope)
    sql = """
        SELECT p.event_id AS pid, c.c_name AS customer,
               v.event_id AS view_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN customer c ON p.user_id = c.c_custkey
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
    """
    compare_frames(engine.query(sql).toPandas(), ddb.execute(sql).fetchdf())
