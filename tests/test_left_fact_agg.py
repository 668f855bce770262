"""LEFT-join fact aggregation pushdown (q13 shape): pre-aggregate the
nullable-side fact by its join key, LEFT-join the partials, merge in the
outer aggregate. COUNT over the fact maps to coalesce(sum(partial), 0)
— an unmatched preserved row contributes one NULL partial exactly as
the stock plan contributes one NULL-extended row.

SPARK_GRAFT_LEFT_FACT_AGG=1 forces, =0 disables; auto requires footer
rows >= 200k AND rows/NDV(key) >= 32 (measured: ratio-10 q13 loses,
ratio-600 supplier-lineitem wins 2.8 -> 1.0 s at sf10).
"""

from __future__ import annotations

import pytest

from tests.conftest import compare_frames

Q13_SHAPE = """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def _n_aggregates(df) -> int:
    return df._jdf.queryExecution().optimizedPlan().toString().count(
        "Aggregate ")


def test_q13_shape_forced_matches_oracle(engine, ddb, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LEFT_FACT_AGG", "0")
    stock = engine.query(Q13_SHAPE)
    monkeypatch.setenv("SPARK_GRAFT_LEFT_FACT_AGG", "1")
    pushed = engine.query(Q13_SHAPE)
    assert _n_aggregates(pushed) == _n_aggregates(stock) + 1
    compare_frames(pushed.toPandas(), stock.toPandas(), ordered=True)
    oracle = ddb.execute(Q13_SHAPE).fetchdf()
    compare_frames(pushed.toPandas(), oracle, ordered=True)


def test_mixed_aggs_and_dim_on_conjunct(engine, ddb, monkeypatch):
    # sum/min/max merge alongside count; a dim-only ON conjunct stays in
    # the rewritten join condition (it decides matching per dim row)
    sql = """
        SELECT n.n_name,
          count(o.o_orderkey) AS n_orders,
          CAST(sum(o.o_totalprice) AS double) AS total,
          CAST(max(o.o_totalprice) AS double) AS biggest
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          AND n.n_name <> 'NATION_3'
        GROUP BY n.n_name ORDER BY n.n_name
    """
    monkeypatch.setenv("SPARK_GRAFT_LEFT_FACT_AGG", "1")
    pushed = engine.query(sql)
    monkeypatch.setenv("SPARK_GRAFT_LEFT_FACT_AGG", "0")
    stock = engine.query(sql).toPandas()
    compare_frames(pushed.toPandas(), stock, ordered=True)
    oracle = ddb.execute(sql).fetchdf()
    compare_frames(pushed.toPandas(), oracle, ordered=True)


def test_count_star_bails(engine, monkeypatch):
    # COUNT(*) counts the NULL-extended preserved row — must not push
    sql = """
        SELECT c.c_mktsegment, count(*) AS n
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """
    monkeypatch.setenv("SPARK_GRAFT_LEFT_FACT_AGG", "1")
    pushed = engine.query(sql)
    monkeypatch.setenv("SPARK_GRAFT_LEFT_FACT_AGG", "0")
    stock = engine.query(sql)
    assert _n_aggregates(pushed) == _n_aggregates(stock)  # bailed
    compare_frames(pushed.toPandas(), stock.toPandas(), ordered=True)


def test_fact_ref_outside_agg_bails(engine, monkeypatch):
    sql = """
        SELECT c.c_mktsegment, o.o_orderpriority, count(o.o_orderkey) AS n
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment, o.o_orderpriority
        ORDER BY c.c_mktsegment, o.o_orderpriority
    """
    monkeypatch.setenv("SPARK_GRAFT_LEFT_FACT_AGG", "1")
    pushed = engine.query(sql)
    monkeypatch.setenv("SPARK_GRAFT_LEFT_FACT_AGG", "0")
    stock = engine.query(sql)
    assert _n_aggregates(pushed) == _n_aggregates(stock)
    compare_frames(pushed.toPandas(), stock.toPandas(), ordered=True)


def test_where_on_fact_bails(engine, monkeypatch):
    # WHERE over the nullable side filters NULL-extended rows — the
    # pushed aggregate cannot reproduce that; must stay stock
    sql = """
        SELECT c.c_mktsegment, count(o.o_orderkey) AS n
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE o.o_totalprice > 1000 OR o.o_totalprice IS NULL
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """
    monkeypatch.setenv("SPARK_GRAFT_LEFT_FACT_AGG", "1")
    pushed = engine.query(sql)
    monkeypatch.setenv("SPARK_GRAFT_LEFT_FACT_AGG", "0")
    stock = engine.query(sql)
    assert _n_aggregates(pushed) == _n_aggregates(stock)
    compare_frames(pushed.toPandas(), stock.toPandas(), ordered=True)


def test_customers_with_zero_orders_counted(engine, ddb, monkeypatch):
    # the semantic heart: preserved rows with no match must count 0,
    # not disappear
    sql = """
        SELECT c.c_custkey, count(o.o_orderkey) AS n
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey ORDER BY n ASC, c.c_custkey LIMIT 30
    """
    monkeypatch.setenv("SPARK_GRAFT_LEFT_FACT_AGG", "1")
    pushed = engine.query(sql)
    oracle = ddb.execute(sql).fetchdf()
    compare_frames(pushed.toPandas(), oracle, ordered=True)


def test_auto_gate_requires_reduction(engine, monkeypatch):
    # with stats (sf0.01: 15k orders < 200k row floor) the auto path
    # must not fire regardless of ratio
    monkeypatch.delenv("SPARK_GRAFT_LEFT_FACT_AGG", raising=False)
    sql = """
        SELECT c.c_mktsegment, count(o.o_orderkey) AS n
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """
    df = engine.query(sql)
    monkeypatch.setenv("SPARK_GRAFT_LEFT_FACT_AGG", "0")
    stock = engine.query(sql)
    assert _n_aggregates(df) == _n_aggregates(stock)
