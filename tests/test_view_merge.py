"""Derived-table (view) merging: a pure row-wise projection in FROM
inlines into the outer query, so AST-level rewrites (eager aggregation,
stats-broadcast sizing) see the real join tree instead of an opaque
subquery. Catalyst collapses projections on its own — these tests pin
the COMPILE-TIME effect: with merging off, the q7/q8 derived table
blocks the eager-aggregation pushdown even when forced.

SPARK_GRAFT_VIEW_MERGE=0 disables.
"""

from __future__ import annotations

import pytest

from tests.conftest import compare_frames

Q7_STYLE = """
    SELECT supp_nation, cust_nation, l_year,
      CAST(sum(CAST(volume AS decimal(18,4))) AS double) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE n1.n_name <> n2.n_name) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


def _n_aggregates(df) -> int:
    return df._jdf.queryExecution().optimizedPlan().toString().count(
        "Aggregate ")


def test_merge_unblocks_eager_aggregation(engine, ddb, monkeypatch):
    # a deferrable dim behind a derived-table fence: merging lets the
    # forced eager-aggregation pushdown fire (2 aggregates); the fence
    # blocks it (1)
    sql = """
        SELECT nation, CAST(sum(bal) AS double) AS total FROM (
          SELECT n.n_name AS nation, c.c_acctbal AS bal
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        ) t GROUP BY nation ORDER BY nation
    """
    monkeypatch.setenv("SPARK_GRAFT_EAGER_AGG", "1")
    monkeypatch.setenv("SPARK_GRAFT_VIEW_MERGE", "0")
    fenced = engine.query(sql)
    assert _n_aggregates(fenced) == 1  # derived table blocks the pushdown
    monkeypatch.delenv("SPARK_GRAFT_VIEW_MERGE")
    merged = engine.query(sql)
    assert _n_aggregates(merged) == 2  # merged → pushdown fires
    compare_frames(merged.toPandas(), fenced.toPandas(), ordered=True)
    oracle = ddb.execute(sql).fetchdf()
    compare_frames(merged.toPandas(), oracle, ordered=True)


def test_merge_q7_shape_oracle(engine, ddb):
    # the q7 family: merge is correctness-neutral (here every table ends
    # up retained, so the pushdown stays off — the merge still lets the
    # broadcast planner see the join tree)
    got = engine.query(Q7_STYLE).toPandas()
    oracle = ddb.execute(Q7_STYLE).fetchdf()
    compare_frames(got, oracle, ordered=True)


def test_merge_order_by_output_alias(engine, ddb):
    # ORDER BY names the OUTER output alias, which shadows an inner
    # output — must resolve against the projection, not the merged FROM
    sql = """
        SELECT nation, count(*) AS cnt FROM (
          SELECT n.n_name AS nation, c.c_custkey
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        ) t GROUP BY nation ORDER BY nation
    """
    got = engine.query(sql).toPandas()
    oracle = ddb.execute(sql).fetchdf()
    compare_frames(got, oracle, ordered=True)


def test_merge_nested_two_levels(engine, ddb):
    sql = """
        SELECT seg, CAST(sum(bal) AS double) AS total FROM (
          SELECT seg, bal FROM (
            SELECT c_mktsegment AS seg, c_acctbal AS bal FROM customer
          ) inner1 WHERE bal > 0
        ) outer1 GROUP BY seg ORDER BY seg
    """
    got = engine.query(sql).toPandas()
    oracle = ddb.execute(sql).fetchdf()
    compare_frames(got, oracle, ordered=True)


def test_merge_derived_column_list(engine, ddb):
    sql = """
        SELECT a, CAST(sum(b) AS double) AS s FROM (
          SELECT c_mktsegment, c_acctbal FROM customer
        ) t(a, b) GROUP BY a ORDER BY a
    """
    got = engine.query(sql).toPandas()
    oracle = ddb.execute(sql).fetchdf()
    compare_frames(got, oracle, ordered=True)


@pytest.mark.parametrize("inner", [
    "SELECT c_mktsegment AS seg FROM customer LIMIT 10",
    "SELECT DISTINCT c_mktsegment AS seg FROM customer",
    "SELECT c_mktsegment AS seg, count(*) AS n FROM customer "
    "GROUP BY c_mktsegment",
])
def test_merge_bails_on_row_changing_inner(engine, ddb, inner):
    # LIMIT / DISTINCT / aggregation change the row set — merging them
    # would be wrong; the fence stays and results match the oracle
    sql = f"SELECT count(*) AS n FROM ({inner}) t"
    got = engine.query(sql).toPandas()
    oracle = ddb.execute(sql).fetchdf()
    compare_frames(got, oracle, ordered=True)


def test_merge_bails_on_window_inner(engine, ddb):
    sql = """
        SELECT count(*) AS n FROM (
          SELECT c_custkey,
                 row_number() OVER (ORDER BY c_acctbal DESC) AS rn
          FROM customer
        ) t WHERE rn <= 7
    """
    got = engine.query(sql).toPandas()
    oracle = ddb.execute(sql).fetchdf()
    compare_frames(got, oracle, ordered=True)


def test_merge_where_conjoins(engine, ddb):
    # inner AND outer filters both survive the merge
    sql = """
        SELECT CAST(sum(bal) AS double) AS s FROM (
          SELECT c_acctbal AS bal, c_mktsegment AS seg FROM customer
          WHERE c_acctbal > 100
        ) t WHERE seg = 'BUILDING'
    """
    got = engine.query(sql).toPandas()
    oracle = ddb.execute(sql).fetchdf()
    compare_frames(got, oracle, ordered=True)
