"""Total-over-groups rewrite (TPC-H q11 shape): an uncorrelated scalar
subquery in HAVING / select position that aggregates the SAME FROM+WHERE
as the outer grouped query compiles to a window total over the outer's own
grouped frame — one execution of the join/scan instead of two.

Every rewrite test is a DuckDB oracle comparison (values must be identical
with and without the rewrite) plus a plan assertion (the scan count halves).
"""

from __future__ import annotations

import pytest

from tests.conftest import compare_frames
from tests.test_plan_quality import plan_of

Q11_STYLE = """
    SELECT l.l_partkey,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
               AS decimal(18,4))) AS double) AS part_value
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE l.l_quantity > 10
    GROUP BY l.l_partkey
    HAVING sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        AS decimal(18,4))) > (
      SELECT sum(CAST(l2.l_extendedprice * (1 - l2.l_discount)
          AS decimal(18,4))) * CAST(0.001 AS double)
      FROM lineitem l2
      JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
      WHERE l2.l_quantity > 10)
    ORDER BY part_value DESC, l_partkey LIMIT 50
"""


def scan_count(engine, sql: str) -> int:
    df = engine.query(sql)
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Scan parquet")


Q11_STRING_KEY = (Q11_STYLE.replace("l.l_partkey", "l.l_returnflag")
                  .replace("l_partkey", "l_returnflag"))


def test_q11_shape_with_id_key_not_rewritten(engine, oracle):
    # cardinality gate (measured r7): grouped by l_partkey — a numeric ID
    # key, ~2M groups at sf10 — the unpartitioned merge window costs more
    # than the second scan it saves (3.49 s vs 2.40 s). Rewrite stays off;
    # the join tree is scanned twice (4 scans) and values stay correct.
    assert scan_count(engine, Q11_STYLE) == 4
    oracle(Q11_STYLE)


def test_q11_shape_string_key_rewrites_to_single_pass(engine, oracle):
    # same shape grouped by an enum-typed key → rewrite fires: the join
    # tree is scanned once (2 relations) instead of twice (4)
    assert scan_count(engine, Q11_STRING_KEY) <= 2
    oracle(Q11_STRING_KEY)


def test_rewrite_off_matches(engine, monkeypatch):
    before = engine.query(Q11_STRING_KEY).toPandas()
    monkeypatch.setenv("SPARK_GRAFT_NO_GROUP_TOTAL_REWRITE", "1")
    assert scan_count(engine, Q11_STRING_KEY) == 4
    after = engine.query(Q11_STRING_KEY).toPandas()
    compare_frames(before, after, ordered=True)


def test_share_of_total_in_select_item(engine, oracle):
    sql = """
        SELECT l_returnflag,
               round(CAST(sum(l_extendedprice) AS double)
                     / (SELECT sum(l_extendedprice) FROM lineitem), 6)
                   AS revenue_share
        FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag
    """
    assert scan_count(engine, sql) == 1
    oracle(sql)


def test_count_star_total(engine, oracle):
    sql = """
        SELECT l_linestatus, count(*) AS n
        FROM lineitem
        WHERE l_quantity > 25
        GROUP BY l_linestatus
        HAVING count(*) * 10 > (SELECT count(*) FROM lineitem
                                WHERE l_quantity > 25)
        ORDER BY l_linestatus
    """
    assert scan_count(engine, sql) == 1
    oracle(sql)


def test_different_where_not_rewritten(engine, oracle):
    # inner WHERE differs → totals over different rows; must NOT rewrite
    sql = """
        SELECT l_linestatus, count(*) AS n
        FROM lineitem
        WHERE l_quantity > 25
        GROUP BY l_linestatus
        HAVING count(*) * 3 > (SELECT count(*) FROM lineitem
                               WHERE l_quantity > 40)
        ORDER BY l_linestatus
    """
    assert scan_count(engine, sql) == 2
    oracle(sql)


def test_min_max_total(engine, oracle):
    sql = """
        SELECT l_returnflag, max(l_extendedprice) AS grp_max
        FROM lineitem
        GROUP BY l_returnflag
        HAVING max(l_extendedprice) = (SELECT max(l_extendedprice)
                                       FROM lineitem)
        ORDER BY l_returnflag
    """
    assert scan_count(engine, sql) == 1
    oracle(sql)


def test_rollup_not_rewritten(engine, oracle):
    # rollup groups overlap — re-aggregating partials would double count
    sql = """
        SELECT l_returnflag, count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag)
        HAVING count(*) > (SELECT count(*) FROM lineitem) / 10
        ORDER BY l_returnflag
    """
    assert scan_count(engine, sql) == 2
    oracle("""
        SELECT l_returnflag, count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag)
        HAVING count(*) > (SELECT count(*) FROM lineitem) / 10
        ORDER BY l_returnflag
    """)


def test_avg_not_rewritten_but_correct(oracle):
    # avg isn't decomposable by this rewrite — falls back, stays correct
    oracle("""
        SELECT l_returnflag, round(avg(l_quantity), 4) AS aq
        FROM lineitem
        GROUP BY l_returnflag
        HAVING avg(l_quantity) > (SELECT avg(l_quantity) FROM lineitem) - 5
        ORDER BY l_returnflag
    """)


def test_subquery_in_where_not_total_rewritten(oracle):
    # WHERE is pre-aggregation — the rewrite must not fire there
    oracle("""
        SELECT l_returnflag, count(*) AS n
        FROM lineitem
        WHERE l_extendedprice > (SELECT avg(l_extendedprice) FROM lineitem)
        GROUP BY l_returnflag ORDER BY l_returnflag
    """)
