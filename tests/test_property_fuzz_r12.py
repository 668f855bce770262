"""Property-based differential testing over the r12 rewrite surface:
derived-table (view) merging, eager-aggregation CASE decomposition and
IN-keyset folding, and the LEFT-join fact aggregation pushdown — all
randomized against DuckDB with the rewrites FORCED on, so every
generated case exercises the rewritten plan, not the gated-off stock
path. DuckDB runs the identical statement (shared dialect)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import compare_frames

# the forced_rewrites fixture only sets env vars that hold for every
# generated example — not resetting it between examples is the point
FUZZ = settings(max_examples=25, deadline=None,
                suppress_health_check=[
                    HealthCheck.too_slow,
                    HealthCheck.function_scoped_fixture])

SEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD",
            "FURNITURE"]
FLAGS = ["A", "N", "R"]
AGG = {"sum": "sum", "count": "count", "min": "min", "max": "max"}


@pytest.fixture()
def forced_rewrites(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_EAGER_AGG", "1")
    monkeypatch.setenv("SPARK_GRAFT_LEFT_FACT_AGG", "1")


# ------------------------------------------------------------ view merge

@given(
    mod=st.integers(min_value=2, max_value=9),
    lo=st.integers(min_value=0, max_value=5000),
    seg=st.sampled_from(SEGMENTS),
    dropcol=st.booleans(),
)
@FUZZ
def test_random_view_merge_matches_duckdb(engine, ddb, mod, lo, seg,
                                          dropcol):
    # random projection exprs, inner + outer WHERE, ORDER BY an output
    # alias that shadows an inner output name
    extra = "" if dropcol else ", c_custkey % 7 AS bucket"
    group2 = "" if dropcol else ", bucket"
    sql = f"""
        SELECT seg, count(*) AS n,
               CAST(sum(balx) AS double) AS total{group2.replace('bucket',
                    'bucket')}
        FROM (
          SELECT c_mktsegment AS seg, c_acctbal * 2 AS balx,
                 c_custkey % {mod} AS keymod{extra}
          FROM customer WHERE c_acctbal > {lo}
        ) t
        WHERE keymod <> 1 {"" if dropcol else "AND bucket >= 0"}
        GROUP BY seg{group2} ORDER BY seg{group2}
    """
    actual = engine.query(sql).toPandas()
    expected = ddb.execute(sql).fetchdf()
    compare_frames(actual, expected, ordered=True)


@given(
    mod=st.integers(min_value=2, max_value=6),
    seg=st.sampled_from(SEGMENTS),
)
@FUZZ
def test_random_nested_view_merge_matches_duckdb(engine, ddb, mod, seg):
    sql = f"""
        SELECT k, CAST(sum(b) AS double) AS s FROM (
          SELECT k, b FROM (
            SELECT c_custkey % {mod} AS k, c_acctbal AS b,
                   c_mktsegment AS m
            FROM customer
          ) i1 WHERE m = '{seg}'
        ) i2 GROUP BY k ORDER BY k
    """
    actual = engine.query(sql).toPandas()
    expected = ddb.execute(sql).fetchdf()
    compare_frames(actual, expected, ordered=True)


# --------------------------------------- eager agg: CASE decomposition

@given(
    seg=st.sampled_from(SEGMENTS),
    fn=st.sampled_from(["sum", "min", "max"]),
    use_else=st.booleans(),
    flag=st.sampled_from(FLAGS),
)
@FUZZ
def test_random_case_decompose_matches_duckdb(engine, ddb, forced_rewrites,
                                              seg, fn, use_else, flag):
    # dim-predicated CASE over a fact expression; ELSE present/absent
    # (sum's neutral literal is 0, min/max tolerate any literal)
    else_sql = (" ELSE 0" if fn == "sum" else " ELSE 5") if use_else else ""
    sql = f"""
        SELECT n.n_name,
          CAST({fn}(CASE WHEN c.c_mktsegment = '{seg}'
               THEN l.l_quantity + 1{else_sql} END) AS double) AS v,
          count(l.l_linenumber) AS cnt
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = '{flag}'
        GROUP BY n.n_name ORDER BY n.n_name
    """
    actual = engine.query(sql).toPandas()
    expected = ddb.execute(sql).fetchdf()
    compare_frames(actual, expected, ordered=True)


@given(
    seg=st.sampled_from(SEGMENTS),
    threshold=st.integers(min_value=0, max_value=40),
)
@FUZZ
def test_random_count_case_no_else_matches_duckdb(engine, ddb,
                                                  forced_rewrites, seg,
                                                  threshold):
    sql = f"""
        SELECT n.n_name,
          count(CASE WHEN c.c_mktsegment = '{seg}'
                THEN l.l_linenumber END) AS seg_lines,
          CAST(sum(CASE WHEN c.c_mktsegment = '{seg}'
               THEN CAST(l.l_quantity AS decimal(18,2)) END)
               AS double) AS seg_qty
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_quantity > {threshold}
        GROUP BY n.n_name ORDER BY n.n_name
    """
    actual = engine.query(sql).toPandas()
    expected = ddb.execute(sql).fetchdf()
    compare_frames(actual, expected, ordered=True)


# ----------------------------------------------- eager agg: IN fold

@given(
    qty=st.integers(min_value=50, max_value=260),
    fn=st.sampled_from(["sum(l_quantity)", "count(*)",
                        "max(l_quantity)"]),
    operand=st.sampled_from(["o.o_orderkey", "l.l_orderkey"]),
)
@FUZZ
def test_random_in_fold_matches_duckdb(engine, ddb, forced_rewrites, qty,
                                       fn, operand):
    cmp_ = ">" if "count" not in fn else ">= 4 AND count(*) <"
    having = f"{fn} {cmp_} {qty}" if "count" not in fn \
        else f"count(*) >= 4 AND count(*) < {max(qty // 30, 5)}"
    sql = f"""
        SELECT c_name, o.o_orderkey, o_totalprice,
          CAST(sum(CAST(l_quantity AS decimal(18,2))) AS double) AS tq
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE {operand} IN (SELECT l_orderkey FROM lineitem
                            GROUP BY l_orderkey HAVING {having})
        GROUP BY c_name, o.o_orderkey, o_totalprice
        ORDER BY o_totalprice DESC, o.o_orderkey LIMIT 50
    """
    actual = engine.query(sql).toPandas()
    expected = ddb.execute(sql).fetchdf()
    compare_frames(actual, expected, ordered=True)


# ------------------------------------------- LEFT-join fact pushdown

@given(
    prio=st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
    aggs=st.sampled_from([
        "count(o.o_orderkey) AS a",
        "count(o.o_orderkey) AS a, CAST(sum(o.o_totalprice) AS double)"
        " AS b",
        "CAST(min(o.o_totalprice) AS double) AS a,"
        " CAST(max(o.o_totalprice) AS double) AS b",
    ]),
    dim_cond=st.booleans(),
    grain=st.sampled_from(["c.c_custkey", "c.c_mktsegment"]),
)
@FUZZ
def test_random_left_fact_agg_matches_duckdb(engine, ddb, forced_rewrites,
                                             prio, aggs, dim_cond, grain):
    dc = " AND c.c_acctbal > 0" if dim_cond else ""
    sql = f"""
        SELECT {grain} AS g, {aggs}
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          AND o.o_orderpriority <> '{prio}'{dc}
        GROUP BY {grain} ORDER BY g LIMIT 100
    """
    actual = engine.query(sql).toPandas()
    expected = ddb.execute(sql).fetchdf()
    compare_frames(actual, expected, ordered=True)


@given(
    seg=st.sampled_from(SEGMENTS),
    c=st.integers(min_value=1, max_value=9),
    flag=st.sampled_from(FLAGS),
)
@FUZZ
def test_random_countif_literal_scaling_matches_duckdb(engine, ddb,
                                                       forced_rewrites,
                                                       seg, c, flag):
    # SUM(CASE dim-pred THEN c ELSE 0) and COUNT of a non-NULL literal:
    # the literal branches scale a COUNT(*) partial
    sql = f"""
        SELECT l.l_returnflag,
          CAST(sum(CASE WHEN c.c_mktsegment = '{seg}'
               THEN {c} ELSE 0 END) AS BIGINT) AS seg_weight,
          count(CASE WHEN c.c_mktsegment <> '{seg}'
                THEN 'x' END) AS other_rows
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE l.l_returnflag <> '{flag}'
        GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """
    actual = engine.query(sql).toPandas()
    expected = ddb.execute(sql).fetchdf()
    compare_frames(actual, expected, ordered=True)
