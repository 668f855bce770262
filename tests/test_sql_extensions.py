"""SQL-surface extensions beyond the reference dialect: CTEs, multidimensional
grouping (ROLLUP/CUBE/GROUPING SETS), named windows, scalar subqueries.

The reference has none of these (SURVEY §2.4 'Not present: grouping sets /
cube / rollup', §2.10 'Not present: ... scalar subqueries, CTEs'; named
windows are a grammar stub, sql.lark:144). All checked against DuckDB, which
shares the syntax."""

from __future__ import annotations

import pytest

from sql_to_ibis_spark.errors import InvalidQueryException


class TestCte:
    def test_single_cte(self, oracle):
        oracle("""
            WITH big AS (SELECT o_custkey, o_totalprice FROM orders
                         WHERE o_totalprice > 400000)
            SELECT o_custkey, count(*) AS n FROM big GROUP BY o_custkey
        """)

    def test_chained_ctes(self, oracle):
        oracle("""
            WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 400000),
                 cnt AS (SELECT o_custkey, count(*) AS n FROM big GROUP BY o_custkey)
            SELECT n, count(*) AS n_customers FROM cnt GROUP BY n
        """)

    def test_cte_joined_with_table(self, oracle):
        oracle("""
            WITH nat AS (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1)
            SELECT nat.n_name, count(*) AS n FROM customer c
            JOIN nat ON c.c_nationkey = nat.n_nationkey GROUP BY nat.n_name
        """)

    def test_cte_used_twice(self, oracle):
        oracle("""
            WITH r AS (SELECT r_regionkey, r_name FROM region)
            SELECT a.r_name AS name1, b.r_name AS name2
            FROM r a JOIN r b ON a.r_regionkey = b.r_regionkey
        """)

    def test_cte_shadows_catalog_table(self, oracle):
        oracle("""
            WITH region AS (SELECT 1 AS x)
            SELECT x FROM region
        """)

    def test_with_recursive_rejected(self, engine):
        with pytest.raises(InvalidQueryException):
            engine.query("WITH RECURSIVE r AS (SELECT 1 AS x) SELECT * FROM r")


class TestMultidimensionalGrouping:
    def test_rollup(self, oracle):
        oracle("""
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   CAST(sum(CAST(l_quantity AS decimal(18,2))) AS double) AS s
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """)

    def test_cube(self, oracle):
        oracle("""
            SELECT l_returnflag, l_linestatus, count(*) AS n
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        """)

    def test_grouping_sets(self, oracle):
        oracle("""
            SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """)

    def test_grouping_indicator(self, oracle):
        oracle("""
            SELECT l_returnflag, grouping(l_returnflag) AS g, count(*) AS n
            FROM lineitem GROUP BY CUBE(l_returnflag)
        """)

    def test_rollup_expression_key_with_having(self, oracle):
        oracle("""
            SELECT year(o_orderdate) AS y, count(*) AS n
            FROM orders GROUP BY ROLLUP(year(o_orderdate))
            HAVING count(*) > 100
        """)


class TestNamedWindows:
    def test_named_window_shared(self, oracle):
        oracle("""
            SELECT l_orderkey, l_linenumber,
                   CAST(sum(CAST(l_quantity AS decimal(18,2))) OVER w AS double)
                     AS cum_qty,
                   rank() OVER w AS rk
            FROM lineitem WHERE l_orderkey < 100
            WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
        """)

    def test_unknown_named_window_raises(self, engine):
        with pytest.raises(InvalidQueryException):
            engine.query("SELECT rank() OVER nope FROM lineitem").collect()


class TestScalarSubqueries:
    def test_scalar_in_where(self, oracle):
        oracle("""
            SELECT count(*) AS n_above FROM orders
            WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        """)

    def test_scalar_in_select(self, oracle):
        oracle("""
            SELECT o_orderkey,
                   round(o_totalprice / (SELECT max(o_totalprice) FROM orders), 6)
                     AS price_frac
            FROM orders WHERE o_orderkey < 50
        """)

    def test_scalar_in_grouped_select(self, oracle):
        oracle("""
            SELECT l_returnflag,
                   round(avg(l_quantity) - (SELECT avg(l_quantity) FROM lineitem), 4)
                     AS delta
            FROM lineitem GROUP BY l_returnflag
        """)

    def test_scalar_from_cte(self, oracle):
        oracle("""
            WITH m AS (SELECT min(o_totalprice) AS lo FROM orders)
            SELECT count(*) AS n FROM orders
            WHERE o_totalprice < 2 * (SELECT lo FROM m)
        """)

    def test_empty_scalar_subquery_is_null(self, oracle):
        oracle("""
            SELECT count(*) AS n FROM orders
            WHERE o_totalprice > (SELECT o_totalprice FROM orders WHERE o_orderkey < 0)
        """)

    def test_multi_column_scalar_raises(self, engine):
        with pytest.raises(InvalidQueryException):
            engine.query(
                "SELECT (SELECT o_orderkey, o_custkey FROM orders) FROM orders")


class TestCorrelatedSubqueries:
    """Join-based decorrelation (no per-row execution): EXISTS/IN → semi
    join on extracted correlation predicates, aggregate scalar → groupBy
    rewrite + left join."""

    def test_correlated_exists(self, oracle):
        oracle("""
            SELECT o_orderpriority, count(*) AS n FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                          AND l.l_quantity > 49)
            GROUP BY o_orderpriority
        """)

    def test_correlated_not_exists(self, oracle):
        oracle("""
            SELECT count(*) AS n FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_orderkey = o.o_orderkey
                              AND l.l_returnflag = 'R')
        """)

    def test_correlated_exists_theta(self, oracle):
        # non-equi correlation predicate also decorrelates (theta semi join)
        oracle("""
            SELECT count(*) AS n FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                          AND l.l_extendedprice > o.o_totalprice / 2)
        """)

    def test_correlated_in(self, oracle):
        oracle("""
            SELECT count(*) AS n FROM orders o
            WHERE o.o_orderkey IN (SELECT l.l_orderkey FROM lineitem l
                                   WHERE l.l_orderkey = o.o_orderkey
                                   AND l.l_discount > 0.09)
        """)

    def test_correlated_scalar_avg(self, oracle):
        # TPC-H Q17 shape
        oracle("""
            SELECT round(CAST(sum(l_extendedprice) AS double) / 7.0, 2)
                     AS avg_yearly
            FROM lineitem l1
            WHERE l1.l_quantity <
                  (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
                   WHERE l2.l_orderkey = l1.l_orderkey)
        """)

    def test_correlated_scalar_count_empty_is_zero(self, oracle):
        oracle("""
            SELECT c_custkey,
                   (SELECT count(*) FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 500000)
                     AS n_big
            FROM customer c
        """)

    def test_correlated_scalar_in_select(self, oracle):
        oracle("""
            SELECT n_name,
                   (SELECT max(c_acctbal) FROM customer c
                    WHERE c.c_nationkey = n.n_nationkey) AS top_bal
            FROM nation n
        """)

    def test_correlated_not_in(self, oracle):
        # lowered to the NULL-guarded NOT EXISTS since r12 (was a raise)
        oracle("""
            SELECT count(*) AS n FROM orders o
            WHERE o.o_orderkey NOT IN
                  (SELECT l.l_orderkey FROM lineitem l
                   WHERE l.l_orderkey = o.o_orderkey)
        """)


def test_scalar_subquery_in_having(oracle):
    oracle("""
        SELECT l_returnflag, count(*) AS n FROM lineitem
        GROUP BY l_returnflag
        HAVING count(*) > (SELECT count(*) / 4 FROM lineitem)
    """)


class TestModernClauses:
    def test_group_by_all(self, oracle):
        oracle("""
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   CAST(sum(CAST(l_quantity AS decimal(18,2))) AS double) AS s
            FROM lineitem GROUP BY ALL
        """)

    def test_group_by_all_with_expression_key(self, oracle):
        oracle("""
            SELECT year(o_orderdate) AS y, count(*) AS n
            FROM orders GROUP BY ALL
        """)

    def test_qualify_top_n_per_group(self, oracle):
        oracle("""
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem
            QUALIFY row_number() OVER (PARTITION BY l_orderkey
                                       ORDER BY l_quantity DESC,
                                       l_linenumber) <= 2
        """)

    def test_qualify_with_where(self, oracle):
        oracle("""
            SELECT o_custkey, o_orderkey, o_totalprice
            FROM orders WHERE o_totalprice > 100000
            QUALIFY rank() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC) = 1
        """)

    def test_qualify_with_aggregation_raises(self, engine):
        with pytest.raises(InvalidQueryException):
            engine.query("""
                SELECT l_returnflag, count(*) AS n FROM lineitem
                GROUP BY l_returnflag
                QUALIFY row_number() OVER (ORDER BY count(*)) = 1
            """)


# ---- correlated scalar subqueries with NON-equality (range) correlation:
# magic-set decorrelation over distinct outer key tuples


def test_correlated_scalar_range_correlation(oracle):
    # avg over strictly-smaller orderkeys of the same custkey: mixed
    # equality + range correlation
    oracle("SELECT o_orderkey, "
           "(SELECT count(*) FROM orders o2 "
           " WHERE o2.o_custkey = o1.o_custkey "
           " AND o2.o_orderkey < o1.o_orderkey) AS n_before "
           "FROM orders o1 WHERE o_orderkey < 200")


def test_correlated_scalar_pure_range_correlation(oracle):
    oracle("SELECT n_nationkey, "
           "(SELECT count(*) FROM region r "
           " WHERE r.r_regionkey < n.n_regionkey) AS n_smaller "
           "FROM nation n")


def test_correlated_scalar_range_avg(oracle):
    oracle("SELECT o_orderkey, "
           "round((SELECT avg(o2.o_totalprice) FROM orders o2 "
           " WHERE o2.o_custkey = o1.o_custkey "
           " AND o2.o_totalprice > o1.o_totalprice), 4) AS avg_bigger "
           "FROM orders o1 WHERE o_orderkey < 500")


# ---- VALUES table constructors + derived-column alias lists (extension)


def test_values_relation(oracle):
    oracle("SELECT id, name FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) "
           "t(id, name) ORDER BY id", ordered=True)


def test_values_default_column_names(oracle):
    oracle("SELECT * FROM (VALUES (1, 'x'), (2, 'y')) t ORDER BY col0",
           ordered=True)


def test_values_join_with_table(oracle):
    oracle("SELECT n.n_name, v.label FROM nation n "
           "JOIN (VALUES (0, 'zero'), (1, 'one')) v(rk, label) "
           "ON n.n_regionkey = v.rk")


def test_values_expressions(oracle):
    oracle("SELECT a + b AS s FROM (VALUES (1, 2), (10, 20)) t(a, b)")


def test_derived_column_alias_list(oracle):
    oracle("SELECT k2, cnt FROM (SELECT l_returnflag, count(*) FROM lineitem "
           "GROUP BY l_returnflag) t(k2, cnt) WHERE cnt > 0")


def test_explain_statement(engine):
    row = engine.query(
        "EXPLAIN SELECT l_orderkey FROM lineitem WHERE l_quantity > 30"
    ).collect()[0]
    assert "Physical Plan" in row["plan"] or "Scan" in row["plan"]
    assert "PushedFilters" in row["plan"]


def test_explain_simple_mode(engine):
    row = engine.query("EXPLAIN SIMPLE SELECT count(*) AS n FROM nation") \
        .collect()[0]
    assert "HashAggregate" in row["plan"]


def test_explain_analyze_executes_and_reports(engine):
    row = engine.query(
        "EXPLAIN ANALYZE SELECT l_returnflag, count(*) AS n "
        "FROM lineitem GROUP BY l_returnflag"
    ).collect()[0]
    plan = row["plan"]
    assert "== Executed ==" in plan and "wall:" in plan
    # row count of the analyzed query itself (3 return flags)
    assert "rows: 3" in plan
    # the plan shown is the AQE-finalized one, not the static estimate
    assert "isFinalPlan=true" in plan


# ---- UNNEST lateral array expansion (extension)


def test_unnest_literal_array(oracle):
    oracle("SELECT x FROM UNNEST(array(1, 2, 3)) AS u(x)",
           "SELECT unnest([1, 2, 3]) AS x")


def test_unnest_lateral_over_table(oracle, spark, engine):
    # each embedding row fans out to its components
    df = engine.query(
        "SELECT vec_id, x FROM embeddings e, UNNEST(e.embedding) AS u(x) "
        "WHERE vec_id < 3")
    got = df.groupBy("vec_id").count().collect()
    dims = {r["vec_id"]: r["count"] for r in got}
    import duckdb  # direct check against duckdb's unnest

    con = duckdb.connect()
    exp = con.execute(
        "SELECT vec_id, count(*) FROM (SELECT vec_id, unnest(embedding) "
        "FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet') "
        "WHERE vec_id < 3) t GROUP BY vec_id").fetchall()
    assert dims == {k: v for k, v in exp}


def test_unnest_with_aggregate(oracle):
    oracle("SELECT vec_id, round(sum(x), 4) AS s "
           "FROM embeddings e, UNNEST(e.embedding) AS u(x) "
           "WHERE vec_id < 5 GROUP BY vec_id",
           "SELECT vec_id, round(sum(x), 4) AS s FROM ("
           "  SELECT vec_id, unnest(embedding) AS x FROM embeddings "
           "  WHERE vec_id < 5) t GROUP BY vec_id")


# ---- DISTINCT ON (r6; Postgres/DuckDB first-row-per-group) ----

def test_distinct_on_latest_per_key(engine, ddb):
    from tests.conftest import compare_frames
    sql = """
        SELECT DISTINCT ON (user_id) user_id, event_id, ts, value
        FROM events ORDER BY user_id, ts DESC
    """
    compare_frames(engine.query(sql).toPandas(), ddb.execute(sql).fetchdf())


def test_distinct_on_expression_and_alias_order(engine, ddb):
    from tests.conftest import compare_frames
    sql = """
        SELECT DISTINCT ON (user_id % 5) user_id % 5 AS bucket, event_id
        FROM events ORDER BY bucket, event_id
    """
    compare_frames(engine.query(sql).toPandas(), ddb.execute(sql).fetchdf())


def test_distinct_on_requires_order_by(engine):
    import pytest

    from sql_to_ibis_spark.errors import InvalidQueryException
    with pytest.raises(InvalidQueryException):
        engine.query("SELECT DISTINCT ON (user_id) user_id FROM events")


def test_distinct_on_single_shuffle_plan(engine):
    from tests.test_plan_quality import plan_of
    df = engine.query("""
        SELECT DISTINCT ON (user_id) user_id, event_id FROM events
        ORDER BY user_id, event_id
    """)
    plan = plan_of(df, "simple")
    # r15: uniform-direction residual ordering lowers to a min_by/max_by
    # hash aggregate (map-side partial agg ships ~|groups| rows per map
    # partition) + the final range sort — never a full-row window sort,
    # an aggregation-join, or a per-group collect
    assert plan.count("Exchange") == 2
    assert "Window" not in plan
    assert "min_by" in plan or "max_by" in plan
    assert "partial_min_by" in plan or "partial_max_by" in plan


def test_distinct_on_mixed_direction_falls_back_to_window(engine, ddb):
    from tests.conftest import compare_frames
    from tests.test_plan_quality import plan_of
    # ts DESC then event_id ASC cannot ride one struct comparison — the
    # window form must still serve mixed-direction residual orderings
    sql = """
        SELECT DISTINCT ON (user_id) user_id, event_id, ts FROM events
        ORDER BY user_id, ts DESC, event_id
    """
    df = engine.query(sql)
    assert "Window" in plan_of(df, "simple")
    compare_frames(df.toPandas(), ddb.execute(sql).fetchdf())


class TestQuantifiedComparisons:
    """x <op> ANY/ALL/SOME (subquery) — extension (absent from the
    reference grammar). Equality forms lower to IN/NOT IN; ordered forms
    lower to count/extremum/null-count aggregate scalar subqueries, so
    correlated bodies reuse the decorrelation machinery."""

    def test_gt_all_uncorrelated(self, oracle):
        oracle("""
            SELECT count(*) AS n FROM orders
            WHERE o_totalprice > ALL (SELECT o_totalprice FROM orders
                                      WHERE o_orderkey < 100)
        """)

    def test_gt_any_uncorrelated(self, oracle):
        oracle("""
            SELECT count(*) AS n FROM orders
            WHERE o_totalprice > ANY (SELECT o_totalprice FROM orders
                                      WHERE o_orderkey < 100)
        """)

    def test_some_is_any(self, oracle):
        oracle("""
            SELECT count(*) AS n FROM orders
            WHERE o_totalprice < SOME (SELECT avg(o_totalprice) FROM orders)
        """)

    def test_eq_any_is_in(self, oracle):
        oracle("""
            SELECT count(*) AS n FROM orders
            WHERE o_orderkey = ANY (SELECT o_orderkey FROM orders
                                    WHERE o_totalprice > 400000)
        """)

    def test_neq_all_is_not_in(self, oracle):
        oracle("""
            SELECT count(*) AS n FROM nation
            WHERE n_nationkey <> ALL (SELECT r_regionkey FROM region)
        """)

    def test_empty_set_semantics(self, oracle):
        # ALL over empty is TRUE for every row; ANY over empty is FALSE
        oracle("""
            SELECT count(*) AS n FROM orders
            WHERE o_totalprice > ALL (SELECT o_totalprice FROM orders
                                      WHERE o_orderkey < 0)
        """)
        oracle("""
            SELECT count(*) AS n FROM orders
            WHERE o_totalprice > ANY (SELECT o_totalprice FROM orders
                                      WHERE o_orderkey < 0)
        """)

    def test_null_element_semantics(self, oracle):
        # 5 > ALL {3, NULL} is NULL (not TRUE): the NULL element leaves the
        # quantifier undecided — rows with NULL predicate are filtered out
        oracle("""
            SELECT count(*) AS n FROM region
            WHERE r_regionkey + 10 > ALL
                  (SELECT v FROM (VALUES (3), (NULL)) t(v))
        """)
        oracle("""
            SELECT count(*) AS n FROM region
            WHERE r_regionkey - 10 > ANY
                  (SELECT v FROM (VALUES (3), (NULL)) t(v))
        """)

    def test_eq_all(self, oracle):
        oracle("""
            SELECT count(*) AS n FROM region
            WHERE r_regionkey = ALL (SELECT min(r_regionkey) FROM region)
        """)

    def test_correlated_all_window_path(self, oracle):
        # same-table correlated ALL → the aggregates take the window path
        oracle("""
            SELECT count(*) AS n FROM lineitem l1
            WHERE l1.l_quantity >= ALL (SELECT l2.l_quantity FROM lineitem l2
                                        WHERE l2.l_orderkey = l1.l_orderkey)
        """)

    def test_correlated_any_different_tables(self, oracle):
        oracle("""
            SELECT count(*) AS n FROM orders o
            WHERE o.o_totalprice > ALL (SELECT l.l_extendedprice
                                        FROM lineitem l
                                        WHERE l.l_orderkey = o.o_orderkey)
        """)

    def test_grouped_subquery_wraps(self, oracle):
        # GROUP BY/HAVING bodies wrap as a derived table
        oracle("""
            SELECT count(*) AS n FROM orders
            WHERE o_totalprice > ANY (SELECT o_totalprice FROM orders
                                      GROUP BY o_totalprice
                                      HAVING count(*) > 1)
        """)

    def test_any_without_parens_is_column_error(self, engine):
        from sql_to_ibis_spark.errors import ColumnNotFoundError
        import pytest as _pytest
        # 'any' not followed by ( parses as a column reference
        with _pytest.raises(ColumnNotFoundError):
            engine.query("SELECT 1 AS x FROM region WHERE r_regionkey > any")


class TestSubqueryPredicatesInExpressions:
    """EXISTS / IN anywhere an expression is allowed — SELECT list, OR
    branches, CASE, HAVING — lowered to count-aggregate scalar subqueries
    (previously: 'only supported as top-level AND-conjuncts of WHERE').
    Top-level WHERE conjuncts keep the semi/anti-join path."""

    def test_exists_in_select_list_correlated(self, oracle):
        oracle("""
            SELECT n_name,
                   EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_nationkey = n.n_nationkey
                           AND c.c_acctbal > 9000) AS has_rich
            FROM nation n ORDER BY n_name
        """, ordered=True)

    def test_not_exists_in_select_list(self, oracle):
        oracle("""
            SELECT r_name,
                   NOT EXISTS (SELECT 1 FROM nation
                               WHERE n_regionkey = r.r_regionkey)
                     AS empty_region
            FROM region r ORDER BY r_name
        """, ordered=True)

    def test_exists_inside_or(self, oracle):
        # OR-nested EXISTS can't be a semi join; the count lowering makes
        # it a plain boolean expression
        oracle("""
            SELECT count(*) AS n FROM orders o
            WHERE o.o_totalprice > 450000
               OR EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                          AND l.l_quantity > 49)
        """)

    def test_in_select_list_three_valued(self, oracle):
        # NULL element set: non-matching operands read NULL, matches TRUE
        oracle("""
            SELECT r_regionkey,
                   (r_regionkey IN (SELECT v FROM (VALUES (1), (NULL)) t(v)))
                     AS hit,
                   (r_regionkey NOT IN
                    (SELECT v FROM (VALUES (1), (NULL)) t(v))) AS miss
            FROM region ORDER BY r_regionkey
        """, ordered=True)

    def test_in_inside_case(self, oracle):
        oracle("""
            SELECT count(*) AS n FROM orders
            WHERE CASE WHEN o_custkey IN (SELECT c_custkey FROM customer
                                          WHERE c_nationkey = 1)
                       THEN o_totalprice > 1000 ELSE false END
        """)

    def test_exists_in_having(self, oracle):
        oracle("""
            SELECT o_orderpriority, count(*) AS n FROM orders
            GROUP BY o_orderpriority
            HAVING count(*) > 100
               AND EXISTS (SELECT 1 FROM region WHERE r_name = 'ASIA')
        """)

    def test_where_conjunct_still_semi_join(self, engine):
        # top-level conjunct EXISTS must still plan the semi join, not the
        # scalar-count lowering
        from tests.test_plan_quality import plan_of
        df = engine.query("""
            SELECT o_orderkey FROM orders o WHERE EXISTS
            (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        """)
        assert "LeftSemi" in plan_of(df, "simple")


def test_eq_any_in_select_list(oracle, engine):
    # "= ANY" in expression position reaches the count lowering (two
    # lowering steps); as a top-level WHERE conjunct it stays a semi join
    oracle("""
        SELECT n_name,
               n_nationkey = ANY (SELECT c_nationkey FROM customer
                                  WHERE c_acctbal > 9900) AS has_rich
        FROM nation ORDER BY n_name
    """, ordered=True)
    from tests.test_plan_quality import plan_of
    df = engine.query(
        "SELECT count(*) AS n FROM orders WHERE o_custkey = ANY "
        "(SELECT c_custkey FROM customer WHERE c_nationkey = 1)")
    assert "LeftSemi" in plan_of(df, "simple")
