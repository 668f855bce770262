"""Joins: all kinds, multi-way, theta, comma-FROM, duplicate-column renaming,
IN-subquery semi-join."""


def test_inner_join(oracle):
    oracle("SELECT c.c_name, n.n_name FROM customer c "
           "JOIN nation n ON c.c_nationkey = n.n_nationkey")


def test_left_join(oracle):
    oracle("SELECT n.n_name, r.r_name FROM nation n "
           "LEFT JOIN region r ON n.n_regionkey = r.r_regionkey")


def test_right_join(oracle):
    oracle("SELECT n.n_name, c.c_name FROM customer c "
           "RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey")


def test_full_outer_join(oracle):
    oracle("SELECT a.l_orderkey, b.o_orderkey FROM "
           "(SELECT l_orderkey FROM lineitem WHERE l_orderkey < 10) a "
           "FULL OUTER JOIN (SELECT o_orderkey FROM orders WHERE o_orderkey BETWEEN 5 AND 15) b "
           "ON a.l_orderkey = b.o_orderkey")


def test_cross_join_explicit(oracle):
    oracle("SELECT r1.r_name AS name1, r2.r_name AS other "
           "FROM region r1 CROSS JOIN region r2")


def test_cross_join_comma(oracle):
    oracle("SELECT r.r_name, n.n_name FROM region r, nation n")


def test_multiway_join(oracle):
    oracle("SELECT c.c_name, o.o_orderkey, n.n_name FROM customer c "
           "JOIN orders o ON c.c_custkey = o.o_custkey "
           "JOIN nation n ON c.c_nationkey = n.n_nationkey "
           "WHERE o.o_totalprice > 400000")


def test_theta_join_multi_condition(oracle):
    oracle("SELECT l.l_orderkey, o.o_orderkey FROM lineitem l "
           "JOIN orders o ON l.l_orderkey = o.o_orderkey AND l.l_quantity > 45")


def test_join_with_aggregation(oracle):
    oracle("SELECT n.n_name, count(*) AS n_customers, sum(c.c_acctbal) AS total_bal "
           "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
           "GROUP BY n.n_name")


def test_join_of_subqueries(oracle):
    oracle("SELECT a.o_custkey, a.cnt, b.c_name FROM "
           "(SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey) a "
           "JOIN (SELECT c_custkey, c_name FROM customer) b ON a.o_custkey = b.c_custkey")


def test_in_subquery_semi_join(oracle):
    oracle("SELECT c_name FROM customer WHERE c_nationkey IN "
           "(SELECT n_nationkey FROM nation WHERE n_regionkey = 1)")


def test_not_in_subquery(oracle):
    oracle("SELECT c_name FROM customer WHERE c_nationkey NOT IN "
           "(SELECT n_nationkey FROM nation WHERE n_regionkey = 1)")


def test_exists_uncorrelated(oracle):
    oracle("SELECT count(*) AS n FROM region WHERE EXISTS "
           "(SELECT n_name FROM nation WHERE n_nationkey > 100)")
    oracle("SELECT count(*) AS n FROM region WHERE NOT EXISTS "
           "(SELECT n_name FROM nation WHERE n_nationkey > 100)")


def test_self_join_with_aliases(oracle):
    oracle("SELECT a.n_name AS n1, b.n_name AS n2 FROM nation a "
           "JOIN nation b ON a.n_regionkey = b.n_regionkey "
           "WHERE a.n_nationkey < b.n_nationkey")


# ---- duplicate-column renaming semantics (direct assertions; reference
# sql_value_objects.py:430-443, sql_parser.py:513-547) ----

def test_star_join_renames_duplicates(engine):
    df = engine.query(
        "SELECT * FROM nation a JOIN nation b ON a.n_nationkey = b.n_nationkey"
    )
    assert df.columns == [
        "a.n_nationkey", "a.n_name", "a.n_regionkey",
        "b.n_nationkey", "b.n_name", "b.n_regionkey",
    ]


def test_star_join_no_overlap_keeps_names(engine):
    df = engine.query(
        "SELECT * FROM nation JOIN region ON nation.n_regionkey = region.r_regionkey"
    )
    assert df.columns == ["n_nationkey", "n_name", "n_regionkey",
                          "r_regionkey", "r_name"]


def test_qualified_select_of_duplicate_renames(engine):
    df = engine.query(
        "SELECT a.n_name, b.n_name FROM nation a JOIN nation b "
        "ON a.n_nationkey = b.n_nationkey"
    )
    assert df.columns == ["a.n_name", "b.n_name"]
