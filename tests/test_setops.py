"""Set operations and subquery nesting."""


def test_union_distinct(oracle):
    oracle("SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier")


def test_union_all(oracle):
    oracle("SELECT c_nationkey FROM customer UNION ALL SELECT s_nationkey FROM supplier")


def test_intersect(oracle):
    oracle("SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier")


def test_except(oracle):
    oracle("SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier")


def test_except_all(oracle):
    oracle("SELECT l_linenumber FROM lineitem WHERE l_orderkey < 100 EXCEPT ALL "
           "SELECT l_linenumber FROM lineitem WHERE l_orderkey < 50")


def test_intersect_all(oracle):
    oracle("SELECT l_linenumber FROM lineitem WHERE l_orderkey < 100 INTERSECT ALL "
           "SELECT l_linenumber FROM lineitem WHERE l_orderkey < 50")


def test_union_with_trailing_order_limit(oracle):
    oracle("SELECT c_nationkey AS k FROM customer UNION "
           "SELECT s_nationkey AS k FROM supplier ORDER BY k LIMIT 5", ordered=True)


def test_chained_setops(oracle):
    oracle("SELECT n_regionkey FROM nation UNION SELECT r_regionkey FROM region "
           "UNION ALL SELECT 99")


def test_nested_subqueries(oracle):
    oracle("SELECT k FROM (SELECT c_nationkey AS k FROM "
           "(SELECT c_nationkey FROM customer WHERE c_acctbal > 0) inner1) outer1 "
           "WHERE k < 10")


def test_setop_of_parenthesized_queries(oracle):
    oracle("(SELECT n_regionkey FROM nation WHERE n_nationkey < 5) UNION "
           "(SELECT r_regionkey FROM region) ORDER BY n_regionkey", ordered=True)
