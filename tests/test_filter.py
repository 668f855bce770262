"""WHERE-clause predicates — DuckDB-oracle execution tests."""


def test_comparisons(oracle):
    for op in ["=", "!=", "<>", "<", "<=", ">", ">="]:
        oracle(f"SELECT count(*) AS n FROM lineitem WHERE l_quantity {op} 25")


def test_and_or_not_parens(oracle):
    oracle("SELECT count(*) AS n FROM lineitem "
           "WHERE (l_quantity > 40 OR l_discount < 0.02) AND NOT l_returnflag = 'A'")


def test_between(oracle):
    oracle("SELECT count(*) AS n FROM lineitem WHERE l_quantity BETWEEN 10 AND 20")
    oracle("SELECT count(*) AS n FROM lineitem WHERE l_quantity NOT BETWEEN 10 AND 20")


def test_in_list(oracle):
    oracle("SELECT count(*) AS n FROM lineitem WHERE l_returnflag IN ('A', 'R')")
    oracle("SELECT count(*) AS n FROM lineitem WHERE l_linenumber NOT IN (1, 2)")


def test_is_null(oracle):
    oracle("SELECT count(*) AS n FROM "
           "(SELECT NULLIF(l_linenumber, 1) AS ln FROM lineitem) t WHERE ln IS NULL")
    oracle("SELECT count(*) AS n FROM "
           "(SELECT NULLIF(l_linenumber, 1) AS ln FROM lineitem) t WHERE ln IS NOT NULL")


def test_filter_on_unselected_column(oracle):
    # WHERE sees pre-projection columns (reference sql_parser.py:730-735,
    # test_conditionals.py:271-276)
    oracle("SELECT l_orderkey FROM lineitem WHERE l_quantity > 45")


def test_like(oracle):
    oracle("SELECT count(*) AS n FROM part WHERE p_name LIKE 'part_1%'")
    oracle("SELECT count(*) AS n FROM part WHERE p_name NOT LIKE '%5'")


def test_ilike(oracle):
    oracle("SELECT count(*) AS n FROM part WHERE p_name ILIKE 'PART_1%'")


def test_where_with_arithmetic(oracle):
    oracle("SELECT l_orderkey FROM lineitem "
           "WHERE l_extendedprice * (1 - l_discount) > 90000")


def test_null_safe_equal(oracle):
    oracle("SELECT count(*) AS n FROM "
           "(SELECT NULLIF(l_linenumber, 1) AS ln FROM lineitem) t WHERE ln <=> NULL",
           "SELECT count(*) AS n FROM "
           "(SELECT NULLIF(l_linenumber, 1) AS ln FROM lineitem) t "
           "WHERE ln IS NOT DISTINCT FROM NULL")
