"""Projection / literals / scalar expressions — DuckDB-oracle execution tests
plus reference-parity naming assertions."""



def test_select_columns(oracle):
    oracle("SELECT r_regionkey, r_name FROM region")


def test_select_star(oracle):
    oracle("SELECT * FROM nation")


def test_select_table_star(oracle):
    oracle("SELECT nation.* FROM nation")


def test_alias(oracle):
    oracle("SELECT r_name AS region_name FROM region")


def test_quoted_alias_with_space(oracle):
    oracle('SELECT r_name AS "region name" FROM region')


def test_distinct(oracle):
    oracle("SELECT DISTINCT l_returnflag FROM lineitem")


def test_limit_offset_ordered(oracle):
    oracle("SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 5",
           ordered=True)


def test_math_precedence(oracle):
    oracle("SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS net, "
           "l_quantity + 1.5 AS q, l_tax / 2 AS half_tax, "
           "l_linenumber % 3 AS m FROM lineitem")


def test_literals_no_from(oracle):
    oracle("SELECT 1 + 2 * 3 - 2 AS v, 'hi' AS s, true AS b, 1.5e2 AS f")


def test_case_expression(oracle):
    oracle("SELECT l_orderkey, CASE WHEN l_quantity > 25 THEN 'big' "
           "WHEN l_quantity > 10 THEN 'mid' ELSE 'small' END AS bucket "
           "FROM lineitem")


def test_case_without_else(oracle):
    oracle("SELECT CASE WHEN l_quantity > 25 THEN 'big' END AS bucket FROM lineitem")


def test_simple_case_form(oracle):
    oracle("SELECT CASE l_returnflag WHEN 'A' THEN 1 WHEN 'R' THEN 2 ELSE 0 END "
           "AS flag_code FROM lineitem")


def test_cast(oracle):
    # NB: float→int CAST truncates in Spark but rounds in DuckDB — the oracle
    # uses trunc() to pin our (Spark-native) truncation semantics.
    oracle("SELECT CAST(l_quantity AS int) AS qi, CAST(l_orderkey AS string) AS ks, "
           "CAST(l_extendedprice AS bigint) AS pb FROM lineitem",
           "SELECT CAST(l_quantity AS int) AS qi, CAST(l_orderkey AS varchar) AS ks, "
           "CAST(trunc(l_extendedprice) AS bigint) AS pb FROM lineitem")


def test_coalesce_nullif(oracle):
    oracle("SELECT COALESCE(NULLIF(l_returnflag, 'A'), 'was_a') AS f FROM lineitem")


def test_concat_operator(oracle):
    oracle("SELECT r_name || '_' || CAST(r_regionkey AS string) AS tag FROM region",
           "SELECT r_name || '_' || CAST(r_regionkey AS varchar) AS tag FROM region")


def test_string_functions(oracle):
    oracle("SELECT lower(r_name) AS lo, upper(r_name) AS up, length(r_name) AS n, "
           "substring(r_name, 2, 3) AS mid, trim(r_name) AS t FROM region")


def test_math_functions(oracle):
    oracle("SELECT abs(-l_quantity) AS a, round(l_extendedprice, 1) AS r, "
           "floor(l_discount * 100) AS fl, ceil(l_tax * 100) AS ce, "
           "sqrt(l_quantity) AS sq FROM lineitem")


def test_date_functions(oracle):
    oracle("SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, "
           "day(o_orderdate) AS d FROM orders")


def test_timestamp_literal_filter(oracle):
    oracle("SELECT count(*) AS n FROM orders WHERE o_orderdate < TIMESTAMP('1995-01-01')",
           "SELECT count(*) AS n FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01'")


# ---- reference-parity naming semantics (direct assertions) ----

def test_output_casing_follows_query(engine):
    # reference relabels to query casing (test_select.py:104-111)
    df = engine.query("SELECT R_NAME, r_RegionKey FROM region")
    assert df.columns == ["R_NAME", "r_RegionKey"]


def test_auto_names_for_literals_and_exprs(engine):
    df = engine.query("SELECT 5, 'x', l_quantity * 2, abs(l_tax) FROM lineitem")
    assert df.columns == ["_literal0", "_literal1", "_col0", "_col1"]


def test_auto_name_counters_reset_per_query(engine):
    # instance-scoped counters (reference needed global reset hooks)
    df1 = engine.query("SELECT 1 FROM region")
    df2 = engine.query("SELECT 2 FROM region")
    assert df1.columns == df2.columns == ["_literal0"]


def test_select_star_preserves_schema(engine):
    df = engine.query("SELECT * FROM lineitem")
    assert df.columns == engine.catalog.get("lineitem").df.columns


def test_extract_ansi_form(oracle):
    oracle(
        "SELECT EXTRACT(year FROM o_orderdate) AS y, "
        "EXTRACT(month FROM o_orderdate) AS m, "
        "EXTRACT(day FROM o_orderdate) AS d, count(*) AS n "
        "FROM orders GROUP BY ALL",
        "SELECT EXTRACT(year FROM o_orderdate) AS y, "
        "EXTRACT(month FROM o_orderdate) AS m, "
        "EXTRACT(day FROM o_orderdate) AS d, count(*) AS n "
        "FROM orders GROUP BY 1, 2, 3",
    )


def test_ansi_string_forms(oracle):
    oracle(
        "SELECT SUBSTRING(r_name FROM 2 FOR 3) AS mid, "
        "SUBSTRING(r_name FROM 3) AS tail_, "
        "POSITION('A' IN r_name) AS pos_a, "
        "TRIM('AE' FROM r_name) AS trimmed, "
        "TRIM(LEADING 'A' FROM r_name) AS no_lead_a "
        "FROM region",
        "SELECT SUBSTRING(r_name FROM 2 FOR 3) AS mid, "
        "SUBSTRING(r_name FROM 3) AS tail_, "
        "POSITION('A' IN r_name) AS pos_a, "
        "TRIM('AE' FROM r_name) AS trimmed, "
        "TRIM(LEADING 'A' FROM r_name) AS no_lead_a "
        "FROM region",
    )
    # plain call forms still work
    oracle("SELECT trim('  x  ') AS t, substring('hello', 2, 3) AS s")


def test_hidden_sort_does_not_shift_auto_names(engine):
    # _colN counters must advance once per select item even when ORDER BY
    # references a non-selected column (hidden-sort path compiles the
    # select list exactly once)
    df = engine.query("SELECT o_orderkey + 1 FROM orders ORDER BY o_totalprice "
                      "LIMIT 5")
    assert df.columns == ["_col0"]


def test_star_exclude(oracle):
    oracle("SELECT * EXCLUDE (n_comment) FROM nation"
           if False else
           "SELECT * EXCLUDE (n_regionkey) FROM nation",
           "SELECT * EXCLUDE (n_regionkey) FROM nation")


def test_star_exclude_multiple(engine):
    df = engine.query("SELECT * EXCLUDE (n_regionkey, n_name) FROM nation")
    assert df.columns == ["n_nationkey"]


def test_table_star_exclude(engine):
    df = engine.query("SELECT n.* EXCLUDE (n_regionkey) FROM nation n "
                      "JOIN region r ON n.n_regionkey = r.r_regionkey")
    assert df.columns == ["n_nationkey", "n_name"]


def test_star_exclude_unknown_column(engine):
    import pytest

    from sql_to_ibis_spark.errors import ColumnNotFoundError

    with pytest.raises(ColumnNotFoundError):
        engine.query("SELECT * EXCLUDE (nope) FROM nation")
