"""Aggregation: global/grouped, HAVING, COUNT variants, rewrites, and the
reference's grouping semantics."""

import pytest

from sql_to_ibis_spark.errors import (
    NeedsAggOrGroupQueryException,
    UnsupportedColumnOperation,
)


def test_global_aggregates(oracle):
    oracle("SELECT sum(l_quantity) AS s, avg(l_quantity) AS a, "
           "min(l_quantity) AS mn, max(l_quantity) AS mx, count(l_quantity) AS c "
           "FROM lineitem")


def test_count_star_and_distinct(oracle):
    oracle("SELECT count(*) AS n, count(DISTINCT l_returnflag) AS d FROM lineitem")


def test_group_by(oracle):
    oracle("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
           "count(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus")


def test_group_by_with_where(oracle):
    oracle("SELECT o_orderpriority, count(*) AS n FROM orders "
           "WHERE o_totalprice > 100000 GROUP BY o_orderpriority")


def test_agg_expression_mixing(oracle):
    oracle("SELECT l_returnflag, sum(l_quantity) / count(*) AS qty_per_row, "
           "sum(l_extendedprice * (1 - l_discount)) AS revenue "
           "FROM lineitem GROUP BY l_returnflag")


def test_group_key_in_expression_after_agg(oracle):
    oracle("SELECT l_linenumber, l_linenumber + count(*) AS k FROM lineitem "
           "GROUP BY l_linenumber")


def test_having_grouped(oracle):
    oracle("SELECT l_returnflag, count(*) AS n FROM lineitem "
           "GROUP BY l_returnflag HAVING count(*) > 1000")


def test_having_references_nonselected_agg(oracle):
    oracle("SELECT l_returnflag, count(*) AS n FROM lineitem "
           "GROUP BY l_returnflag HAVING sum(l_quantity) > 10000")


def test_having_global(oracle):
    oracle("SELECT min(l_quantity) AS mn FROM lineitem HAVING min(l_quantity) > 0")


def test_having_on_group_key(oracle):
    oracle("SELECT l_returnflag, count(*) AS n FROM lineitem "
           "GROUP BY l_returnflag HAVING l_returnflag != 'N'")


def test_group_by_without_aggregates_is_distinct(oracle):
    # reference rewrite (sql_parser.py:444-450)
    oracle("SELECT l_returnflag, l_linestatus FROM lineitem "
           "GROUP BY l_returnflag, l_linestatus")


def test_group_key_not_selected_is_dropped(oracle, engine):
    # reference drops unselected keys (sql_parser.py:461-467)
    df = engine.query("SELECT sum(l_quantity) AS s FROM lineitem GROUP BY l_returnflag")
    assert df.columns == ["s"]
    oracle("SELECT sum(l_quantity) AS s FROM lineitem GROUP BY l_returnflag")


def test_group_key_casing_follows_select(engine):
    # reference _set_casing_for_groupby_names (sql_parser.py:649-663)
    df = engine.query("SELECT L_ReturnFlag, count(*) AS n FROM lineitem "
                      "GROUP BY l_returnflag")
    assert df.columns == ["L_ReturnFlag", "n"]


def test_extended_aggregates(oracle):
    oracle("SELECT stddev(l_quantity) AS sd, variance(l_quantity) AS v, "
           "median(l_quantity) AS md FROM lineitem")


def test_sum_distinct(oracle):
    oracle("SELECT sum(DISTINCT l_linenumber) AS s FROM lineitem")


def test_nonagg_nongroup_column_raises(engine):
    with pytest.raises(NeedsAggOrGroupQueryException):
        engine.query("SELECT l_orderkey, sum(l_quantity) FROM lineitem "
                     "GROUP BY l_returnflag").collect()


def test_sum_string_raises(engine):
    with pytest.raises(UnsupportedColumnOperation):
        engine.query("SELECT sum(l_returnflag) FROM lineitem")


def test_agg_alias_matches_oracle_names(engine):
    df = engine.query("SELECT sum(l_quantity) FROM lineitem")
    assert df.columns == ["_col0"]  # unaliased aggregate auto-name


def test_exact_percentile_vs_duckdb(oracle):
    oracle(
        "SELECT l_returnflag, round(percentile(l_extendedprice, 0.5), 2) AS p50 "
        "FROM lineitem GROUP BY l_returnflag",
        "SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 2) AS p50 "
        "FROM lineitem GROUP BY l_returnflag",
    )


def test_approx_percentile_close_to_exact(engine):
    got = engine.query(
        "SELECT round(percentile(l_extendedprice, 0.5), 2) AS exact_p50, "
        "round(approx_percentile(l_extendedprice, 0.5, 10000), 2) AS approx_p50 "
        "FROM lineitem").toPandas()
    exact, approx = got["exact_p50"][0], got["approx_p50"][0]
    # sketch error bound: well under 1% at this accuracy
    assert abs(exact - approx) / exact < 0.01


# ---- GROUP BY without aggregates: SELECT-list order + duplicate key select


def test_groupby_no_agg_select_order(oracle):
    # output columns must follow the SELECT list, not GROUP BY order
    df = oracle("SELECT l_linestatus, l_returnflag FROM lineitem "
                "GROUP BY l_returnflag, l_linestatus")
    assert list(df.columns) == ["l_linestatus", "l_returnflag"]


def test_groupby_no_agg_key_selected_twice(oracle):
    oracle("SELECT l_returnflag, l_returnflag AS flag2 FROM lineitem "
           "GROUP BY l_returnflag")


def test_groupby_agg_key_selected_twice(oracle):
    oracle("SELECT l_returnflag, l_returnflag AS flag2, count(*) AS n "
           "FROM lineitem GROUP BY l_returnflag")


def test_group_by_ordinal(oracle):
    oracle("SELECT l_returnflag, l_linestatus, count(*) AS n "
           "FROM lineitem GROUP BY 1, 2")


def test_group_by_ordinal_expression(oracle):
    oracle("SELECT l_linenumber % 3 AS m3, count(*) AS n "
           "FROM lineitem GROUP BY 1")


def test_group_by_ordinal_out_of_range(engine):
    import pytest

    from sql_to_ibis_spark.errors import InvalidQueryException

    with pytest.raises(InvalidQueryException):
        engine.query("SELECT l_returnflag FROM lineitem GROUP BY 5")


# ---------------------------------------------------- decimal-sum fast path

def test_decimal_sum_fast_path_matches_oracle(oracle):
    # compiles to the split-long exact path (compiler._try_split_decimal_sum)
    oracle("SELECT l_returnflag, "
           "CAST(sum(CAST(l_extendedprice AS decimal(18,2))) AS double) AS s "
           "FROM lineitem GROUP BY l_returnflag")


def test_decimal_sum_fast_path_negatives_and_nulls(spark, engine):
    # string group key → low-cardinality gate keeps this on the fast path
    df = spark.createDataFrame(
        [("a", 12345.67), ("a", -99999.99), ("a", None), ("b", 0.005),
         ("b", -0.005)],
        "g string, x double")
    engine.register_temp_table(df, "t_dec")
    try:
        rows = {r["g"]: r["s"] for r in engine.query(
            "SELECT g, sum(CAST(x AS decimal(18,2))) AS s "
            "FROM t_dec GROUP BY g").collect()}
        from decimal import Decimal
        assert rows["a"] == Decimal("-87654.32")
        # HALF_UP away from zero on both boundary rows
        assert rows["b"] == Decimal("0.00")
        # all-null group → NULL sum
        engine.register_temp_table(
            spark.createDataFrame([(1, None)], "g int, x double"), "t_nul")
        assert engine.query(
            "SELECT sum(CAST(x AS decimal(18,2))) AS s FROM t_nul"
        ).collect()[0]["s"] is None
    finally:
        engine.remove_temp_table("t_dec")
        engine.remove_temp_table("t_nul")


def test_decimal_sum_fast_path_domain_guard_is_loud(spark, engine):
    # |x * 10^s| >= 2^52 must raise, never sum inexactly
    import pyspark.errors
    import pytest as _pytest
    engine.register_temp_table(spark.createDataFrame(
        [(1, float(1 << 53))], "g int, x double"), "t_big")
    try:
        with _pytest.raises(Exception, match="exact domain|USER_RAISED"):
            engine.query("SELECT sum(CAST(x AS decimal(18,2))) AS s "
                         "FROM t_big").collect()
    finally:
        engine.remove_temp_table("t_big")


def test_decimal_sum_wide_precision_keeps_decimal_path(oracle):
    # p > 18 must NOT take the fast path (domain too wide for long limbs)
    oracle("SELECT CAST(sum(CAST(l_extendedprice AS decimal(22,2))) AS double)"
           " AS s FROM lineitem")


class TestStatisticalAggregates:
    """Two-column statistical aggregates (corr/covar/regr family) and
    separator-form string_agg/listagg — extensions, DuckDB-checked."""

    def test_corr_covar(self, oracle):
        oracle("""
            SELECT l_returnflag,
                   round(corr(l_quantity, l_extendedprice), 6) AS c,
                   round(covar_samp(l_quantity, l_extendedprice), 4) AS cs,
                   round(covar_pop(l_quantity, l_discount), 8) AS cp
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """, ordered=True)

    def test_regr_family(self, oracle):
        oracle("""
            SELECT round(regr_slope(l_extendedprice, l_quantity), 4) AS m,
                   round(regr_intercept(l_extendedprice, l_quantity), 4) AS b,
                   round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
                   regr_count(l_extendedprice, l_quantity) AS n,
                   round(regr_avgx(l_extendedprice, l_quantity), 6) AS ax,
                   round(regr_avgy(l_extendedprice, l_quantity), 4) AS ay
            FROM lineitem
        """)

    def test_string_agg_separator(self, engine, ddb):
        # aggregation order is engine-defined; compare as SETS of parts
        sql = ("SELECT r_regionkey, string_agg(n_name, '|') AS names "
               "FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey "
               "GROUP BY r_regionkey")
        mine = {r["r_regionkey"]: set(r["names"].split("|"))
                for r in engine.query(sql).collect()}
        theirs = {k: set(v.split("|"))
                  for k, v in ddb.execute(sql).fetchall()}
        assert mine == theirs

    def test_listagg_default_comma(self, engine):
        got = engine.query(
            "SELECT listagg(r_name) AS all_names FROM region").collect()
        assert set(got[0]["all_names"].split(",")) == {
            "AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"}
