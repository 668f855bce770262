"""Catalog bookkeeping + error surface (reference test_tables.py /
test_errors.py parity)."""

import pytest

from sql_to_ibis_spark import SqlEngine
from sql_to_ibis_spark.errors import (
    AmbiguousColumnException,
    ColumnNotFoundError,
    InvalidQueryException,
    TableNotFoundError,
)


def test_register_and_remove(spark):
    eng = SqlEngine(spark)
    df = spark.range(3)
    eng.register_temp_table(df, "MyTable")
    assert "mytable" in eng.catalog
    assert eng.query("SELECT id FROM MYTABLE").count() == 3
    eng.remove_temp_table("mytable")
    with pytest.raises(TableNotFoundError):
        eng.query("SELECT id FROM MyTable")


def test_register_rejects_non_dataframe(spark):
    eng = SqlEngine(spark)
    with pytest.raises(TypeError):
        eng.register_temp_table("not a dataframe", "t")


def test_engines_are_isolated(spark):
    e1, e2 = SqlEngine(spark), SqlEngine(spark)
    e1.register_temp_table(spark.range(1), "only_in_e1")
    with pytest.raises(TableNotFoundError):
        e2.query("SELECT * FROM only_in_e1")


def test_invalid_sql(engine):
    with pytest.raises(InvalidQueryException):
        engine.query("SELECT FROM WHERE")


def test_unknown_table(engine):
    with pytest.raises(TableNotFoundError):
        engine.query("SELECT a FROM no_such_table")


def test_unknown_column(engine):
    with pytest.raises(ColumnNotFoundError):
        engine.query("SELECT nonexistent FROM region")


def test_unknown_qualified_column(engine):
    with pytest.raises(ColumnNotFoundError):
        engine.query("SELECT region.nope FROM region")


def test_ambiguous_column(engine):
    with pytest.raises(AmbiguousColumnException):
        engine.query("SELECT n_name FROM nation a JOIN nation b "
                     "ON a.n_nationkey = b.n_nationkey")


def test_in_subquery_multi_column_rejected(engine):
    with pytest.raises(InvalidQueryException):
        engine.query("SELECT r_name FROM region WHERE r_regionkey IN "
                     "(SELECT n_nationkey, n_regionkey FROM nation)")


def test_unknown_function(engine):
    with pytest.raises(InvalidQueryException):
        engine.query("SELECT frobnicate(r_name) FROM region")


def test_query_is_lazy(engine):
    # no action should run at compile time
    df = engine.query("SELECT r_name FROM region")
    assert hasattr(df, "collect")  # plain lazy DataFrame


def test_show_tables(engine):
    got = engine.query("SHOW TABLES").toPandas()
    assert "lineitem" in set(got["table_name"])
    assert list(got.columns) == ["table_name"]


def test_describe_table(engine):
    got = engine.query("DESCRIBE lineitem").toPandas()
    assert list(got.columns) == ["col_name", "data_type", "nullable"]
    assert "l_orderkey" in set(got["col_name"])


def test_column_error_suggests_close_match(engine):
    import pytest as _p

    from sql_to_ibis_spark.errors import ColumnNotFoundError
    with _p.raises(ColumnNotFoundError, match="did you mean"):
        engine.query("SELECT l_quantty FROM lineitem")


def test_module_level_drop_in_api(spark):
    """The reference's exact three-function surface (__init__.py:6):
    register_temp_table(table, name) / query(sql) / remove_temp_table(name)
    work at module level for drop-in migration."""
    import sql_to_ibis_spark as stis

    # point the default engine at the shared test session
    stis.engine._default_engine = stis.SqlEngine(spark)
    try:
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id: long, v: string")
        stis.register_temp_table(df, "mod_level_t")
        got = stis.query("SELECT v FROM mod_level_t WHERE id = 2").collect()
        assert [r["v"] for r in got] == ["b"]
        stis.remove_temp_table("mod_level_t")
        from sql_to_ibis_spark.errors import TableNotFoundError
        with pytest.raises(TableNotFoundError):
            stis.query("SELECT * FROM mod_level_t")
    finally:
        stis.engine._default_engine = None
