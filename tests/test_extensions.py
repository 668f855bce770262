"""User-defined functions, JSON functions, and sink helpers — extensions
beyond the reference surface (SURVEY §2.9: reference has no UDF surface at
all; §2.1: no sinks)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sql_to_ibis_spark import SqlEngine
from sql_to_ibis_spark.sources import sinks
from tests.conftest import SF_DIR


@pytest.fixture()
def udf_engine(spark):
    eng = SqlEngine(spark)
    eng.register_dir(SF_DIR)
    return eng


def test_register_vectorized_pandas_udf(udf_engine):
    def net_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    udf_engine.register_function("net_price", net_price, "double")
    got = udf_engine.query(
        "SELECT l_orderkey, net_price(l_extendedprice, l_discount) AS net "
        "FROM lineitem LIMIT 5"
    ).toPandas()
    assert list(got.columns) == ["l_orderkey", "net"]
    assert (got["net"] > 0).all()


def test_register_row_udf(udf_engine):
    udf_engine.register_function(
        "shout", lambda s: (s or "") + "!", "string", vectorized=False)
    got = udf_engine.query("SELECT shout(r_name) AS x FROM region").toPandas()
    assert got["x"].str.endswith("!").all()


def test_udf_correctness_vs_builtin(udf_engine):
    def double_it(s: pd.Series) -> pd.Series:
        return s * 2

    udf_engine.register_function("double_it", double_it, "double")
    got = udf_engine.query(
        "SELECT sum(double_it(l_quantity)) AS a, sum(l_quantity * 2) AS b "
        "FROM lineitem"
    ).toPandas()
    assert abs(got["a"][0] - got["b"][0]) < 1e-6


def test_remove_function(udf_engine):
    udf_engine.register_function("f1", lambda s: s, "double")
    udf_engine.remove_function("F1")  # case-insensitive
    assert "f1" not in udf_engine.functions


def test_get_json_object(oracle):
    oracle(
        "SELECT event_id, CAST(get_json_object(props, '$.k') AS int) AS k "
        "FROM events",
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS int) AS k "
        "FROM events",
    )


def test_to_json_roundtrip(engine):
    got = engine.query(
        "SELECT json_array_length('[1,2,3]') AS n").toPandas()
    assert got["n"][0] == 3


def test_write_parquet_partitioned(engine, tmp_path):
    df = engine.query("SELECT n_nationkey, n_name, n_regionkey FROM nation")
    out = str(tmp_path / "nation_parts")
    sinks.write_parquet(df, out, partition_by=["n_regionkey"], target_files=2)
    # directory-partitioned layout → partition pruning for readers
    assert any(d.startswith("n_regionkey=") for d in os.listdir(out))
    back = engine.spark.read.parquet(out)
    assert back.count() == 25
    assert set(back.columns) == {"n_nationkey", "n_name", "n_regionkey"}


def test_write_csv_json_roundtrip(engine, tmp_path):
    df = engine.query("SELECT r_regionkey, r_name FROM region")
    csv_out, json_out = str(tmp_path / "r_csv"), str(tmp_path / "r_json")
    sinks.write_csv(df, csv_out)
    sinks.write_json(df, json_out)
    assert engine.spark.read.options(header=True).csv(csv_out).count() == 5
    assert engine.spark.read.json(json_out).count() == 5


def test_write_bucketed_table(engine, tmp_path):
    spark = engine.spark
    df = engine.query("SELECT c_custkey, c_name, c_nationkey FROM customer")
    try:
        sinks.write_bucketed_table(df, "cust_bucketed",
                                   bucket_cols=["c_custkey"], num_buckets=4,
                                   sort_cols=["c_custkey"])
        desc = spark.sql("DESCRIBE TABLE EXTENDED cust_bucketed").toPandas()
        txt = " ".join(desc.astype(str).values.ravel())
        assert "4 buckets" in txt or "Num Buckets" in txt
        assert spark.table("cust_bucketed").count() == df.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS cust_bucketed")


def test_register_aggregate_udaf(udf_engine):
    import numpy as np

    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v[v > 0]).mean()))

    udf_engine.register_aggregate("geomean", geomean, "double")
    got = udf_engine.query(
        "SELECT l_returnflag, round(geomean(l_quantity), 4) AS g "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ).toPandas()
    # cross-check one group against pandas directly
    spark_df = udf_engine.query(
        "SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'").toPandas()
    expected = float(np.exp(np.log(
        spark_df["l_quantity"][spark_df["l_quantity"] > 0]).mean()))
    a_row = got[got["l_returnflag"] == "A"]["g"].iloc[0]
    assert abs(a_row - round(expected, 4)) < 1e-4


def test_udaf_global_and_having(udf_engine):
    def p90(v: pd.Series) -> float:
        return float(v.quantile(0.9))

    udf_engine.register_aggregate("p90", p90, "double")
    got = udf_engine.query(
        "SELECT round(p90(o_totalprice), 2) AS p FROM orders").toPandas()
    assert got["p"][0] > 0
    # Spark constraint: grouped-agg pandas UDFs can't mix with JVM
    # aggregates in one agg() — a UDAF-only HAVING works
    grouped = udf_engine.query(
        "SELECT o_orderpriority, round(p90(o_totalprice), 2) AS p "
        "FROM orders GROUP BY o_orderpriority "
        "HAVING p90(o_totalprice) > 100000"
    ).toPandas()
    assert len(grouped) >= 1


def test_range_table_function(oracle):
    oracle("SELECT id * 2 AS doubled FROM range(5)",
           "SELECT range * 2 AS doubled FROM range(5)")
    oracle("SELECT count(*) AS n FROM range(10, 20)",
           "SELECT count(*) AS n FROM range(10, 20)")


def test_user_udtf(udf_engine):
    class Splitter:
        def eval(self, text: str, sep: str):
            for i, part in enumerate((text or "").split(sep)):
                yield i, part

    udf_engine.register_table_function(
        "split_parts", Splitter, "idx: int, part: string")
    got = udf_engine.query(
        "SELECT idx, part FROM split_parts('a,b,c', ',')").toPandas()
    assert list(got["part"]) == ["a", "b", "c"]
    assert list(got["idx"]) == [0, 1, 2]


def test_udtf_joined_with_table(udf_engine):
    got = udf_engine.query(
        "SELECT r.r_name, g.id FROM region r "
        "JOIN range(3) g ON r.r_regionkey = g.id ORDER BY g.id").toPandas()
    assert len(got) == 3


def test_unknown_table_function_raises(engine):
    from sql_to_ibis_spark.errors import InvalidQueryException
    with pytest.raises(InvalidQueryException):
        engine.query("SELECT * FROM no_such_fn(1)")


def test_udaf_mixed_with_jvm_aggregates(udf_engine):
    """Spark forbids mixing grouped-agg pandas UDFs with JVM aggregates in
    one agg(); the compiler splits into two aggregations joined on the
    group keys, so the SQL surface has no such restriction."""

    def p90(v: pd.Series) -> float:
        return float(v.quantile(0.9))

    udf_engine.register_aggregate("p90", p90, "double")
    got = udf_engine.query(
        "SELECT o_orderpriority, count(*) AS n, "
        "round(avg(o_totalprice), 2) AS avg_price, "
        "round(p90(o_totalprice), 2) AS p90_price "
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ).toPandas()
    assert list(got.columns) == ["o_orderpriority", "n", "avg_price",
                                 "p90_price"]
    assert len(got) == 5
    assert (got["p90_price"] >= got["avg_price"]).all()
    # global (no GROUP BY) mixed case
    g = udf_engine.query(
        "SELECT count(*) AS n, round(p90(o_totalprice), 2) AS p "
        "FROM orders").toPandas()
    assert g["n"][0] > 0 and g["p"][0] > 0


def test_register_csv_json_orc_roundtrip(spark, engine, tmp_path):
    src = engine.query("SELECT r_regionkey, r_name FROM region")
    csv_p, json_p, orc_p = (str(tmp_path / x) for x in ("c", "j", "o"))
    sinks.write_csv(src, csv_p)
    sinks.write_json(src, json_p)
    sinks.write_orc(src, orc_p)
    eng = SqlEngine(spark)
    eng.register_csv("r_csv", csv_p)
    eng.register_json("r_json", json_p)
    eng.register_orc("r_orc", orc_p)
    for t in ("r_csv", "r_json", "r_orc"):
        got = eng.query(f"SELECT count(*) AS n FROM {t}").toPandas()
        assert got["n"][0] == 5, t
    joined = eng.query(
        "SELECT a.r_name FROM r_csv a JOIN r_orc b "
        "ON a.r_regionkey = b.r_regionkey")
    assert joined.count() == 5


def test_csv_json_orc_roundtrip(spark, engine, tmp_path):
    from sql_to_ibis_spark.sources import readers, sinks

    src = engine.query(
        "SELECT n_nationkey, n_name, n_regionkey FROM nation")
    expect = sorted(map(tuple, src.collect()))

    p_csv, p_json, p_orc = (str(tmp_path / x) for x in ["c", "j", "o"])
    sinks.write_csv(src, p_csv)
    sinks.write_json(src, p_json)
    sinks.write_orc(src, p_orc)

    got_csv = readers.read_csv(spark, p_csv)
    got_json = readers.read_json(spark, p_json)
    got_orc = readers.read_orc(spark, p_orc)
    assert sorted(map(tuple, got_orc.collect())) == expect
    # CSV/JSON are schemaless-ish: compare values after aligning column order
    for got in [got_csv, got_json]:
        rows = sorted(map(tuple, got.select(
            "n_nationkey", "n_name", "n_regionkey").collect()))
        assert rows == expect


def test_partitioned_parquet_prunes(spark, engine, tmp_path):
    from pyspark.sql import functions as F

    from sql_to_ibis_spark.sources import readers, sinks

    src = engine.query("SELECT o_orderkey, o_orderpriority FROM orders")
    path = str(tmp_path / "part_orders")
    sinks.write_parquet(src, path, partition_by=["o_orderpriority"])
    back = readers.read_parquet(spark, path)
    one = back.filter(F.col("o_orderpriority") == "1-URGENT")
    # partition pruning: the filtered scan must read only matching partition
    # directories (PartitionFilters in the physical plan)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "1-URGENT" in plan
    assert one.count() == src.filter(
        F.col("o_orderpriority") == "1-URGENT").count()


def test_bucketed_join_eliminates_shuffle(engine):
    # the 100-TB claim behind write_bucketed_table, proven on the plan: two
    # tables bucketed identically on the join key sort-merge-join with ZERO
    # exchanges (broadcast disabled so the bucketed path is what's tested)
    from tests.test_plan_quality import plan_of

    spark = engine.spark
    cust = engine.query("SELECT c_custkey, c_name FROM customer")
    orders = engine.query("SELECT o_custkey, o_totalprice FROM orders")
    try:
        sinks.write_bucketed_table(cust, "b_cust", bucket_cols=["c_custkey"],
                                   num_buckets=4, sort_cols=["c_custkey"])
        sinks.write_bucketed_table(orders, "b_ord", bucket_cols=["o_custkey"],
                                   num_buckets=4, sort_cols=["o_custkey"])
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_cust").join(
                spark.table("b_ord"),
                spark.table("b_cust")["c_custkey"]
                == spark.table("b_ord")["o_custkey"])
            plan = plan_of(joined, "simple")
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, \
                "bucketed-bucketed equi-join must not shuffle"
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_cust")
        spark.sql("DROP TABLE IF EXISTS b_ord")
