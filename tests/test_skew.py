"""Skew-mitigation operators: salted joins and two-phase aggregation must be
result-identical to their plain equivalents (salting changes the physical
distribution only)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_to_ibis_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 0 — the hot-key shape salting exists for
    return spark.range(0, 5000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 2).alias("v"),
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(0, 5000).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label"))


def test_salted_join_matches_plain_join(skewed, dim):
    plain = skewed.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    salted = skew.salted_join(skewed, dim, "k", salt=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_left_join_keeps_unmatched(skewed, spark):
    small = spark.range(0, 1).select(F.col("id").alias("k"),
                                     F.lit("zero").alias("label"))
    out = skew.salted_join(skewed, small, "k", salt=4, how="left")
    plain = skewed.join(small, "k", "left")
    assert out.count() == plain.count()
    assert out.filter(F.col("label").isNull()).count() == \
        plain.filter(F.col("label").isNull()).count()


def test_salted_join_rejects_right_join(skewed, dim):
    with pytest.raises(ValueError):
        skew.salted_join(skewed, dim, "k", how="right")


def test_skewed_group_count(skewed):
    plain = {r["k"]: r["n"] for r in
             skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    two_phase = {r["k"]: r["n"] for r in
                 skew.skewed_group_count(skewed, "k", salt=8).collect()}
    assert plain == two_phase


def test_skewed_group_agg(skewed):
    plain = skewed.groupBy("k").agg(
        F.sum("v").alias("sv"), F.count("v").alias("cv"),
        F.min("v").alias("mn"), F.max("v").alias("mx"))
    two = skew.skewed_group_agg(
        skewed, "k",
        {"sv": ("sum", "v"), "cv": ("count", "v"),
         "mn": ("min", "v"), "mx": ("max", "v")}, salt=8)
    assert sorted(plain.collect()) == sorted(two.collect())


def test_skewed_group_agg_rejects_avg(skewed):
    with pytest.raises(ValueError):
        skew.skewed_group_agg(skewed, "k", {"a": ("avg", "v")})


def test_top_frequent_keys(skewed):
    top = skew.top_frequent_keys(skewed, "k", k=1).collect()
    # 4500 rows with id%10!=0 plus id=0 itself
    assert top[0]["k"] == 0 and top[0]["n"] == 4501
