"""Round-15 hardening: FK referenced-column uniqueness validation, the
advisor's once-per-select WHERE-subquery walk, the binned batch path of
interval_join, BPE pre-tokenizer unicode-whitespace parity, and the CTE
prepartition gate."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sql_to_ibis_spark import SqlEngine
from sql_to_ibis_spark.sources.readers import read_parquet
from sql_to_ibis_spark.streaming import interval_join
from sql_to_ibis_spark.streaming.ops import _offset_seconds
from tests.conftest import SF_DIR


# ---- validate_constraints: ref-side uniqueness --------------------------

def test_fk_duplicate_ref_rows_flagged(spark):
    eng = SqlEngine(spark)
    eng.register_dir(SF_DIR, ["nation", "customer"])
    dup = eng.catalog.get("nation").df
    eng.catalog.register("nation_dup",
                         dup.unionByName(dup.limit(3)))
    eng.add_foreign_key("customer", "c_nationkey", "nation_dup",
                        ref_cols="n_nationkey")
    out = eng.validate_constraints("customer")
    msgs = [m for ms in out.values() for m in ms]
    assert any("join elimination unsound" in m for m in msgs)


def test_fk_unique_ref_rows_clean(spark):
    eng = SqlEngine(spark)
    eng.register_dir(SF_DIR, ["nation", "customer"])
    eng.add_primary_key("nation", "n_nationkey")
    eng.add_foreign_key("customer", "c_nationkey", "nation")
    assert eng.validate_constraints("customer") == {}


# ---- advise_layout: WHERE-subquery walk runs exactly once ---------------

def test_advisor_counts_subquery_keys_without_range_predicate(spark):
    # the r14 bug: a query with a WHERE subquery but NO attributable
    # range predicate never walked the subquery at all, so the
    # subquery's join keys got zero votes
    eng = SqlEngine(spark)
    eng.register_dir(SF_DIR)
    try:
        eng.analyze()
    except Exception:
        pass
    sub = ("SELECT o_orderkey FROM orders WHERE o_orderkey IN "
           "(SELECT l_orderkey FROM lineitem l JOIN orders o "
           " ON l.l_orderkey = o.o_orderkey)")
    advice = eng.advise_layout(
        {f"q{i}": sub for i in range(3)},
        min_rows=0, fact_fraction=0.0, min_uses=1)
    li = [a for a in advice if a["table"] == "lineitem"
          and a["kind"] == "bucket"]
    assert li, "subquery join keys must reach the vote"
    assert li[0]["uses"].get("l_orderkey") == 3


def test_advisor_subquery_votes_not_multiplied(spark):
    # ...and with N range predicates present, the subquery used to be
    # walked N times, multiplying its votes
    eng = SqlEngine(spark)
    eng.register_dir(SF_DIR)
    try:
        eng.analyze()
    except Exception:
        pass
    q = ("SELECT o_orderkey FROM orders WHERE o_totalprice > 1000 "
         "AND o_orderdate >= TIMESTAMP('1995-01-01') "
         "AND o_orderkey IN (SELECT l_orderkey FROM lineitem l "
         " JOIN orders o ON l.l_orderkey = o.o_orderkey)")
    advice = eng.advise_layout({"q": q},
                               min_rows=0, fact_fraction=0.0, min_uses=1)
    li = [a for a in advice if a["table"] == "lineitem"
          and a["kind"] == "bucket"]
    assert li and li[0]["uses"].get("l_orderkey") == 1


# ---- interval_join binned batch path ------------------------------------

def test_offset_seconds():
    assert _offset_seconds("0 seconds") == 0.0
    assert _offset_seconds("-30 minutes") == -1800.0
    assert _offset_seconds("1 hour") == 3600.0
    assert _offset_seconds("2 days") == 172800.0
    assert _offset_seconds("500 milliseconds") == 0.5


@pytest.mark.parametrize("lo,hi", [
    ("-30 minutes", "0 seconds"),
    ("0 seconds", "1 hour"),
    ("-1 hour", "-30 minutes"),
    ("-45 minutes", "45 minutes"),
])
def test_interval_join_binned_equals_plain(spark, lo, hi):
    ev = read_parquet(spark, os.path.join(SF_DIR, "events.parquet"))
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id")
    right = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id")

    def rows(bin_join):
        return sorted(map(tuple, interval_join(
            left, right, by="user_id",
            lower_offset=lo, upper_offset=hi,
            bin_join=bin_join).collect()))

    binned, plain = rows(True), rows(False)
    assert binned == plain
    assert len(binned) > 0 or (lo, hi) == ("-1 hour", "-30 minutes")


def test_interval_join_binned_boundary_inclusive(spark):
    # rows exactly at the window bounds must survive binning
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, base, 7)], ["event_id", "ts", "user_id"])
    right = spark.createDataFrame(
        [(10, base - dt.timedelta(minutes=30), 7),   # exactly lower
         (11, base, 7),                              # exactly upper
         (12, base - dt.timedelta(minutes=30, seconds=1), 7),  # outside
         (13, base + dt.timedelta(seconds=1), 7)],   # outside
        ["event_id", "ts", "user_id"])
    out = interval_join(left, right, by="user_id",
                        lower_offset="-30 minutes",
                        upper_offset="0 seconds")
    got = sorted(r["r_event_id"] for r in out.collect())
    assert got == [10, 11]


# ---- BPE pre-tokenizer unicode-whitespace parity ------------------------

def test_bpe_pretokenize_jvm_python_parity_nbsp(spark):
    from sql_to_ibis_spark.operators.tokenize import (
        _PRETOKEN_RE, word_histogram)

    texts = ["foo bar", "a b, c!", "x\xa0y", "u\u3000v",
             "plain text."]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    jvm = {(r["word"], r["cnt"])
           for r in word_histogram(df, lowercase=False).collect()}
    from collections import Counter
    py = Counter(w for t in texts for w in _PRETOKEN_RE.findall(t))
    assert jvm == set(py.items())
    # U+00A0 is a separator, not a punctuation token, on BOTH paths
    assert not any(" " in w for w, _ in jvm)


# ---- CTE prepartition gate ----------------------------------------------

def test_cte_prepartition_forced_matches_oracle(oracle):
    sql = ("WITH big AS (SELECT o_custkey FROM orders "
           "WHERE o_totalprice > 100000), "
           "cnt AS (SELECT o_custkey, count(*) AS n FROM big "
           "GROUP BY o_custkey) "
           "SELECT n, count(*) AS n_customers FROM cnt GROUP BY n")
    os.environ["SPARK_GRAFT_PREPART_AGG"] = "1"
    try:
        oracle(sql)
    finally:
        os.environ.pop("SPARK_GRAFT_PREPART_AGG", None)


def test_cte_prepartition_gate_closed_at_small_rows(engine):
    # sf0.001 stats are far below the 2M estimate gate — no repartition
    sql = ("WITH big AS (SELECT o_custkey FROM orders "
           "WHERE o_totalprice > 100000) "
           "SELECT o_custkey, count(*) AS n FROM big GROUP BY o_custkey")
    plan = engine.query(sql)._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_COL" not in plan
