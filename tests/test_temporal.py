"""Temporal join operators: as-of join (union+window composition) and
range join (binned equi-join). Semantics pinned against hand-computed
answers; plan shape pinned so neither ever degrades to a nested-loop join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sql_to_ibis_spark.operators import temporal
from tests.test_plan_quality import plan_of


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, "A", _ts(10), 100.0),
         (2, "A", _ts(20), 101.0),
         (3, "B", _ts(5), 50.0),
         (4, "C", _ts(30), 7.0)],       # C has no quotes at all
        "trade_id long, sym string, ts timestamp, px double")
    quotes = spark.createDataFrame(
        [(10, "A", _ts(9), 99.5),
         (11, "A", _ts(10), 99.9),      # equal-ts: inclusive match
         (12, "A", _ts(15), 100.5),
         (13, "B", _ts(6), 49.0)],      # after B's only trade → no match
        "quote_id long, sym string, ts timestamp, bid double")
    return trades, quotes


def test_asof_backward_inclusive(trades_quotes):
    trades, quotes = trades_quotes
    out = temporal.asof_join(
        trades, quotes, by="sym", left_ts="ts", right_ts="ts",
        right_cols=["quote_id", "bid"])
    got = {r["trade_id"]: r["matched_quote_id"] for r in out.collect()}
    # trade 1 at :10 matches quote 11 (equal ts is inclusive, beats :09)
    # trade 2 at :20 matches quote 12 (:15, the latest at-or-before)
    # trade 3 at :05 precedes B's only quote (:06) → null
    # trade 4: key C absent from quotes → null
    assert got == {1: 11, 2: 12, 3: None, 4: None}
    assert out.count() == trades.count()  # left join: every left row kept


def test_asof_tolerance_nulls_stale_matches(trades_quotes):
    trades, quotes = trades_quotes
    out = temporal.asof_join(
        trades, quotes, by="sym", left_ts="ts", right_ts="ts",
        right_cols=["quote_id", "bid"], tolerance_seconds=120)
    got = {r["trade_id"]: r["matched_quote_id"] for r in out.collect()}
    # trade 2's best match (:15) is 5 min stale → nulled; trade 1 (0 s) kept
    assert got == {1: 11, 2: None, 3: None, 4: None}


def test_asof_tie_on_ts_picks_max_tiebreak(spark):
    left = spark.createDataFrame([(1, "K", _ts(10))],
                                 "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(7, "K", _ts(10)), (9, "K", _ts(10)), (8, "K", _ts(10))],
        "rid long, k string, ts timestamp")
    out = temporal.asof_join(left, right, by="k", left_ts="ts",
                             right_ts="ts", right_cols=["rid"])
    assert out.collect()[0]["matched_rid"] == 9


def test_asof_single_shuffle(trades_quotes):
    trades, quotes = trades_quotes
    out = temporal.asof_join(
        trades, quotes, by="sym", left_ts="ts", right_ts="ts",
        right_cols=["quote_id"])
    plan = plan_of(out, "simple")
    # one hash-partitioning exchange on the key feeds the window sort; a
    # join-based implementation would show 2+ exchanges or a nested loop
    assert plan.count("Exchange") == 1
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_boundaries_and_multibin(spark):
    points = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(10)), (3, _ts(20)), (4, _ts(59))],
        "pid long, ts timestamp")
    # interval [:10, :20] inclusive both ends; bin width 5 min → interval
    # spans 3 bins; [:58, :59] sits inside one bin
    iv = spark.createDataFrame(
        [(100, _ts(10), _ts(20)), (200, _ts(58), _ts(59))],
        "iid long, s timestamp, e timestamp")
    out = temporal.range_join(points, iv, point_ts="ts", start_ts="s",
                              end_ts="e", bin_seconds=300,
                              point_cols=["pid", "ts"],
                              interval_cols=["iid"])
    pairs = {(r["pid"], r["iid"]) for r in out.collect()}
    assert pairs == {(2, 100), (3, 100), (4, 200)}


def test_range_join_no_duplicate_pairs(spark):
    # a long interval covering many bins must still match each point once
    points = spark.createDataFrame([(1, _ts(30))], "pid long, ts timestamp")
    iv = spark.createDataFrame([(100, _ts(0), _ts(59))],
                               "iid long, s timestamp, e timestamp")
    out = temporal.range_join(points, iv, point_ts="ts", start_ts="s",
                              end_ts="e", bin_seconds=60,
                              point_cols=["pid"], interval_cols=["iid"])
    assert out.count() == 1


def test_range_join_with_key(spark):
    points = spark.createDataFrame(
        [(1, "u1", _ts(15)), (2, "u2", _ts(15))],
        "pid long, user string, ts timestamp")
    iv = spark.createDataFrame(
        [(100, "u1", _ts(10), _ts(20))],
        "iid long, user string, s timestamp, e timestamp")
    out = temporal.range_join(points, iv, point_ts="ts", start_ts="s",
                              end_ts="e", by="user", bin_seconds=300,
                              point_cols=["pid", "user"],
                              interval_cols=["iid"])
    assert [(r["pid"], r["iid"]) for r in out.collect()] == [(1, 100)]


def test_range_join_is_equi_join_not_nested_loop(spark):
    points = spark.createDataFrame([(1, _ts(30))], "pid long, ts timestamp")
    iv = spark.createDataFrame([(100, _ts(0), _ts(59))],
                               "iid long, s timestamp, e timestamp")
    out = temporal.range_join(points, iv, point_ts="ts", start_ts="s",
                              end_ts="e", bin_seconds=600,
                              point_cols=["pid"], interval_cols=["iid"])
    plan = plan_of(out)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) \
        or ("ShuffledHashJoin" in plan)


def test_asof_nulls_in_right_payload_do_not_break_match(spark):
    # a right row whose payload column is null must still count as a match
    # (last(ignorenulls) skips null PAYLOAD STRUCTS, not null fields)
    left = spark.createDataFrame([(1, "K", _ts(10))],
                                 "id long, k string, ts timestamp")
    right = spark.createDataFrame([(7, "K", _ts(9), None)],
                                  "rid long, k string, ts timestamp, v double")
    out = temporal.asof_join(left, right, by="k", left_ts="ts",
                             right_ts="ts", right_cols=["rid", "v"])
    row = out.collect()[0]
    assert row["matched_rid"] == 7 and row["matched_v"] is None
