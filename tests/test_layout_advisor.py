"""Layout advisor (r14): engine.advise_layout() recommends per-table
bucket keys from footer stats + a SQL workload; apply_layout()
materializes them via snapshot_bucketed. The bench dual-layout block
keys off this advisor (via __spark_entry__._engine_for) instead of a
hardcoded table list.
"""

from __future__ import annotations

import pytest

from sql_to_ibis_spark import SqlEngine
from tests.conftest import SF_DIR

WORKLOAD = {
    "joinA": """SELECT count(*) AS n FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey""",
    "joinB": """SELECT o.o_orderpriority, count(*) AS n FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                GROUP BY o.o_orderpriority""",
    "aggA": """SELECT l_orderkey, sum(l_quantity) AS q FROM lineitem
               GROUP BY l_orderkey""",
    "lowcard": """SELECT l_returnflag, count(*) AS n FROM lineitem
                  GROUP BY l_returnflag""",
}


@pytest.fixture(scope="module")
def aeng(spark) -> SqlEngine:
    eng = SqlEngine(spark)
    eng.register_dir(SF_DIR)
    eng.analyze()
    return eng


def test_advises_join_key_on_fact(aeng):
    advice = aeng.advise_layout(WORKLOAD, min_rows=100)
    by_table = {a["table"]: a for a in advice}
    assert "lineitem" in by_table
    assert by_table["lineitem"]["bucket_cols"] == ["l_orderkey"]
    # usage counts: 2 join conjuncts + 1 group-by = 3
    assert by_table["lineitem"]["uses"]["l_orderkey"] == 3
    assert set(by_table["lineitem"]["queries"]) == {"joinA", "joinB",
                                                    "aggA"}


def test_low_cardinality_key_never_wins(aeng):
    # l_returnflag (NDV 3) has a group-by vote but must be filtered by
    # the NDV gate even if it out-votes the join key
    wl = {f"q{i}": WORKLOAD["lowcard"] for i in range(10)}
    wl["join"] = WORKLOAD["joinA"]
    wl["join2"] = WORKLOAD["joinB"]
    advice = aeng.advise_layout(wl, min_rows=100)
    for a in advice:
        assert a["bucket_cols"] != ["l_returnflag"]


def test_small_tables_excluded(aeng):
    advice = aeng.advise_layout(
        {"q": "SELECT r_name, count(*) AS n FROM region GROUP BY r_name"},
        min_rows=100)
    assert all(a["table"] != "region" for a in advice)


def test_extra_keys_channel(aeng):
    advice = aeng.advise_layout(
        {}, min_rows=10,
        extra_keys=[("documents", "doc_id"), ("documents", "doc_id")])
    by_table = {a["table"]: a for a in advice}
    assert "documents" in by_table
    assert by_table["documents"]["bucket_cols"] == ["doc_id"]


def test_min_uses_gate(aeng):
    advice = aeng.advise_layout({"q": WORKLOAD["joinA"]}, min_rows=100,
                                min_uses=5)
    assert advice == []


RANGE_WORKLOAD = {
    "monthA": """SELECT sum(l_extendedprice) AS v FROM lineitem
                 WHERE l_shipdate >= '1996-01-01'
                   AND l_shipdate < '1996-02-01'""",
    "year": """SELECT count(*) AS n FROM lineitem
               WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-12-31'""",
    "flag": """SELECT count(*) AS n FROM lineitem
               WHERE l_returnflag < 'R'""",
}


def test_advises_cluster_on_range_predicates(aeng):
    advice = aeng.advise_layout(RANGE_WORKLOAD, min_rows=100)
    clustered = [a for a in advice if a["kind"] == "cluster"]
    assert len(clustered) == 1
    a = clustered[0]
    assert a["table"] == "lineitem"
    # l_shipdate: 3 range votes (2 from monthA, 1 BETWEEN); the string
    # column l_returnflag is range-filtered but NOT orderable-clusterable
    assert a["cluster_cols"] == ["l_shipdate"]
    assert a["uses"]["l_shipdate"] == 3
    assert "l_returnflag" not in a["uses"]
    assert set(a["queries"]) == {"monthA", "year"}
    # footer-estimated admission of the best (one-month) predicate is
    # a small fraction of the ~7-year shipdate domain
    assert a["best_admission"] is not None
    assert a["best_admission"] < 0.10


def test_apply_layout_routes_cluster_to_zorder(spark, tmp_path):
    eng = SqlEngine(spark)
    eng.register_dir(SF_DIR)
    advice = eng.advise_layout(RANGE_WORKLOAD, min_rows=100)
    target = [a for a in advice if a["kind"] == "cluster"]
    assert target and target[0]["table"] == "lineitem"
    before = eng.query(
        "SELECT count(*) AS n, sum(l_quantity) AS q FROM lineitem"
    ).collect()[0]
    eng.apply_layout(target, refresh=True)
    after = eng.query(
        "SELECT count(*) AS n, sum(l_quantity) AS q FROM lineitem"
    ).collect()[0]
    assert tuple(before) == tuple(after)


def test_one_layout_per_table(spark):
    # bucket advice outranks cluster advice for the same table →
    # apply_layout materializes the bucketed snapshot, not the zorder
    eng = SqlEngine(spark)
    eng.register_dir(SF_DIR)
    eng.analyze()
    wl = dict(WORKLOAD)
    wl.update(RANGE_WORKLOAD)
    advice = eng.advise_layout(wl, min_rows=100)
    lineitem = [a for a in advice if a["table"] == "lineitem"]
    assert [a["kind"] for a in lineitem] == ["bucket", "cluster"]
    eng.apply_layout(lineitem, refresh=True)
    plan = (eng.query("SELECT l_orderkey, sum(l_quantity) AS q "
                      "FROM lineitem GROUP BY l_orderkey")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


def test_ndv_survives_layout_swap(spark):
    # snapshot stats come from the new files' footers, which cannot
    # carry NDV — analyze()'d NDV must survive the registration swap
    # or post-layout advice loses its low-cardinality gate
    eng = SqlEngine(spark)
    eng.register_dir(SF_DIR)
    eng.analyze()
    before = dict(eng.catalog.get("lineitem").stats.ndv)
    assert before
    eng.apply_layout(eng.advise_layout(WORKLOAD, min_rows=100),
                     refresh=True)
    assert eng.catalog.get("lineitem").stats.ndv == before
    # and the advice itself is unchanged post-swap
    advice = eng.advise_layout(WORKLOAD, min_rows=100)
    by_table = {a["table"]: a for a in advice if a["kind"] == "bucket"}
    assert by_table["lineitem"]["bucket_cols"] == ["l_orderkey"]


def test_apply_layout_roundtrip(spark):
    eng = SqlEngine(spark)
    eng.register_dir(SF_DIR)
    eng.analyze()
    advice = eng.advise_layout(WORKLOAD, min_rows=100)
    target = [a for a in advice if a["table"] == "lineitem"]
    before = eng.query("SELECT count(*) AS n FROM lineitem").collect()[0][0]
    eng.apply_layout(target, refresh=True)
    after = eng.query("SELECT count(*) AS n FROM lineitem").collect()[0][0]
    assert before == after
    # bucketed scan: a groupBy on the bucket key plans without exchange
    plan = (eng.query("SELECT l_orderkey, sum(l_quantity) AS q "
                      "FROM lineitem GROUP BY l_orderkey")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


def test_entry_harness_advises_the_proven_set(spark):
    # the bench layout block derives {lineitem(l_orderkey),
    # orders(o_orderkey), documents(doc_id)} from the entry workload —
    # pin the advisor output so a workload drift is visible
    import __spark_entry__ as em

    eng = SqlEngine(spark)
    eng.register_dir(SF_DIR)
    eng.analyze()
    advice = eng.advise_layout(
        {n: s for n, (s, _) in em._PAIRS.items()},
        extra_keys=[("documents", "doc_id"), ("documents", "doc_id")],
        min_rows=100)
    got = {a["table"]: a["bucket_cols"] for a in advice
           if a["kind"] == "bucket"}
    assert got.get("lineitem") == ["l_orderkey"]
    assert got.get("orders") == ["o_orderkey"]
    assert got.get("documents") == ["doc_id"]
    # the date-windowed TPC-H entries (q1/q3/q6/q14/q15/q20…) vote
    # l_shipdate as lineitem's cluster column
    clustered = {a["table"]: a["cluster_cols"] for a in advice
                 if a["kind"] == "cluster"}
    assert clustered.get("lineitem") == ["l_shipdate"]
