"""Build-side keyset reduction for correlated semi/anti joins
(compiler.py `_maybe_reduce_semi_build`): a semi/anti probe's verdict
depends only on the inner columns the join condition references, so the
build side is projected to those columns and distinct'd, then broadcast
when the footer-stats estimator certifies the key set small AND the
per-task key multiplicity high enough that the map-side distinct
actually collapses the exchange.

Measured r13 at sf10 (same-session interleaved): the high-multiplicity
shape (15M-row outer ⋉ lineitem on l_suppkey, ndv 100k, multiplicity
600) 0.77 s reduced vs 1.96 s stock SortMergeJoin (−60%); the q22 shape
(orders on o_custkey, multiplicity 15 across 32 tasks → per-task < 1)
1.73 s reduced vs 1.25 s stock — hence the multiplicity gate.
SPARK_GRAFT_SEMI_BUILD_KEYSET=0 disables, =1 forces (skips stats gates).
"""

from __future__ import annotations

from tests.conftest import compare_frames

HIGH_MULT_SEMI = """
    SELECT count(*) AS n FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = o.o_custkey AND l.l_quantity > 25)
"""

HIGH_MULT_ANTI = """
    SELECT count(*) AS n FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = o.o_custkey
                        AND l.l_quantity > 25)
"""

Q22_SHAPE = """
    SELECT cntrycode, count(*) AS numcust FROM (
      SELECT substring(c_name, 10, 2) AS cntrycode FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey)) t
    GROUP BY cntrycode ORDER BY cntrycode
"""


def test_forced_reduction_matches_stock_semi(engine, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SEMI_BUILD_KEYSET", "0")
    stock = engine.query(HIGH_MULT_SEMI).toPandas()
    monkeypatch.setenv("SPARK_GRAFT_SEMI_BUILD_KEYSET", "1")
    reduced = engine.query(HIGH_MULT_SEMI).toPandas()
    compare_frames(stock, reduced, ordered=True)


def test_forced_reduction_matches_stock_anti(engine, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SEMI_BUILD_KEYSET", "0")
    stock = engine.query(HIGH_MULT_ANTI).toPandas()
    monkeypatch.setenv("SPARK_GRAFT_SEMI_BUILD_KEYSET", "1")
    reduced = engine.query(HIGH_MULT_ANTI).toPandas()
    compare_frames(stock, reduced, ordered=True)


def test_forced_reduction_q22_shape_values(engine, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SEMI_BUILD_KEYSET", "0")
    stock = engine.query(Q22_SHAPE).toPandas()
    monkeypatch.setenv("SPARK_GRAFT_SEMI_BUILD_KEYSET", "1")
    reduced = engine.query(Q22_SHAPE).toPandas()
    compare_frames(stock, reduced, ordered=True)


def test_forced_plan_is_broadcast_distinct(engine, monkeypatch):
    # signature: the build side becomes a distinct key projection under
    # an explicit broadcast — no SortMergeJoin, and a HashAggregate
    # with the key as its only grouping appears below the join
    monkeypatch.setenv("SPARK_GRAFT_SEMI_BUILD_KEYSET", "1")
    plan = engine.explain(HIGH_MULT_SEMI)
    assert "SortMergeJoin" not in plan, plan
    assert "LeftSemi" in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_null_keys_never_match(engine, monkeypatch):
    # NULL build keys survive the distinct but never match the equality
    # condition — anti keeps NULL-key-free semantics identical to stock
    sql = """
        SELECT count(*) AS n FROM orders o
        WHERE NOT EXISTS (
          SELECT 1 FROM lineitem l
          WHERE (CASE WHEN l.l_linenumber = 1 THEN NULL
                      ELSE l.l_suppkey END) = o.o_custkey)
    """
    monkeypatch.setenv("SPARK_GRAFT_SEMI_BUILD_KEYSET", "0")
    stock = engine.query(sql).toPandas()
    monkeypatch.setenv("SPARK_GRAFT_SEMI_BUILD_KEYSET", "1")
    reduced = engine.query(sql).toPandas()
    compare_frames(stock, reduced, ordered=True)


def test_auto_gate_closed_without_stats(engine, monkeypatch):
    # un-analyzed engine: no certification possible → stock plan
    monkeypatch.delenv("SPARK_GRAFT_SEMI_BUILD_KEYSET", raising=False)
    plan = engine.explain(HIGH_MULT_SEMI)
    # either the stats were collected by a prior analyze() in this
    # session (then the reduced signature is fine) or the join is the
    # stock semi — never an unguarded broadcast of a raw fact
    assert "LeftSemi" in plan, plan


def test_duplicate_qualified_and_bare_refs_project_once(engine, monkeypatch):
    # r13 ADVICE: the same inner attribute referenced both qualified
    # (l.l_suppkey) and bare (l_suppkey) across correlation conjuncts
    # must dedup by RESOLVED identity — a double projection makes the
    # reduced build frame ambiguous for the join condition
    sql = """
        SELECT count(*) AS n FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = o.o_custkey
                        AND l_suppkey >= o.o_custkey)
    """
    monkeypatch.setenv("SPARK_GRAFT_SEMI_BUILD_KEYSET", "0")
    stock = engine.query(sql).toPandas()
    monkeypatch.setenv("SPARK_GRAFT_SEMI_BUILD_KEYSET", "1")
    reduced = engine.query(sql).toPandas()
    compare_frames(stock, reduced, ordered=True)


def test_auto_gate_uses_measured_key_width(engine, monkeypatch):
    # r13 ADVICE: certification must price the key column at its
    # measured footer width, not a flat 24B — a wide string key whose
    # keyset materializes >32MB must NOT certify. Fake the stats both
    # ways on the same shape and assert the gate flips.
    from sql_to_ibis_spark.sources.table_stats import TableStats

    monkeypatch.delenv("SPARK_GRAFT_SEMI_BUILD_KEYSET", raising=False)
    lentry = engine.catalog.get("lineitem")
    oentry = engine.catalog.get("orders")
    saved_l, saved_o = lentry.stats, oentry.stats

    def fake(width: float) -> TableStats:
        return TableStats(rows=20_000_000,
                          ndv={"l_suppkey": 100_000.0},
                          col_bytes={"l_suppkey": width})

    def plan_is_reduced(plan: str) -> bool:
        # reduced build = distinct aggregate keyed on l_suppkey below
        # an explicit broadcast; stock semi has no such aggregate
        return "BroadcastExchange" in plan and \
            any("l_suppkey" in ln for ln in plan.splitlines()
                if "Keys" in ln or "keys=" in ln)

    try:
        oentry.stats = TableStats(rows=20_000_000)
        # narrow key (8B): 100k keys * ~24B ≈ 2.4MB → certifies
        lentry.stats = fake(8.0)
        assert plan_is_reduced(engine.explain(HIGH_MULT_SEMI))
        # wide key (5kB, e.g. URL fingerprints): 100k * ~5kB ≈ 500MB
        # → the flat-24B estimate would certify; measured width must not
        lentry.stats = fake(5000.0)
        assert not plan_is_reduced(engine.explain(HIGH_MULT_SEMI))
    finally:
        lentry.stats, oentry.stats = saved_l, saved_o
