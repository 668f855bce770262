"""Persist-mode pin lifecycle (r11 ADVICE): frames the compiler pins
with persist(MEMORY_AND_DISK) are tracked on the engine and released at
the next query()/release_pinned(), so long-lived sessions hold at most
one query's pinned cache instead of accumulating until the
ContextCleaner runs."""

from __future__ import annotations


CTE_SHARE = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(l_quantity) AS double) AS total_revenue
      FROM lineitem GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
"""


def test_persist_pins_tracked_and_released(engine, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "persist")
    df = engine.query(CTE_SHARE)
    df.collect()
    # the CTE-scalar attach pinned at least one frame this query
    assert len(engine._pinned_frames) >= 1
    pinned = list(engine._pinned_frames)
    assert all(f.storageLevel.useMemory or f.storageLevel.useDisk
               for f in pinned)
    # next query releases the previous pins
    engine.query("SELECT count(*) AS n FROM region").collect()
    assert all(not (f.storageLevel.useMemory or f.storageLevel.useDisk)
               for f in pinned)
    engine.release_pinned()
    assert engine._pinned_frames == []


def test_checkpoint_mode_tracks_nothing(engine, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_PIN_MODE", raising=False)
    engine.query(CTE_SHARE).collect()
    assert engine._pinned_frames == []
