"""The bench one-line output is a driver-facing contract: it must carry
EVERY headline query with zero `_other` folds (r15 judge item 1 — the
fold nondeterministically dropped 4 queries from the driver's per-query
tracking). This test rebuilds the line exactly as bench.py does, at
worst-case field widths, and asserts it fits the driver's ~2000-char
stdout-tail window with margin."""

from __future__ import annotations

import json

import bench


def _worst_case_line() -> str:
    # every query at a 3-digit-seconds worst case (999.99 → 6 chars, the
    # widest a 2-decimal sub-hour entry can be)
    compact = {bench.short(k): 999.99 for k in bench.HEADLINE}
    assert len(compact) == len(bench.HEADLINE), "short-key collision"
    out = {
        "metric": "headline_queries_total_wall",
        "value": 99999.9999, "value_engine": 99999.9999,
        "unit": "sec", "queries": compact, "floor_sec": 0.0999,
        "sf": 100.0, "cpus": 32,
        "full": "bench_results/bench_full_sf0.001_20991231T235959.json",
        "canary": [999.999, 999.999],
        "reran": 99,
    }
    return json.dumps(out, separators=(",", ":"))


def test_line_fits_with_zero_folds():
    line = _worst_case_line()
    assert len(line) <= 1900, (
        f"bench output line is {len(line)} chars at worst case; the "
        "driver parses ~2000 chars of stdout tail and bench.py folds "
        "above 1900 — shrink the line (the fold drops queries from the "
        "driver record)")


def test_short_keys_unique():
    shorts = [bench.short(k) for k in bench.HEADLINE]
    assert len(set(shorts)) == len(shorts)
