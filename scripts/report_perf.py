"""Per-query performance report: engine vs DuckDB baseline vs previous round.

Runs bench.py's timing loop output + scripts/baseline_duckdb.py output (pass
them as files or let this script invoke both), then prints a markdown table:

    query | spark s | duckdb s | ratio | floor-adj ratio | delta vs rNN

Usage:
    python scripts/report_perf.py [bench.json] [baseline.json] [prev_bench.json]

With no args it runs both harnesses fresh (several minutes at sf0.1) and
compares against the latest BENCH_r*.json in the repo root.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_json(cmd: list[str]) -> dict:
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd=ROOT).stdout.strip().splitlines()
    return json.loads(out[-1])


def _unwrap(d: dict) -> dict:
    # driver BENCH_r*.json wraps the bench line under "parsed"
    return d.get("parsed", d)


def _latest_prev() -> dict | None:
    cands = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")),
                   key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if not cands:
        return None
    with open(cands[-1]) as f:
        return _unwrap(json.load(f))


def main() -> None:
    args = sys.argv[1:]
    if len(args) >= 2:
        bench = json.load(open(args[0]))
        base = json.load(open(args[1]))
    else:
        bench = _run_json([sys.executable, "bench.py"])
        base = _run_json([sys.executable, "scripts/baseline_duckdb.py"])
    prev = _unwrap(json.load(open(args[2]))) if len(args) >= 3 \
        else _latest_prev()

    floor = bench.get("floor_sec", 0.0)
    prev_q = (prev or {}).get("queries", {})
    rows = []
    for name, spark_s in bench["queries"].items():
        duck_s = base["queries"].get(name)
        ratio = (spark_s / duck_s) if duck_s else None
        adj = ((spark_s - floor) / duck_s) if duck_s else None
        prev_s = prev_q.get(name)
        delta = ((spark_s - prev_s) / prev_s * 100) if prev_s else None
        rows.append((name, spark_s, duck_s, ratio, adj, delta))

    print(f"floor (1-row scan → noop, best of 5): {floor:.3f} s")
    print()
    print("| query | spark s | duckdb s | ratio | floor-adj ratio | Δ vs prev |")
    print("|---|---|---|---|---|---|")
    for name, s, d, r, a, dl in rows:
        ds = f"{d:.3f}" if d is not None else "—"
        rs = f"{r:.1f}×" if r is not None else "—"
        as_ = f"{a:.1f}×" if a is not None else "—"
        dls = f"{dl:+.0f}%" if dl is not None else "new"
        print(f"| {name} | {s:.3f} | {ds} | {rs} | {as_} | {dls} |")
    tot_s = sum(s for _, s, *_ in rows)
    tot_d = sum(d for _, _, d, *_ in rows if d is not None)
    n_d = sum(1 for _, _, d, *_ in rows if d is not None)
    print(f"\ntotals: spark {tot_s:.2f} s ({len(rows)} queries), duckdb "
          f"{tot_d:.2f} s ({n_d} SQL-expressible), floor×n "
          f"{floor * n_d:.2f} s")
    regressions = [(n, dl) for n, *_, dl in rows if dl is not None and dl > 20]
    if regressions:
        print(f"\nregressions >20% vs prev: {regressions}")
    else:
        print("\nno query regressed >20% vs previous round")


if __name__ == "__main__":
    main()
