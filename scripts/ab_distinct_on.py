"""DISTINCT ON lowering A/B: r15 min_by/max_by aggregate vs the prior
row_number-window form, on the declared `distinct_on_latest_event`
statement, through the real engine.

    python scripts/ab_distinct_on.py <sf_dir> [trials]

The window arm is produced by disabling Compiler._distinct_on_aggregate
in-process (the caller then falls back to the window lowering), so both
arms run interleaved in ONE session and machine drift hits them equally.
Correctness gate: the per-user picked `ts` must agree exactly (the
picked row among equal-ts ties is implementation-defined in BOTH forms,
so event_id is not compared on tie groups).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_to_ibis_spark import SqlEngine
from sql_to_ibis_spark.plans.compiler import Compiler
from sql_to_ibis_spark.session import get_spark

SQL = ("SELECT DISTINCT ON (user_id) user_id, event_id, ts, value "
       "FROM events ORDER BY user_id, ts DESC")

_real = Compiler._distinct_on_aggregate


def _set_mode(mode: str) -> None:
    Compiler._distinct_on_aggregate = (
        _real if mode == "agg" else (lambda self, *a, **k: None))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab_distinct_on")
    spark.sparkContext.setLogLevel("ERROR")
    eng = SqlEngine(spark)
    eng.register_dir(sf_dir)
    eng.analyze()

    def build(mode: str):
        _set_mode(mode)
        return eng.query(SQL)

    def run(mode: str) -> float:
        df = build(mode)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    picks = {}
    for mode in ("agg", "window"):
        rows = build(mode).select("user_id", "ts").collect()
        picks[mode] = {r[0]: r[1] for r in rows}
        plan = build(mode)._jdf.queryExecution().optimizedPlan().toString()
        print(f"{mode:6s}: groups={len(picks[mode])} "
              f"window_nodes={plan.count('Window ')} "
              f"aggregates={plan.count('Aggregate ')}")
    if picks["agg"] != picks["window"]:
        print("PICK MISMATCH"); sys.exit(1)
    print("per-user picked ts identical")

    run("agg"); run("window")  # warm both paths
    best = {"agg": float("inf"), "window": float("inf")}
    for t in range(trials):
        for mode in ("agg", "window"):
            dt = run(mode)
            best[mode] = min(best[mode], dt)
            print(f"trial {t} {mode:6s}: {dt:.3f}s", flush=True)
    _set_mode("agg")
    print({m: round(b, 3) for m, b in best.items()})


if __name__ == "__main__":
    main()
