"""Interleaved A/B for the q21 <>-EXISTS rewrites: stock semi/anti vs
the r11 fused aggregate-join vs the r12 self-table window plan.

    python scripts/ab_nx_window.py <sf_dir> [trials]

Prints per-trial walls and medians for each mode in the same session
(interleaved A/B/C so ambient drift hits all modes equally).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sql_to_ibis_spark.session import get_spark

MODES = [
    ("stock", {"SPARK_GRAFT_NEQ_EXISTS_AGG": "0",
               "SPARK_GRAFT_NEQ_EXISTS_WINDOW": "0"}),
    ("agg",   {"SPARK_GRAFT_NEQ_EXISTS_AGG": "1",
               "SPARK_GRAFT_NEQ_EXISTS_WINDOW": "0"}),
    ("window", {"SPARK_GRAFT_NEQ_EXISTS_AGG": "0",
                "SPARK_GRAFT_NEQ_EXISTS_WINDOW": "1"}),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="ab_nx_window")
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()["tpch_q21_suppliers_kept_waiting"]
    walls: dict[str, list[float]] = {m: [] for m, _ in MODES}
    counts: dict[str, int] = {}
    # warm the page cache once (unmeasured)
    for name, env in MODES:
        for k, v in env.items():
            os.environ[k] = v
        entrymod._ENGINES.clear()
        counts[name] = q(spark, sf_dir).count()
    assert len(set(counts.values())) == 1, counts
    for t in range(trials):
        for name, env in MODES:
            for k, v in env.items():
                os.environ[k] = v
            # the engine cache only holds registrations + footer stats;
            # the gates re-read env at every compile
            t0 = time.time()
            q(spark, sf_dir).count()
            wall = time.time() - t0
            walls[name].append(wall)
            print(f"trial {t} {name:7s} {wall:7.2f} s", flush=True)
    for _, env in MODES:
        for k in env:
            os.environ.pop(k, None)
    print({m: round(statistics.median(w), 2) for m, w in walls.items()},
          "rows:", counts)


if __name__ == "__main__":
    main()
