"""Interleaved A/B of the window-decorrelation rewrite on the q17 shape.

    python scripts/ab_q17.py <sf_dir> <trials>

Both variants compile in the same session (the rewrite is toggled per
compile via SPARK_GRAFT_NO_WINDOW_DECORRELATE), so machine drift hits both
arms equally.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sql_to_ibis_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    name = "subquery_correlated_scalar_q17"
    spark = get_spark(app_name="ab_q17")
    qs = entrymod.queries()
    qs["tpch_q6_forecast_revenue"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    res: dict[str, list[float]] = {"window": [], "join": []}
    for trial in range(trials):
        for label, env in (("window", ""), ("join", "1")):
            if env:
                os.environ["SPARK_GRAFT_NO_WINDOW_DECORRELATE"] = env
            else:
                os.environ.pop("SPARK_GRAFT_NO_WINDOW_DECORRELATE", None)
            df = qs[name](spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            res[label].append(dt)
            print(f"trial{trial} {label:7s}: {dt:.3f}s", flush=True)
    for label, ts in res.items():
        print(f"{label}: min {min(ts):.3f}s runs={[round(t, 2) for t in ts]}")


if __name__ == "__main__":
    main()
