"""Interleaved A/B of the star semi-join reduction pass.

    python scripts/ab_semired.py <sf_dir> <query,names> <trials>

The pass reads SPARK_GRAFT_NO_SEMIJOIN_REDUCTION at compile time, so both
arms compile in one session; trials interleave so machine drift hits both
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
    names = sys.argv[2].split(",")
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark(app_name="ab_semired")
    qs = entrymod.queries()
    qs["tpch_q6_forecast_revenue"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    res: dict[tuple[str, str], list[float]] = {}
    for trial in range(trials):
        for label, env in (("reduced", ""), ("plain", "1")):
            if env:
                os.environ["SPARK_GRAFT_NO_SEMIJOIN_REDUCTION"] = env
            else:
                os.environ.pop("SPARK_GRAFT_NO_SEMIJOIN_REDUCTION", None)
            for name in names:
                df = qs[name](spark, sf_dir)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                res.setdefault((name, label), []).append(dt)
                print(f"trial{trial} {label:8s} {name}: {dt:.3f}s",
                      flush=True)
    print("\n== min per (query, arm) ==")
    for (name, label), ts in sorted(res.items()):
        print(f"{name} {label}: min {min(ts):.3f}s "
              f"runs={[round(t, 2) for t in ts]}")


if __name__ == "__main__":
    main()
