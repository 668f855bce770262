"""Interleaved A/B: sort-merge vs shuffled-hash join preference.

    python scripts/ab_shj.py <sf_dir> <query,names> <trials>

`spark.sql.join.preferSortMergeJoin` is read at planning time, so both
arms compile inside one session; trials interleave arms so machine drift
hits both equally.
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
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="ab_shj")
    qs = entrymod.queries()
    qs["tpch_q6_forecast_revenue"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    res: dict[tuple[str, str], list[float]] = {}
    for trial in range(trials):
        for label, pref in (("smj", "true"), ("shj", "false")):
            spark.conf.set("spark.sql.join.preferSortMergeJoin", pref)
            for name in names:
                df = qs[name](spark, sf_dir)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                res.setdefault((name, label), []).append(dt)
                print(f"trial{trial} {label} {name}: {dt:.3f}s", flush=True)
    print("\n== min per (query, conf) ==")
    for (name, label), ts in sorted(res.items()):
        print(f"{name} {label}: min {min(ts):.3f}s "
              f"runs={[round(t, 2) for t in ts]}")


if __name__ == "__main__":
    main()
