"""A/B harness: runtime bloom-filter thresholds at bench scale.

Spark injects runtime bloom filters (semi-join reduction of a shuffle join's
big side) only when the application-side scan exceeds 10 GB — correct on a
cluster, never true at local bench scale. This measures aligned thresholds.

    python scripts/ab_bloom.py <sf_dir> <query,names> <trials>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sql_to_ibis_spark.session import get_spark

CONFS = {
    "A-default": {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
    },
    "B-bloom": {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "64MB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "64MB",
    },
}


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="ab_bloom")
    qs = entrymod.queries()
    qs["tpch_q6_forecast_revenue"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    results: dict[tuple[str, str], list[float]] = {}
    for trial in range(trials):
        for label, conf in CONFS.items():
            for k, v in conf.items():
                spark.conf.set(k, v)
            for name in names:
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                dt = time.time() - t0
                results.setdefault((label, name), []).append(dt)
                print(f"trial{trial} {label:10s} {name}: {dt:.3f}s",
                      flush=True)
    print("\n== min per (conf, query) ==")
    for (label, name), ts in sorted(results.items(), key=lambda kv: kv[0][1]):
        print(f"{label:10s} {name}: min {min(ts):.3f}s "
              f"runs={[round(t, 2) for t in ts]}")


if __name__ == "__main__":
    main()
