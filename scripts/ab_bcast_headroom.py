"""Headroom probe: how much do the remaining SHJ exchanges cost on the
mid-tail join pyramids (q5/q8/q10)? Raises the RUNTIME broadcast
threshold (spark.sql.autoBroadcastJoinThreshold, a per-session SQL conf)
so the planner statically broadcasts the sub-64MB join sides the footer
estimator's tree-shaped pricing misses, and interleaves against the
default. This is a MEASUREMENT, not a shipping config — r12 measured and
rejected the blanket 64m static threshold (it let a column-pruned fact
broadcast); if the probe shows real headroom the ship vehicle is a
semi-aware estimator hint, not this knob.

    python scripts/ab_bcast_headroom.py <sf_dir> [threshold] [trials]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sql_to_ibis_spark.session import get_spark

NAMES = [
    "tpch_q5_local_supplier_volume",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    thr = sys.argv[2] if len(sys.argv) > 2 else "64m"
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    names = sys.argv[4].split(",") if len(sys.argv) > 4 else NAMES
    spark = get_spark(app_name="ab_bcast_headroom")
    spark.sparkContext.setLogLevel("ERROR")
    default = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    qs = entrymod.queries()

    def run(name: str, wide: bool) -> float:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       thr if wide else default)
        spark.sparkContext.setJobDescription(f"{name} thr={'wide' if wide else 'def'}")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    for name in names:
        run(name, False)
        run(name, True)
        wide, base = [], []
        for _ in range(trials):
            base.append(run(name, False))
            wide.append(run(name, True))
        print(f"{name}: default={statistics.median(base):.3f}s "
              f"thr[{thr}]={statistics.median(wide):.3f}s   "
              f"base={[round(x, 2) for x in base]} "
              f"wide={[round(x, 2) for x in wide]}", flush=True)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", default)


if __name__ == "__main__":
    main()
