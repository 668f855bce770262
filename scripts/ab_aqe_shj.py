"""A/B: AQE runtime SortMergeJoin -> ShuffledHashJoin conversion
(spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold, default 0 = off).

Static planning keeps SMJ when neither side's ESTIMATE can build a local
hash map (e.g. q18's post-HAVING folded aggregate is estimated at the
full exchange size); AQE re-checks with REAL per-partition sizes at stage
boundaries, where the conversion is safe (guide §3.1).

    python scripts/ab_aqe_shj.py <sf_dir> [threshold] [trials] [names...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sql_to_ibis_spark.session import get_spark

CONF = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"

DEFAULT_NAMES = [
    "tpch_q18_large_volume_customer",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q5_local_supplier_volume",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    thr = sys.argv[2] if len(sys.argv) > 2 else "64m"
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    names = sys.argv[4].split(",") if len(sys.argv) > 4 else DEFAULT_NAMES
    spark = get_spark(app_name="ab_aqe_shj")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run(name: str, on: bool) -> float:
        spark.conf.set(CONF, thr if on else "0")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm-up both paths once
    for name in names:
        run(name, False)
        run(name, True)
    for name in names:
        offs, ons = [], []
        for _ in range(trials):
            offs.append(run(name, False))
            ons.append(run(name, True))
        print(f"{name}: off={statistics.median(offs):.3f}s "
              f"on({thr})={statistics.median(ons):.3f}s   "
              f"offs={[round(x,2) for x in offs]} ons={[round(x,2) for x in ons]}",
              flush=True)


if __name__ == "__main__":
    main()
