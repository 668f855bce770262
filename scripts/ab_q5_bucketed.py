"""Interleaved probe: does the orderkey-bucketed fact layout lift q5
(its one ShuffledHashJoin is orders x lineitem ON orderkey)? q5 was
never in the tracked dual-layout block; q8/q10 certified neutral in r15.

    python scripts/ab_q5_bucketed.py <sf_dir> [trials] [names...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sql_to_ibis_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else [
        "tpch_q5_local_supplier_volume"]
    spark = get_spark(app_name="ab_q5_bucketed")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def set_layout(bucketed: bool) -> None:
        if bucketed:
            os.environ["SPARK_GRAFT_BUCKETED_FACTS"] = "1"
        else:
            os.environ.pop("SPARK_GRAFT_BUCKETED_FACTS", None)

    def run(name: str, bucketed: bool) -> float:
        set_layout(bucketed)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    set_layout(False)
    entrymod._engine_for(spark, sf_dir)
    set_layout(True)
    entrymod._engine_for(spark, sf_dir)   # snapshot cost outside the loop

    for name in names:
        run(name, False)
        run(name, True)
        stock, buck = [], []
        for _ in range(trials):
            stock.append(run(name, False))
            buck.append(run(name, True))
        print(f"{name}: stock={statistics.median(stock):.3f}s "
              f"bucketed={statistics.median(buck):.3f}s   "
              f"stock={[round(x, 2) for x in stock]} "
              f"buck={[round(x, 2) for x in buck]}", flush=True)
    set_layout(False)


if __name__ == "__main__":
    main()
