"""Interleaved A/B for the r12 NOT-EXISTS matched-keys-from-base-table
change on the q22 shape: the two-phase NOT EXISTS previously derived its
key set from the filtered outer (re-executing the scalar-avg bind +
customer scan once per consumer); it now reads the raw base relation
(single-column scan + distinct — supersets are sound).

    python scripts/ab_q22_basekeys.py <sf_dir> [trials]

The old shape has no env switch (it was simply the only code path), so
the A/B compares HEAD against the measured r11 record; this script
reports HEAD walls + plan-node counts for the record.
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
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab_q22")
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()["tpch_q22_global_sales_opportunity"]
    df = q(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    print("plan nodes:", len(plan.splitlines()),
          "exchanges:", plan.count("Exchange hashpartitioning"),
          "customer scans:", plan.count("customer.parquet"))
    print("rows:", df.count())
    walls = []
    for t in range(trials):
        t0 = time.time()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        w = time.time() - t0
        walls.append(w)
        print(f"trial {t} {w:6.2f} s", flush=True)
    print("median", round(statistics.median(walls), 3))


if __name__ == "__main__":
    main()
