"""A/B: Arrow batch width for the minhash signature pipeline
(VERDICT r15 stretch item): the signature kernel is numpy
memory-bandwidth-bound, but each Arrow batch pays a fixed
object-conversion overhead (list<int64> -> per-row numpy arrays and
back). Widening spark.sql.execution.arrow.maxRecordsPerBatch amortizes
that overhead over more rows per batch — or doesn't, if bandwidth
dominates. Runtime SQL conf, so both widths interleave in one session.

    python scripts/ab_minhash_batch.py <sf_dir> [width] [trials]
"""

from __future__ import annotations

import statistics
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sql_to_ibis_spark.session import get_spark

NAMES = ["pipeline_dedup_minhash_lsh", "pipeline_dedup_clusters"]
CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    width = sys.argv[2] if len(sys.argv) > 2 else "40000"
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="ab_minhash_batch")
    spark.sparkContext.setLogLevel("ERROR")
    default = spark.conf.get(CONF, "10000")
    qs = entrymod.queries()

    def run(name: str, wide: bool) -> float:
        spark.conf.set(CONF, width if wide else default)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in NAMES:
        run(name, False)
        run(name, True)
        base, wide_t = [], []
        for _ in range(trials):
            base.append(run(name, False))
            wide_t.append(run(name, True))
        print(f"{name}: default[{default}]={statistics.median(base):.3f}s "
              f"wide[{width}]={statistics.median(wide_t):.3f}s   "
              f"base={[round(x, 2) for x in base]} "
              f"wide={[round(x, 2) for x in wide_t]}", flush=True)
    spark.conf.set(CONF, default)


if __name__ == "__main__":
    main()
