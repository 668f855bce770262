"""repetition_signals plan A/B: docpart (one raw-corpus exchange) vs
split (level-1 count exchange + two level-2 exchanges + join) vs fused
(one level-2 sort-aggregate, no join).

    python scripts/ab_repetition.py <sf_dir> [trials]

Interleaves the variants so machine drift hits all sides equally;
verifies the three produce identical results first, and prints each
variant's exchange count from the executed plan.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_to_ibis_spark.operators.text import repetition_signals
from sql_to_ibis_spark.session import get_spark
from sql_to_ibis_spark.sources.readers import read_parquet

PLANS = ("docpart", "split", "fused")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab_repetition")
    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))

    def run(plan: str) -> float:
        t0 = time.perf_counter()
        repetition_signals(docs, plan=plan).write.format("noop") \
            .mode("overwrite").save()
        return time.perf_counter() - t0

    # identical results across variants (sorted collect compare)
    base = None
    for plan in PLANS:
        df = repetition_signals(docs, plan=plan)
        rows = sorted(map(tuple, df.collect()))
        exe = df._jdf.queryExecution().executedPlan().toString()
        nex = exe.count("Exchange") - exe.count("ExchangeReuse")
        nsort = exe.count("SortAggregate")
        print(f"{plan:8s}: rows={len(rows)} exchanges={nex} "
              f"sortaggs={nsort}")
        if base is None:
            base = rows
        else:
            assert rows == base, f"{plan} results differ from docpart"

    for plan in PLANS:
        run(plan)  # warm
    times: dict[str, list[float]] = {p: [] for p in PLANS}
    for _ in range(trials):
        for plan in PLANS:
            times[plan].append(run(plan))
    for plan in PLANS:
        med = statistics.median(times[plan])
        print(f"{plan:8s}: {med:.3f}s  "
              f"{sorted(round(x, 3) for x in times[plan])}")


if __name__ == "__main__":
    main()
