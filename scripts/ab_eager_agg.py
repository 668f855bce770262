"""Eager-aggregation A/B: stock plan vs group-by pushdown below the
dimension join (compiler._try_eager_aggregation) on the Q10 shape.

    python scripts/ab_eager_agg.py <sf_dir> [trials]

Interleaves the two modes (env-forced off vs on) so machine drift hits
both sides equally, and prints per-mode medians plus the aggregate
count of each optimized plan.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_to_ibis_spark import SqlEngine
from sql_to_ibis_spark.session import get_spark

Q10 = (
    "SELECT c.c_custkey, c.c_name, "
    "CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS decimal(18,4))) "
    "AS double) AS revenue, c.c_acctbal, n.n_name "
    "FROM customer c "
    "JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "WHERE o.o_orderdate >= TIMESTAMP('1995-01-01') "
    "AND o.o_orderdate < TIMESTAMP('1995-07-01') "
    "AND l.l_returnflag = 'R' "
    "GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name "
    "ORDER BY revenue DESC, c.c_custkey LIMIT 20")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab_eager_agg")
    eng = SqlEngine(spark)
    eng.register_dir(sf_dir)
    eng.analyze()

    def run(mode: str) -> float:
        os.environ["SPARK_GRAFT_EAGER_AGG"] = mode
        t0 = time.perf_counter()
        eng.query(Q10).collect()
        return time.perf_counter() - t0

    for mode in ("0", "1"):
        os.environ["SPARK_GRAFT_EAGER_AGG"] = mode
        n = eng.query(Q10)._jdf.queryExecution().optimizedPlan() \
            .toString().count("Aggregate ")
        print(f"mode={mode}: {n} logical aggregates")
    run("0"); run("1")  # warm both paths
    offs, ons = [], []
    for _ in range(trials):
        offs.append(run("0"))
        ons.append(run("1"))
    os.environ.pop("SPARK_GRAFT_EAGER_AGG", None)
    off_m, on_m = statistics.median(offs), statistics.median(ons)
    print(f"stock : {off_m:.3f}s  {sorted(round(x, 3) for x in offs)}")
    print(f"eager : {on_m:.3f}s  {sorted(round(x, 3) for x in ons)}")
    print(f"delta : {100 * (on_m - off_m) / off_m:+.1f}%")


if __name__ == "__main__":
    main()
