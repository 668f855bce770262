"""Bucketed-layout A/B for q18 (BASELINE.md 'q18 at sf10' decomposition).

q18's residual gap is structural in the stock layout: lineitem is
exchanged twice (once for the HAVING subquery's groupBy(l_orderkey),
once for the orders join) and orders once. With lineitem and orders
bucketed on the order key — the layout a real deployment would choose
for an order-grain fact — all three exchanges disappear: the groupBy
reuses the bucket partitioning and the join is storage-co-located.

    python scripts/ab_q18_bucketed.py <sf_dir> [buckets] [trials]

Writes bucketed managed tables into spark-warehouse/ on first run (reused
after), then interleaves stock vs bucketed timings and prints exchange
counts for both plans.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sql_to_ibis_spark import SqlEngine
from sql_to_ibis_spark.session import get_spark
from sql_to_ibis_spark.sources import sinks
from sql_to_ibis_spark.sources.readers import read_parquet

Q18 = (
    "SELECT c_name, o.o_orderkey, o_totalprice, "
    "CAST(sum(CAST(l_quantity AS decimal(18,2))) AS double) AS total_qty "
    "FROM customer c "
    "JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
    "WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem "
    "GROUP BY l_orderkey HAVING sum(l_quantity) > 200) "
    "GROUP BY c_name, o.o_orderkey, o_totalprice "
    "ORDER BY o_totalprice DESC, o.o_orderkey LIMIT 100"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    tag = sf_dir.rstrip("/").split("/")[-1]
    spark = get_spark(app_name="ab_q18_bucketed")
    spark.sparkContext.setLogLevel("ERROR")

    li_t, ord_t = f"li_bucket_{tag}_{buckets}", f"ord_bucket_{tag}_{buckets}"
    for tbl, fname, key in ((li_t, "lineitem", "l_orderkey"),
                            (ord_t, "orders", "o_orderkey")):
        if not spark.catalog.tableExists(tbl):
            print(f"writing {tbl} ({buckets} buckets on {key})", flush=True)
            sinks.write_bucketed_table(
                read_parquet(spark, os.path.join(sf_dir, f"{fname}.parquet")),
                tbl, [key], num_buckets=buckets)

    stock = SqlEngine(spark)
    stock.register_dir(sf_dir)
    bucketed = SqlEngine(spark)
    bucketed.register_dir(sf_dir)
    bucketed.register_temp_table(spark.table(li_t), "lineitem")
    bucketed.register_temp_table(spark.table(ord_t), "orders")

    def exchanges(eng: SqlEngine) -> int:
        plan = eng.query(Q18)._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    print(f"exchanges: stock={exchanges(stock)} bucketed={exchanges(bucketed)}")

    res: dict[str, list[float]] = {"stock": [], "bucketed": []}
    # warm both paths
    for eng in (stock, bucketed):
        eng.query(Q18).write.format("noop").mode("overwrite").save()
    for _ in range(trials):
        for label, eng in (("stock", stock), ("bucketed", bucketed)):
            t0 = time.perf_counter()
            eng.query(Q18).write.format("noop").mode("overwrite").save()
            res[label].append(time.perf_counter() - t0)
    for label, runs in res.items():
        print(f"{label}: min {min(runs):.3f}s runs={[round(r, 2) for r in runs]}")


if __name__ == "__main__":
    main()
