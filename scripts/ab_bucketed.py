"""Bucketed-layout A/B for order-key-heavy queries beyond q18.

The q18 lever (BASELINE.md round 7: lineitem+orders bucketed 32-way on
the order key, exchanges 3→0, −48%) applies to every query whose big
shuffles are on the order key. This harness reuses the SAME bucketed
snapshot tables (written by ab_q18_bucketed.py) for:

- q4  — EXISTS semi join orders⋉lineitem on o_orderkey (the 60M-row
        probe shuffle the sf10 table flags as this entry's cost)
- q21 — lineitem self-joins (l2 EXISTS / l3 NOT EXISTS on l_orderkey)
        plus the orders join: four order-key exchanges in stock layout
- q3  — orders⋈lineitem on the order key feeding a group-by on the
        same key: join AND aggregation reuse the bucket partitioning
- q10 — orders⋈lineitem order-key shuffle ahead of the customer join

    python scripts/ab_bucketed.py <query> <sf_dir> [buckets] [trials]

Interleaves stock vs bucketed timings (noop sink) and prints exchange
counts for both plans.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_to_ibis_spark import SqlEngine
from sql_to_ibis_spark.session import get_spark
from sql_to_ibis_spark.sources import sinks
from sql_to_ibis_spark.sources.readers import read_parquet

QUERIES = {
    "q4": (
        "SELECT o_orderpriority, count(*) AS order_count FROM orders o "
        "WHERE o_orderdate >= TIMESTAMP('1995-01-01') "
        "AND o_orderdate < TIMESTAMP('1995-04-01') "
        "AND EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_shipdate > o.o_orderdate) "
        "GROUP BY o_orderpriority"
    ),
    "q21": (
        "SELECT s_name, count(*) AS numwait "
        "FROM supplier s "
        "JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey "
        "JOIN orders o ON o.o_orderkey = l1.l_orderkey "
        "WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R' "
        "AND EXISTS (SELECT 1 FROM lineitem l2 "
        "            WHERE l2.l_orderkey = l1.l_orderkey "
        "            AND l2.l_suppkey <> l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
        "                WHERE l3.l_orderkey = l1.l_orderkey "
        "                AND l3.l_suppkey <> l1.l_suppkey "
        "                AND l3.l_returnflag = 'R') "
        "GROUP BY s_name ORDER BY numwait DESC, s_name"
    ),
    "q3": (
        "SELECT l.l_orderkey, CAST(sum(CAST(l.l_extendedprice * "
        "(1 - l.l_discount) AS decimal(18,4))) AS double) AS revenue, "
        "o.o_orderdate FROM customer c "
        "JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "AND o.o_orderdate < TIMESTAMP('1995-03-15') "
        "AND l.l_shipdate > TIMESTAMP('1995-03-15') "
        "GROUP BY l.l_orderkey, o.o_orderdate "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
    "q10": (
        "SELECT c.c_custkey, c.c_name, CAST(sum(CAST(l.l_extendedprice * "
        "(1 - l.l_discount) AS decimal(18,4))) AS double) AS revenue, "
        "c.c_acctbal, n.n_name FROM customer c "
        "JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE o.o_orderdate >= TIMESTAMP('1995-01-01') "
        "AND o.o_orderdate < TIMESTAMP('1995-07-01') "
        "AND l.l_returnflag = 'R' "
        "GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name "
        "ORDER BY revenue DESC, c.c_custkey LIMIT 20"
    ),
}


def main() -> None:
    qname = sys.argv[1] if len(sys.argv) > 1 else "q4"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "localdata/sf10"
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    sql = QUERIES[qname]
    tag = sf_dir.rstrip("/").split("/")[-1]
    spark = get_spark(app_name=f"ab_bucketed_{qname}")
    spark.sparkContext.setLogLevel("ERROR")

    li_t, ord_t = f"li_bucket_{tag}_{buckets}", f"ord_bucket_{tag}_{buckets}"
    warehouse = os.path.join(os.getcwd(), "spark-warehouse")
    for tbl, fname, key in ((li_t, "lineitem", "l_orderkey"),
                            (ord_t, "orders", "o_orderkey")):
        if spark.catalog.tableExists(tbl):
            continue
        loc = os.path.join(warehouse, tbl)
        if os.path.isdir(loc):
            # snapshot files survive from an earlier session but the
            # in-memory catalog lost the table: re-declare an external
            # bucketed table over the existing bucket-id-named files
            print(f"re-declaring {tbl} over {loc}", flush=True)
            schema = read_parquet(
                spark, os.path.join(sf_dir, f"{fname}.parquet")).schema
            cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                             for f in schema.fields)
            spark.sql(
                f"CREATE TABLE {tbl} ({cols}) USING parquet "
                f"CLUSTERED BY ({key}) INTO {buckets} BUCKETS "
                f"LOCATION '{loc}'")
        else:
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
        plan = eng.query(sql)._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    print(f"{qname} exchanges: stock={exchanges(stock)} "
          f"bucketed={exchanges(bucketed)}")

    res: dict[str, list[float]] = {"stock": [], "bucketed": []}
    for eng in (stock, bucketed):
        eng.query(sql).write.format("noop").mode("overwrite").save()
    for _ in range(trials):
        for label, eng in (("stock", stock), ("bucketed", bucketed)):
            t0 = time.perf_counter()
            eng.query(sql).write.format("noop").mode("overwrite").save()
            res[label].append(time.perf_counter() - t0)
    for label, runs in res.items():
        print(f"{label}: min {min(runs):.3f}s runs={[round(r, 2) for r in runs]}")


if __name__ == "__main__":
    main()
