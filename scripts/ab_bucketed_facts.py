"""Paired record for the bucketed-facts benched path (r12): runs the
order-key fact family (q21 / q18 / q4-EXISTS) through the engine twice —
stock parquet layout vs SPARK_GRAFT_BUCKETED_FACTS=1 — interleaved in ONE
session, then times the same queries' oracle SQL in DuckDB on the raw
parquet, and writes a JSON record to bench_results/.

    python scripts/ab_bucketed_facts.py <sf_dir> [trials] [tag]

The bucketed engine pays its one-time snapshot cost OUTSIDE the timed
loop (a deployment pays it once at ingest; DuckDB gets the raw parquet
it would normally read).
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from sql_to_ibis_spark.session import get_spark

QUERIES = [
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q18_large_volume_customer",
    "subquery_correlated_exists_q4",
    # r12-cont: the window-decorrelated scalar (partitions by
    # l_orderkey) — sorted buckets should make the window exchange-free
    "subquery_correlated_scalar_q17",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    tag = sys.argv[3] if len(sys.argv) > 3 else sf_dir.rstrip("/").split("/")[-1]
    spark = get_spark(app_name="ab_bucketed_facts")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # interleaved timing: the layout flag is part of the engine cache
    # key (see __spark_entry__._engine_key), so toggling the env var
    # alone switches between the two cached engines
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

    # build both engines up front (the bucketed one snapshots the facts)
    set_layout(False)
    entrymod._engine_for(spark, sf_dir)
    set_layout(True)
    entrymod._engine_for(spark, sf_dir)

    # sanity: identical row counts both layouts
    for n in QUERIES:
        set_layout(False)
        a = qs[n](spark, sf_dir).count()
        set_layout(True)
        b = qs[n](spark, sf_dir).count()
        assert a == b, (n, a, b)
        print(f"{n}: rows {a} (both layouts)", flush=True)

    walls: dict[str, dict[str, list[float]]] = {
        n: {"stock": [], "bucketed": []} for n in QUERIES}
    for t in range(trials):
        for n in QUERIES:
            for label, bucketed in (("stock", False), ("bucketed", True)):
                w = run(n, bucketed)
                walls[n][label].append(w)
                print(f"trial {t} {n:38s} {label:8s} {w:6.2f} s",
                      flush=True)

    con = duckdb.connect()
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    oracles = entrymod.oracle_sql()
    duck: dict[str, float] = {}
    for n in QUERIES:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(oracles[n]).fetchall()
            best = min(best, time.perf_counter() - t0)
        duck[n] = round(best, 3)
        print(f"duckdb {n}: {best:.2f} s", flush=True)

    record = {
        "sf_dir": sf_dir, "trials": trials,
        "queries": {
            n: {
                "stock_median": round(statistics.median(w["stock"]), 3),
                "bucketed_median": round(statistics.median(w["bucketed"]), 3),
                "stock_all": [round(x, 3) for x in w["stock"]],
                "bucketed_all": [round(x, 3) for x in w["bucketed"]],
                "duckdb_best": duck[n],
                "stock_ratio": round(
                    statistics.median(w["stock"]) / duck[n], 2),
                "bucketed_ratio": round(
                    statistics.median(w["bucketed"]) / duck[n], 2),
            } for n, w in walls.items()},
    }
    out = f"bench_results/r12_bucketed_facts_{tag}.json"
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["queries"], indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
