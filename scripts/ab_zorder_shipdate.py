"""Shipdate-clustered lineitem A/B: the scan-bound TPC-H entries.

Stock TPC-H lineitem parquet is written in order-key order, so footer
min/max on l_shipdate span ~the whole 7-year domain in every file: the
date-bounded entries (q6: one year, q14: one month) decode all 60M rows
at sf10 regardless of predicate selectivity — BASELINE.md's r7 stage
decomposition pinned this as their cost. ``snapshot_zordered(
["l_shipdate"])`` (single column ⇒ plain range-clustering through the
same product path) makes every file own a compact shipdate interval, so
the pushed filter admits ~selectivity of the files and row groups.

    python scripts/ab_zorder_shipdate.py [sf_dir] [target_files] [trials]

Interleaves stock vs clustered timings (noop sink) for the full entry
SQL of q1/q6/q14/q19 (q19 carries no shipdate predicate — included as
the expected-neutral control) and prints footer admission fractions for
the q6/q14 predicates on both layouts.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_to_ibis_spark import SqlEngine
from sql_to_ibis_spark.session import get_spark
from sql_to_ibis_spark.sources import layout

QUERIES: dict[str, str] = {}
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "entry", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__spark_entry__.py"))
_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry)
for key in ("tpch_q1_pricing_summary", "tpch_q6_forecast_revenue",
            "tpch_q14_promo_effect", "tpch_q19_discounted_revenue"):
    QUERIES[key] = _entry._PAIRS[key][0]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    target_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark(app_name="ab_zorder_shipdate")
    spark.sparkContext.setLogLevel("ERROR")

    stock = SqlEngine(spark)
    stock.register_dir(sf_dir)
    zord = SqlEngine(spark)
    zord.register_dir(sf_dir)
    tag = sf_dir.rstrip("/").split("/")[-1]
    snap = f"zorder_lineitem_shipdate_{tag}_{target_files}"
    t0 = time.time()
    zord.snapshot_zordered("lineitem", ["l_shipdate"],
                           target_files=target_files, snapshot_name=snap)
    print(f"snapshot ready in {time.time() - t0:.1f}s", flush=True)

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    wh = wh[len("file:"):] if wh.startswith("file:") else wh
    zpath = os.path.join(wh or "spark-warehouse", snap)
    stock_path = os.path.join(sf_dir, "lineitem.parquet")
    import datetime
    for probe in (datetime.datetime(1994, 6, 1),
                  datetime.datetime(1995, 9, 15)):
        ps = layout.file_prune_fraction(stock_path, "l_shipdate", probe)
        pz = layout.file_prune_fraction(zpath, "l_shipdate", probe)
        print(f"file read fraction [l_shipdate={probe}]: stock={ps:.2f} "
              f"clustered={pz:.2f}", flush=True)

    for qname, sql in QUERIES.items():
        for eng in (stock, zord):
            eng.query(sql).write.format("noop").mode("overwrite").save()
        res: dict[str, list[float]] = {"stock": [], "zorder": []}
        for _ in range(trials):
            for label, eng in (("stock", stock), ("zorder", zord)):
                t0 = time.time()
                eng.query(sql).write.format("noop").mode("overwrite").save()
                res[label].append(time.time() - t0)
        s, z = min(res["stock"]), min(res["zorder"])
        print(f"{qname}: stock={s:.3f}s clustered={z:.3f}s "
              f"({(1 - z / s) * 100:+.0f}% vs stock)", flush=True)


if __name__ == "__main__":
    main()
