"""Z-order layout A/B: selective scans, stock vs clustered, product path.

Stock TPC-H lineitem parquet is written in order-key order, so footer
min/max are tight on l_orderkey but span ~the full domain on every other
column — a selective predicate on l_partkey or l_suppkey must read every
file and most row groups. ``engine.snapshot_zordered(["l_partkey",
"l_suppkey"])`` makes the footers tight on BOTH columns at once, so the
same predicates skip most of the data (Spark's parquet reader drops row
groups from the pushed filter; the file-level fraction is reported from
the footers directly via ``layout.file_prune_fraction``).

    python scripts/ab_zorder.py [sf_dir] [target_files] [trials]

Interleaves stock vs z-ordered timings (noop sink) per query and prints
file-level prune fractions for both layouts.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_to_ibis_spark import SqlEngine
from sql_to_ibis_spark.session import get_spark
from sql_to_ibis_spark.sources import layout

# range + point predicates on the two clustered columns, plus one query
# combining both — the case only a multi-column clustering can serve
QUERIES = {
    "part_range": (
        "SELECT count(*) AS n, CAST(sum(l_extendedprice) AS double) AS s "
        "FROM lineitem WHERE l_partkey BETWEEN 5000 AND 5200"
    ),
    "supp_range": (
        "SELECT count(*) AS n, CAST(sum(l_quantity) AS double) AS q "
        "FROM lineitem WHERE l_suppkey BETWEEN 100 AND 120"
    ),
    "both_point": (
        "SELECT count(*) AS n FROM lineitem "
        "WHERE l_partkey BETWEEN 9000 AND 9500 "
        "AND l_suppkey BETWEEN 200 AND 260"
    ),
}
PROBES = {"l_partkey": 5100, "l_suppkey": 110}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf1"
    target_files = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark(app_name="ab_zorder")
    spark.sparkContext.setLogLevel("ERROR")

    stock = SqlEngine(spark)
    stock.register_dir(sf_dir)
    zord = SqlEngine(spark)
    zord.register_dir(sf_dir)
    tag = sf_dir.rstrip("/").split("/")[-1]
    snap = f"zorder_lineitem_{tag}_{target_files}"
    t0 = time.time()
    zord.snapshot_zordered("lineitem", ["l_partkey", "l_suppkey"],
                           target_files=target_files, snapshot_name=snap)
    print(f"snapshot ready in {time.time() - t0:.1f}s", flush=True)

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    wh = wh[len("file:"):] if wh.startswith("file:") else wh
    zpath = os.path.join(wh or "spark-warehouse", snap)
    stock_path = os.path.join(sf_dir, "lineitem.parquet")
    for col, v in PROBES.items():
        ps = layout.file_prune_fraction(stock_path, col, v)
        pz = layout.file_prune_fraction(zpath, col, v)
        print(f"file read fraction [{col}={v}]: stock={ps:.2f} "
              f"zorder={pz:.2f}", flush=True)

    for qname, sql in QUERIES.items():
        # warm both plans once, then interleave
        for eng in (stock, zord):
            eng.query(sql).write.format("noop").mode("overwrite").save()
        res: dict[str, list[float]] = {"stock": [], "zorder": []}
        for _ in range(trials):
            for label, eng in (("stock", stock), ("zorder", zord)):
                t0 = time.time()
                eng.query(sql).write.format("noop").mode("overwrite").save()
                res[label].append(time.time() - t0)
        s, z = min(res["stock"]), min(res["zorder"])
        print(f"{qname}: stock={s:.3f}s zorder={z:.3f}s "
              f"({(1 - z / s) * 100:+.0f}% vs stock)", flush=True)


if __name__ == "__main__":
    main()
