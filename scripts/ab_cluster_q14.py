"""q14 at HEAD on shipdate-clustered lineitem (r14 follow-up).

The r10 shipdate-clustering A/B predates the constraint-flag rewrite:
q14 then spent ~1.0 s building a 2M-row part HashedRelation, so the
scan-side layout couldn't move the total (1.66 → 1.85 s, a measured
loss). At r14 HEAD the flag rewrite removed the dim-build cost
(sf10 stock 1.37 → 0.75 s), leaving the unprunable one-month lineitem
scan as the dominant term — exactly what clustering targets. This A/B
re-measures stock vs clustered WITH the entry-harness engine setup
(analyze + declared constraints) so the flag rewrite fires in both
arms, across two target_files settings to expose the admitted-task
parallelism tradeoff (64 files ⇒ the month lands in 1–2 map tasks).

    python scripts/ab_cluster_q14.py [sf_dir] [trials]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em
from sql_to_ibis_spark import SqlEngine
from sql_to_ibis_spark.session import get_spark

ENTRIES = ("tpch_q14_promo_effect", "tpch_q6_forecast_revenue",
           "tpch_q15_top_supplier")


def engine_like_entry(spark, sf_dir: str) -> SqlEngine:
    eng = SqlEngine(spark)
    eng.register_dir(sf_dir)
    eng.analyze()
    for t, c in (("part", "p_partkey"), ("supplier", "s_suppkey"),
                 ("nation", "n_nationkey"), ("region", "r_regionkey"),
                 ("customer", "c_custkey"), ("orders", "o_orderkey")):
        eng.add_primary_key(t, c)
    for t, c, r in (("lineitem", "l_partkey", "part"),
                    ("lineitem", "l_suppkey", "supplier"),
                    ("lineitem", "l_orderkey", "orders"),
                    ("supplier", "s_nationkey", "nation"),
                    ("customer", "c_nationkey", "nation"),
                    ("nation", "n_regionkey", "region"),
                    ("orders", "o_custkey", "customer")):
        eng.add_foreign_key(t, c, r)
    return eng


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab_cluster_q14")
    spark.sparkContext.setLogLevel("ERROR")
    tag = sf_dir.rstrip("/").split("/")[-1]

    arms: dict[str, SqlEngine] = {"stock": engine_like_entry(spark, sf_dir)}
    for tf in (64, 256):
        eng = engine_like_entry(spark, sf_dir)
        t0 = time.time()
        eng.snapshot_zordered(
            "lineitem", ["l_shipdate"], target_files=tf,
            snapshot_name=f"zorder_lineitem_shipdate_{tag}_{tf}")
        print(f"clustered[{tf}] snapshot ready in {time.time()-t0:.1f}s",
              flush=True)
        arms[f"clustered[{tf}]"] = eng

    sqls = {n: em._PAIRS[n][0] for n in ENTRIES if n in em._PAIRS}
    for qname, sql in sqls.items():
        for eng in arms.values():     # warm both plans
            eng.query(sql).write.format("noop").mode("overwrite").save()
        best = {k: float("inf") for k in arms}
        for _ in range(trials):
            for label, eng in arms.items():
                t0 = time.time()
                eng.query(sql).write.format("noop").mode("overwrite").save()
                best[label] = min(best[label], time.time() - t0)
        base = best["stock"]
        print(f"{qname}: " + "  ".join(
            f"{k}={v:.3f}s" + (f" ({(1-v/base)*100:+.0f}%)"
                               if k != "stock" else "")
            for k, v in best.items()), flush=True)


if __name__ == "__main__":
    main()
