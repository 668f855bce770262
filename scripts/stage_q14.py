"""q14 stage decomposition at HEAD (r14 closure evidence).

The flag rewrite took q14 from 1.37 to ~0.6-0.75 s at sf10; DuckDB is
0.21-0.26. This decomposes the remaining wall into its physical stages,
measured cumulatively on the same engine/session (noop sink, best-of-N):

  A. month-filtered lineitem scan + global agg (the unprunable scan
     floor at the stock layout - orderkey-ordered files, zonemaps
     useless for l_shipdate)
  B. A + the PROMO-keyset broadcast probe (flag join, no CASE)
  C. the full entry (probe + conditional/total sums + division)

If C - A is small, the query is optimal-as-is at the stock layout and
the residual vs DuckDB is the scan floor, which the clustering A/B
(scripts/ab_cluster_q14.py) showed cannot be bought back warm-locally.

    python scripts/stage_q14.py [sf_dir] [trials]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em
from sql_to_ibis_spark.session import get_spark

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "ab_cluster_q14",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "ab_cluster_q14.py"))
_mod = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
engine_like_entry = _mod.engine_like_entry

STAGES = {
    "A_scan_agg": """
        SELECT sum(CAST(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS v
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP('1995-09-01')
          AND l_shipdate < TIMESTAMP('1995-10-01')
    """,
    "B_probe": """
        SELECT sum(CAST(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS v
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP('1995-09-01')
          AND l_shipdate < TIMESTAMP('1995-10-01')
          AND p_type = 'PROMO'
    """,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark(app_name="stage_q14")
    spark.sparkContext.setLogLevel("ERROR")
    eng = engine_like_entry(spark, sf_dir)
    sqls = dict(STAGES)
    sqls["C_full_q14"] = em._PAIRS["tpch_q14_promo_effect"][0]

    for sql in sqls.values():     # warm all plans
        eng.query(sql).write.format("noop").mode("overwrite").save()
    best = {k: float("inf") for k in sqls}
    for _ in range(trials):
        for name, sql in sqls.items():
            t0 = time.time()
            eng.query(sql).write.format("noop").mode("overwrite").save()
            best[name] = min(best[name], time.time() - t0)
    for name, t in best.items():
        print(f"{name}: {t:.3f}s", flush=True)
    print(f"probe increment (B-A): {best['B_probe']-best['A_scan_agg']:.3f}s"
          f" | full increment (C-A): "
          f"{best['C_full_q14']-best['A_scan_agg']:.3f}s", flush=True)


if __name__ == "__main__":
    main()
