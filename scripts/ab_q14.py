"""A/B: tpch_q14_promo_effect with and without the constraint join
rewrite (r14 judge item 1), same session, interleaved.

Stock q14 broadcast-joins ALL of part (2M rows at sf10) only to read
p_type inside one CASE predicate — the driver-side HashedRelation build
of 2M (key, string) rows dominates the query (~1.0 s of 1.28 s;
narrowing the row to (key, bool) does NOT help, the build cost is
per-row). With declared FK/PK constraints the rewrite turns the join
into a LEFT probe of the PROMO-filtered keyset (~333k keys) and the
CASE predicate into key IS NOT NULL.

Usage: python scripts/ab_q14.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em
from sql_to_ibis_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/localdata/sf10"
    spark = get_spark(app_name="ab_q14")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    name = "tpch_q14_promo_effect"

    def run() -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm-up both engine variants (the engine cache keys off env)
    run()
    os.environ["SPARK_GRAFT_NO_CONSTRAINT_REWRITE"] = "1"
    run()
    del os.environ["SPARK_GRAFT_NO_CONSTRAINT_REWRITE"]

    best = {"rewrite": float("inf"), "stock": float("inf")}
    for _ in range(5):
        for mode in ("rewrite", "stock"):
            if mode == "stock":
                os.environ["SPARK_GRAFT_NO_CONSTRAINT_REWRITE"] = "1"
            else:
                os.environ.pop("SPARK_GRAFT_NO_CONSTRAINT_REWRITE", None)
            best[mode] = min(best[mode], run())
    os.environ.pop("SPARK_GRAFT_NO_CONSTRAINT_REWRITE", None)
    print(f"sf_dir={sf_dir}")
    print(f"q14 stock   (rewrite off): {best['stock']:.3f} s")
    print(f"q14 rewrite (constraints): {best['rewrite']:.3f} s "
          f"({100*(1-best['rewrite']/best['stock']):.0f}% faster)")


if __name__ == "__main__":
    main()
