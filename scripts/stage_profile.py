"""Stage-level profiler: run a named query and print per-node SQL metrics
from the executed (AQE-final) physical plan — where the wall-time, shuffle
bytes, and spill actually went. This is the evidence tool the round-5 verdict
asked for ("stage-level numbers, not narrative").

    python scripts/stage_profile.py <query_name> [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sql_to_ibis_spark.session import get_spark


def profile(spark, name: str, sf_dir: str) -> None:
    qs = entrymod.queries()
    df = qs[name](spark, sf_dir)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    # AQE final plan with per-node metrics
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    # unwrap AdaptiveSparkPlanExec to its final plan if present
    try:
        plan = plan.finalPhysicalPlan()
    except Exception:
        pass

    print(f"== {name}: wall {wall:.3f}s ==")

    def walk(node, depth=0):
        simple = node.nodeName()
        metrics = node.metrics()
        it = metrics.iterator()
        shown = []
        while it.hasNext():
            kv = it.next()
            key = kv._1()
            m = kv._2()
            v = m.value()
            if v:
                shown.append(f"{key}={v}")
        print("  " * depth + f"{simple}  " + "; ".join(shown))
        children = node.children()
        cit = children.iterator()
        while cit.hasNext():
            walk(cit.next(), depth + 1)
        # AQE query-stage nodes wrap their subtree in plan(), not children()
        if simple in ("ShuffleQueryStage", "BroadcastQueryStage",
                      "TableCacheQueryStage"):
            try:
                walk(node.plan(), depth + 1)
            except Exception:
                pass

    walk(plan)


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    qs = entrymod.queries()
    qs["tpch_q6_forecast_revenue"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()  # warm-up
    for name in names:
        profile(spark, name, sf_dir)


if __name__ == "__main__":
    main()
