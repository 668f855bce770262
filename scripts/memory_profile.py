"""Memory instrumentation for the heavy entries (r11 VERDICT mandate 3):
runs each named query and records per-query totals of shuffle spill
(memory + disk bytes), JVM GC time, peak execution memory, shuffle
read/write bytes and executor run time, read from the Spark UI REST API
(stage metrics attributed by job group). Optionally repeats with the
bucketed fact layout.

    SPARK_DRIVER_MEMORY=48g python scripts/memory_profile.py \
        <sf_dir> [query,query,...] [tag]

Writes bench_results/r12_memory_<tag>.json. The driver-memory question
("does sf100 need 48g?") is answered by running twice with different
SPARK_DRIVER_MEMORY and comparing spill/GC.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_UI"] = "1"

import __spark_entry__ as entrymod
from sql_to_ibis_spark.session import get_spark

DEFAULT_QUERIES = [
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q18_large_volume_customer",
    "pipeline_text_repetition_signals",
    "tpch_q1_pricing_summary",
]

METRICS = [
    ("memoryBytesSpilled", "spill_mem_bytes"),
    ("diskBytesSpilled", "spill_disk_bytes"),
    ("peakExecutionMemory", "peak_exec_mem_bytes"),
    ("shuffleWriteBytes", "shuffle_write_bytes"),
    ("shuffleReadBytes", "shuffle_read_bytes"),
    ("executorRunTime", "executor_run_ms"),
]


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}",
                                timeout=30) as r:
        return json.loads(r.read())


def _gc_total_ms(spark) -> int:
    # GC is an executor-lifetime counter, not a stage metric: take
    # before/after deltas around each query
    return sum(e.get("totalGCTime", 0) or 0
               for e in _rest(spark, "executors"))


def run_one(spark, qs, name: str, sf_dir: str) -> dict:
    sc = spark.sparkContext
    group = f"prof_{name}_{int(time.time())}"
    gc0 = _gc_total_ms(spark)
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    gc_ms = _gc_total_ms(spark) - gc0
    # attribute stages to this query via its job group
    jobs = [j for j in _rest(spark, "jobs") if j.get("jobGroup") == group]
    stage_ids = {s for j in jobs for s in j.get("stageIds", [])}
    totals = {out: 0 for _, out in METRICS}
    peak = 0
    for st in _rest(spark, "stages"):
        if st.get("stageId") not in stage_ids \
                or st.get("status") not in ("COMPLETE", "FAILED"):
            continue
        for api_key, out in METRICS:
            v = st.get(api_key, 0) or 0
            if out == "peak_exec_mem_bytes":
                peak = max(peak, v)
            else:
                totals[out] += v
    totals["peak_exec_mem_bytes"] = peak
    totals["gc_ms"] = gc_ms
    totals["wall_sec"] = round(wall, 3)
    totals["n_stages"] = len(stage_ids)
    return totals


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf100"
    names = (sys.argv[2].split(",") if len(sys.argv) > 2 and sys.argv[2]
             else DEFAULT_QUERIES)
    tag = sys.argv[3] if len(sys.argv) > 3 \
        else sf_dir.rstrip("/").split("/")[-1]
    spark = get_spark(app_name="memory_profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    record: dict = {
        "sf_dir": sf_dir,
        "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "bucketed_facts": os.environ.get("SPARK_GRAFT_BUCKETED_FACTS", ""),
        "queries": {},
    }
    # warm (registration + JIT, unrecorded)
    qs["select_star"](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    for name in names:
        try:
            m = run_one(spark, qs, name, sf_dir)
        except Exception as e:  # OOM/spill failures are themselves data
            m = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        record["queries"][name] = m
        print(name, json.dumps(m), flush=True)
    out = f"bench_results/r12_memory_{tag}.json"
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
