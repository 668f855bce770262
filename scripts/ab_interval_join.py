"""interval_join batch-path A/B: plain (by)-key equi-join with the
time-range residual vs the r15 binned (by, time-bin) equi-join.

    python scripts/ab_interval_join.py <sf_dir> [trials]

Interleaves the variants so machine drift hits both sides equally;
verifies identical results first and prints each variant's executed
join row counts aren't needed — the result sets are compared exactly.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sql_to_ibis_spark.session import get_spark
from sql_to_ibis_spark.sources.readers import read_parquet
from sql_to_ibis_spark.streaming import interval_join

VARIANTS = ("plain", "binned")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab_interval_join")
    spark.sparkContext.setLogLevel("ERROR")
    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id")

    def build(variant: str):
        return interval_join(
            purchases, clicks, by="user_id",
            lower_offset="-30 minutes", upper_offset="0 seconds",
            bin_join=(variant == "binned"),
        ).select("event_id", "ts", "user_id", "r_event_id", "r_ts")

    def run(variant: str) -> float:
        t0 = time.perf_counter()
        build(variant).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    base = None
    for v in VARIANTS:
        rows = sorted(map(tuple, build(v).collect()))
        print(f"{v:7s}: rows={len(rows)}")
        if base is None:
            base = rows
        elif rows != base:
            print("RESULT MISMATCH"); sys.exit(1)

    best = {v: float("inf") for v in VARIANTS}
    for t in range(trials):
        for v in VARIANTS:
            dt = run(v)
            best[v] = min(best[v], dt)
            print(f"trial {t} {v:7s}: {dt:.3f}s")
    print({v: round(b, 3) for v, b in best.items()})


if __name__ == "__main__":
    main()
