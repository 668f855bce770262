"""A/B: q18's folded 60M-row aggregate — raw-shuffle prepartition
(SPARK_GRAFT_PREPART_AGG default) vs map-side partial aggregation
(=0). The env var is read at compile time, so both variants coexist in
one session (interleaved; machine drift hits both sides).

    python scripts/ab_prepart_q18.py <sf_dir> [trials] [names...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sql_to_ibis_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else [
        "tpch_q18_large_volume_customer"]
    spark = get_spark(app_name="ab_prepart")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run(name: str, prepart: bool) -> float:
        if prepart:
            os.environ.pop("SPARK_GRAFT_PREPART_AGG", None)
        else:
            os.environ["SPARK_GRAFT_PREPART_AGG"] = "0"
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:
        run(name, True)
        run(name, False)
        pre, post = [], []
        for _ in range(trials):
            pre.append(run(name, True))
            post.append(run(name, False))
        print(f"{name}: prepart={statistics.median(pre):.3f}s "
              f"partial={statistics.median(post):.3f}s   "
              f"pre={[round(x,2) for x in pre]} "
              f"part={[round(x,2) for x in post]}", flush=True)


if __name__ == "__main__":
    main()
