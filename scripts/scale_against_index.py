"""Incremental-dedup scale record (r14): a shard against a frozen
bucketed index vs re-running full self-dedup, at sf10 (500k docs).

Production pipelines receive shards continuously; the question is what
one shard's dedup costs. Three measured quantities:

  1. index build + (band, bh)-bucketed snapshot — ONE-TIME per corpus
     version (amortized over every future shard);
  2. shard probe via dedup.against_index on the bucketed index —
     the PER-SHARD cost; the index side must plan with zero exchange
     (asserted from the executed plan);
  3. the do-nothing-clever alternative: full MinHash-LSH self-dedup of
     frozen ∪ shard (what a pipeline without an index re-pays per
     shard).

    python scripts/scale_against_index.py [sf_dir] [trials]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sql_to_ibis_spark import SqlEngine
from sql_to_ibis_spark.operators import dedup
from sql_to_ibis_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="scale_against_index")
    spark.sparkContext.setLogLevel("ERROR")
    eng = SqlEngine(spark)
    eng.register_dir(sf_dir)
    docs = eng.catalog.get("documents").df.select("doc_id", "text")
    frozen = docs.filter(F.col("doc_id") % 7 != 0)
    shard = docs.filter(F.col("doc_id") % 7 == 0)
    n_frozen, n_shard = frozen.count(), shard.count()
    print(f"frozen={n_frozen} shard={n_shard}", flush=True)

    tag = sf_dir.rstrip("/").split("/")[-1]
    t0 = time.time()
    eng.catalog.register("mh_index", dedup.build_minhash_index(frozen))
    # sorted buckets: scans report the (band, bh) ordering, so the
    # probe's merge join elides the per-probe sort of the whole index
    eng.snapshot_bucketed("mh_index", ["band", "bh"], num_buckets=32,
                          sort_cols=["band", "bh"],
                          snapshot_name=f"mh_index_{tag}_s", refresh=True)
    index = eng.catalog.get("mh_index").df
    print(f"index build + bucketed snapshot (one-time): "
          f"{time.time()-t0:.2f}s", flush=True)

    def probe() -> float:
        t0 = time.time()
        out = dedup.against_index(shard, index)
        n = out.count()
        dt = time.time() - t0
        return dt, n, out

    best, n_cand = float("inf"), 0
    probe()  # warm
    for _ in range(trials):
        dt, n_cand, out = probe()
        best = min(best, dt)
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exch = plan.count("Exchange hashpartitioning(band")
    print(f"per-shard probe (bucketed index): {best:.2f}s, "
          f"{n_cand} candidate pairs, band-key exchanges in plan: "
          f"{n_exch} (index side must contribute 0)", flush=True)

    both = docs  # frozen ∪ shard is the whole corpus
    t_self = float("inf")
    dedup.minhash_lsh_candidates(both).count()  # warm
    for _ in range(trials):
        t0 = time.time()
        n_self = dedup.minhash_lsh_candidates(both).count()
        t_self = min(t_self, time.time() - t0)
    print(f"full self-dedup of frozen ∪ shard (the no-index per-shard "
          f"cost): {t_self:.2f}s, {n_self} pairs", flush=True)
    print(f"per-shard speedup with the frozen index: "
          f"{t_self/best:.1f}x", flush=True)


if __name__ == "__main__":
    main()
