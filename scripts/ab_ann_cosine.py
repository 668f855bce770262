"""cosine_topk_vs_query formulation A/B: Arrow-batched pandas-UDF
matvec (current) vs JVM higher-order `aggregate(zip_with(...))` vs an
unrolled per-dimension codegen sum (dim is known from the query vector,
so the dot product can be a flat 64-term expression inside whole-stage
codegen — no lambda interpretation, no Python round-trip).

    python scripts/ab_ann_cosine.py <sf_dir> [trials]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sql_to_ibis_spark.operators import similarity
from sql_to_ibis_spark.session import get_spark
from sql_to_ibis_spark.sources.readers import read_parquet

VARIANTS = ("arrow", "hof", "unrolled")
QID, K = 123, 10


def build(embs, variant: str):
    if variant == "arrow":
        return similarity.cosine_topk_vs_query(embs, QID, k=K)
    qrow = embs.filter(F.col("vec_id") == QID).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("q")
    ).head()
    q = np.asarray(qrow["q"], dtype=np.float64)
    qn = float(np.linalg.norm(q))
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    if variant == "hof":
        dot = F.aggregate(F.zip_with(v, F.lit(q.tolist()),
                                     lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        nrm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                                 F.lit(0.0), lambda acc, x: acc + x))
    else:
        el = [F.col("embedding").getItem(i).cast("double")
              for i in range(len(q))]
        dot = sum((e * float(qi) for e, qi in zip(el, q)), F.lit(0.0))
        nrm = F.sqrt(sum((e * e for e in el), F.lit(0.0)))
    sim = dot / (nrm * F.lit(qn))
    return (embs.filter(F.col("vec_id") != QID)
            .select(F.col("vec_id"), F.round(sim, 4).alias("sim"))
            .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
            .limit(K))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab_ann_cosine")
    spark.sparkContext.setLogLevel("ERROR")
    embs = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))

    base = None
    for v in VARIANTS:
        rows = [tuple(r) for r in build(embs, v).collect()]
        print(f"{v:9s}: {rows[:3]} ...")
        if base is None:
            base = rows
        elif rows != base:
            print(f"RESULT MISMATCH in {v}")
            sys.exit(1)

    best = {v: float("inf") for v in VARIANTS}
    for t in range(trials):
        for v in VARIANTS:
            t0 = time.perf_counter()
            build(embs, v).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[v] = min(best[v], dt)
            print(f"trial {t} {v:9s}: {dt:.3f}s")
    print({v: round(b, 3) for v, b in best.items()})


if __name__ == "__main__":
    main()
