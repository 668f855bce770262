"""Deterministic scale-up generator for the perf-crossover measurement.

Replicates the driver's sf0.1 parquet tables k× with shifted keys so every
FK relationship, value distribution, and filter selectivity is preserved
exactly — the only thing that changes is cardinality. This gives an sf1/sf5
dataset on which bench.py and scripts/baseline_duckdb.py can be compared at a
scale where data work (not Spark's fixed per-query constant) dominates.

Replica transforms (all deterministic, seedless):
- dimension keys shift by `copy * (max_base_key + 1)` so replicas never
  collide and joins stay 1:N exactly as in the base;
- `documents.text` is word-shuffled per (doc_id, copy) via an xxhash64 sort
  key, so replicas are NOT near-duplicates of the base docs (otherwise the
  dedup pipelines' candidate sets would blow up k× by construction);
- `embeddings.embedding` is cyclically rotated by `copy % dim`, preserving
  the norm but decorrelating replicas from the base vectors.

Usage: python scripts/gen_scale.py <k> <out_dir> [base_dir]
e.g.   python scripts/gen_scale.py 10 localdata/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from sql_to_ibis_spark.session import get_spark
from sql_to_ibis_spark.sources.readers import read_parquet

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# table -> (key column whose max defines the shift stride)
STRIDE_KEYS = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# table -> {column: stride-table} for FK shifts (key column shifts by its
# own stride implicitly)
FK_SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "__events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

# single file per table (the harnesses address '<table>.parquet' as one
# path) with 16 MB row groups so Spark's scan splits and DuckDB's parallel
# reader both still get ~row-group-level parallelism
ROW_GROUP_BYTES = 16 * 1024 * 1024


def _strides(spark: SparkSession, base: str) -> dict[str, int]:
    strides: dict[str, int] = {}
    for table, key in STRIDE_KEYS.items():
        df = read_parquet(spark, os.path.join(base, f"{table}.parquet"))
        strides[table] = int(df.agg(F.max(key)).first()[0]) + 1
    ev = read_parquet(spark, os.path.join(base, "events.parquet"))
    strides["__events_user"] = int(ev.agg(F.max("user_id")).first()[0]) + 1
    return strides


def _replicate(df: DataFrame, table: str, k: int,
               strides: dict[str, int]) -> DataFrame:
    copies = df.sparkSession.range(k).withColumnRenamed("id", "__copy")
    out = df.crossJoin(F.broadcast(copies))
    for col, stable in FK_SHIFTS.get(table, {}).items():
        out = out.withColumn(
            col, (F.col(col) + F.col("__copy") * F.lit(strides[stable]))
            .cast(dict(df.dtypes)[col]))
    if table == "documents":
        # word-shuffle replicas so they are not near-dups of the base
        shuffled = F.array_join(
            F.transform(
                F.array_sort(F.transform(
                    F.split(F.col("text"), " "),
                    lambda w, i: F.struct(
                        F.xxhash64(w, F.col("doc_id"), F.col("__copy"), i)
                        .alias("k"), w.alias("w")))),
                lambda s: s["w"]), " ")
        out = out.withColumn(
            "text", F.when(F.col("__copy") == 0, F.col("text"))
            .otherwise(shuffled))
    if table == "embeddings":
        dim = F.size("embedding")
        shift = (F.col("__copy") % dim).cast("int")
        rotated = F.concat(
            F.slice(F.col("embedding"), shift + F.lit(1), dim - shift),
            F.slice(F.col("embedding"), F.lit(1), shift))
        out = out.withColumn(
            "embedding", F.when(F.col("__copy") == 0, F.col("embedding"))
            .otherwise(rotated))
    return out.drop("__copy").select(*df.columns)


def main() -> None:
    k = int(sys.argv[1])
    out_dir = os.path.abspath(sys.argv[2])
    base = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="gen_scale")
    spark.sparkContext.setLogLevel("ERROR")
    strides = _strides(spark, base)
    for table in TABLES:
        df = read_parquet(spark, os.path.join(base, f"{table}.parquet"))
        if table in ("region", "nation"):
            out = df
        else:
            out = _replicate(df, table, k, strides)
        tmp = os.path.join(out_dir, f"__tmp_{table}")
        (out.coalesce(1).write.mode("overwrite")
         .option("parquet.block.size", ROW_GROUP_BYTES).parquet(tmp))
        import glob as _glob
        import shutil
        part = _glob.glob(os.path.join(tmp, "*.parquet"))[0]
        dest = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(dest):
            os.remove(dest)
        shutil.move(part, dest)
        shutil.rmtree(tmp, ignore_errors=True)
        print(f"{table}: -> {dest}")


if __name__ == "__main__":
    main()
