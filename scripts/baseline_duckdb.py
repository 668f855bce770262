"""Measures the DuckDB baseline for the bench headline queries (BASELINE.md
measurement plan step 2): runs each query's oracle SQL on the same parquet at
the same SF, best of 3, prints a JSON line comparable to bench.py output."""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from bench import HEADLINE

# Entries whose oracle is a PLANTED closed-form answer (a trivial SELECT of
# the expected rows), not an equivalent computation: timing the oracle there
# compares real candidate mining against reading the answer key, so these are
# reported but EXCLUDED from the comparable total/ratio. The exhaustive-oracle
# dedup entries (minhash/ngram/clusters/curate) stay comparable — DuckDB does
# the same (or more) work there.
NONCOMPARABLE = {
    "pipeline_dedup_simhash",
    "pipeline_embedding_near_dup",
    "pipeline_ann_lsh_bucketed",
    "pipeline_ann_ivf_nprobe",
    "pipeline_multimodal_decode_images",
    "pipeline_multimodal_decode_bmp",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = duckdb.connect()
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    oracles = entrymod.oracle_sql()
    timings = {}
    for name in HEADLINE:
        if name not in oracles:
            timings[name] = None  # no SQL equivalent (LSH pipelines)
            continue
        sql = oracles[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    total = round(sum(v for v in timings.values() if v is not None), 4)
    comparable = round(sum(
        v for name, v in timings.items()
        if v is not None and name not in NONCOMPARABLE), 4)
    print(json.dumps({"metric": "duckdb_baseline_total", "value": total,
                      "unit": "sec", "queries": timings,
                      "comparable_total": comparable,
                      "noncomparable": sorted(NONCOMPARABLE & set(timings)),
                      "sf": sf_dir.rstrip("/").split("sf")[-1]}))


if __name__ == "__main__":
    main()
