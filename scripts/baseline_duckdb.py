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

# Entries where the oracle is NOT an equivalent computation, excluded from
# the comparable total/ratio (still timed and reported):
# - planted closed-form oracles (simhash/lsh/ivf/near-dup/decode): a trivial
#   SELECT of the expected rows — timing compares candidate mining against
#   reading the answer key;
# - exhaustive-ground-truth oracles (minhash/ngram/clusters/curate): the
#   blocked all-pairs Jaccard + recursive closure that PROVES the LSH result
#   is quadratic in corpus size — it's the correctness referee, not a DuckDB
#   implementation of the same LSH algorithm, and above ~sf1 it dominates
#   the baseline total (86 of 129 s at sf1) while Spark's candidate-based
#   pipeline scales near-linearly.
NONCOMPARABLE = {
    "pipeline_dedup_simhash",
    "pipeline_embedding_near_dup",
    "pipeline_ann_lsh_bucketed",
    "pipeline_ann_ivf_nprobe",
    "pipeline_multimodal_decode_images",
    "pipeline_multimodal_decode_bmp",
    "pipeline_multimodal_decode_jpeg",
    "pipeline_multimodal_decode_jpeg_color",
    "pipeline_multimodal_decode_jpeg_progressive",
    "pipeline_dedup_minhash_lsh",
    "pipeline_dedup_ngram_jaccard",
    "pipeline_dedup_clusters",
    "pipeline_curate_documents",
}

# Oracles too expensive to even TIME at large SF (the exhaustive dedup
# ground truth is O(n²) in docs). Set SPARK_GRAFT_DUCK_SKIP=1 to record
# null for them instead of burning hours.
SKIP_WHEN_REQUESTED = {
    "pipeline_dedup_minhash_lsh",
    "pipeline_dedup_ngram_jaccard",
    "pipeline_dedup_clusters",
    "pipeline_curate_documents",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = duckdb.connect()
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    oracles = entrymod.oracle_sql()
    timings = {}
    skip_heavy = os.environ.get("SPARK_GRAFT_DUCK_SKIP") == "1"
    subset = os.environ.get("SPARK_GRAFT_QUERIES", "")
    headline = [q for q in HEADLINE if q in set(subset.split(","))] \
        if subset else HEADLINE
    for name in headline:
        if name not in oracles or (skip_heavy and name in SKIP_WHEN_REQUESTED):
            timings[name] = None  # no SQL equivalent / O(n²) oracle skipped
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
