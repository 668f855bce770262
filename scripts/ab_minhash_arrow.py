"""Bounded probe (VERDICT r15 stretch): is the minhash signature kernel's
remaining cost the pandas object boundary (list<int64> -> per-row numpy
arrays and back), which a zero-copy mapInArrow form would remove — or the
numpy hash arithmetic itself (memory-bandwidth-bound, unfixable)?

Times ONLY the signature stage over the documents table, same JVM-side
token hashing, identical kernel math:
  A) shipped pandas_udf (`_minhash_sig_udf`)
  B) mapInArrow reading the ListArray's offsets/values buffers directly
     (no per-row object arrays on input; ListArray.from_arrays output).

Outputs are asserted identical (sorted by doc_id) on the first trial.

    python scripts/ab_minhash_arrow.py <sf_dir> [trials]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

from pyspark.sql import functions as F

from sql_to_ibis_spark.session import get_spark
from sql_to_ibis_spark.sources.readers import read_parquet
from sql_to_ibis_spark.operators.dedup import (
    _minhash_sig_udf, _minhash_params, _token_hashes, _HASH_SPACE)

NUM_HASHES, K = 64, 5


def _arrow_sig_fn():
    params = _minhash_params(NUM_HASHES)
    a_all = np.array([a for a, _ in params], dtype=np.int64)
    b_all = np.array([b for _, b in params], dtype=np.int64)

    def fn(it):
        for batch in it:
            ids = batch.column(0)
            th = batch.column(1)
            if isinstance(th, pa.ChunkedArray):
                th = th.combine_chunks()
            n_docs = len(th)
            if n_docs == 0:
                continue
            offs_in = th.offsets.to_numpy(zero_copy_only=False)[
                :-1].astype(np.int64)
            lens = np.diff(
                th.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
            flat = th.values.to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False)
            base = int(offs_in[0])
            offs_in = offs_in - base
            total_toks = int(lens.sum())
            flat = flat[base:base + total_toks]
            # same rolling-poly shingles as _shingle_flat
            accs = [flat]
            for t in range(1, K):
                nxt = np.zeros_like(flat)
                if len(flat) > t:
                    nxt[:-t] = (accs[-1][:-t] * 31 + flat[t:]) % _HASH_SPACE
                accs.append(nxt)
            m = np.maximum(lens - K + 1, 1)
            offs = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(m[:-1], out=offs[1:])
            total = int(m.sum())
            src = np.repeat(offs_in, m) + (np.arange(total)
                                           - np.repeat(offs, m))
            lvl = np.clip(np.minimum(lens, K) - 1, 0, K - 1)
            if total_toks:
                sh = np.stack(accs)[np.repeat(lvl, m),
                                    np.minimum(src, total_toks - 1)]
                sh = np.where(np.repeat(lens, m) > 0, sh, 0)
            else:
                sh = np.zeros(total, dtype=np.int64)
            out = np.empty((NUM_HASHES, n_docs), dtype=np.int64)
            for c0 in range(0, NUM_HASHES, 16):
                a = a_all[c0:c0 + 16, None]
                b = b_all[c0:c0 + 16, None]
                vals = (sh[None, :] * a + b) % _HASH_SPACE
                out[c0:c0 + 16] = np.minimum.reduceat(vals, offs, axis=1)
            sig_flat = out.T.reshape(-1)
            sig_offs = np.arange(0, (n_docs + 1) * NUM_HASHES, NUM_HASHES,
                                 dtype=np.int32)
            sig = pa.ListArray.from_arrays(
                pa.array(sig_offs), pa.array(sig_flat, type=pa.int64()))
            yield pa.RecordBatch.from_arrays([ids, sig], ["doc_id", "sig"])

    return fn


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ab_minhash_arrow")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    th = docs.select("doc_id", _token_hashes(F.col("text")).alias("__th"))

    pandas_form = th.select(
        "doc_id", _minhash_sig_udf(NUM_HASHES, K)("__th").alias("sig"))
    arrow_form = th.mapInArrow(
        _arrow_sig_fn(), "doc_id bigint, sig array<bigint>")

    # equality check once (order-insensitive)
    a = {r.doc_id: tuple(r.sig) for r in pandas_form.collect()}
    b = {r.doc_id: tuple(r.sig) for r in arrow_form.collect()}
    assert a == b, "signature mismatch between forms"
    print(f"outputs identical over {len(a)} docs", flush=True)

    def t(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    t(pandas_form); t(arrow_form)
    ps, ar = [], []
    for _ in range(trials):
        ps.append(t(pandas_form))
        ar.append(t(arrow_form))
    print(f"signature stage: pandas_udf={statistics.median(ps):.3f}s "
          f"mapInArrow={statistics.median(ar):.3f}s   "
          f"pandas={[round(x, 2) for x in ps]} "
          f"arrow={[round(x, 2) for x in ar]}", flush=True)


if __name__ == "__main__":
    main()
