"""redact_pii gate A/B: r15-final substring gates on ALL four patterns
(PHONE gated on any-decimal-digit, SSN on '-') vs the prior form where
only EMAIL/URL were gated and the PHONE/SSN regexes scanned every row.

    python scripts/ab_redact_gates.py <sf_dir> [trials]

Both arms are built inline on the same scan and interleaved in one
session; the result sets are compared exactly first (the gates are
match-set identical by construction, this verifies it on the fixture).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sql_to_ibis_spark.operators.text import _PII_PATTERNS, redact_pii
from sql_to_ibis_spark.session import get_spark
from sql_to_ibis_spark.sources.readers import read_parquet

# the pre-r15-final gate map: a single literal for EMAIL/URL, none for
# PHONE/SSN (reconstructed from git history for the A/B)
_OLD_GATES = {"<EMAIL>": "@", "<URL>": "http", "<PHONE>": None, "<SSN>": None}


def _old_form(df):
    t = F.col("text")
    n = F.lit(0)
    for pattern, token, _ in _PII_PATTERNS:
        cnt = F.regexp_count(t, F.lit(pattern))
        gate = _OLD_GATES[token]
        if gate is not None:
            cnt = F.when(t.contains(gate), cnt).otherwise(F.lit(0))
        n = n + cnt
    out = t
    for pattern, token, _ in _PII_PATTERNS:
        rep = F.regexp_replace(out, pattern, token)
        gate = _OLD_GATES[token]
        if gate is not None:
            rep = F.when(t.contains(gate), rep).otherwise(out)
        out = rep
    return df.select(F.col("doc_id"), out.alias("text_redacted"),
                     n.cast("int").alias("n_redactions"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab_redact_gates")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))

    def build(variant: str):
        return _old_form(docs) if variant == "old" else redact_pii(docs)

    a = build("old").withColumn("__h", F.xxhash64("doc_id", "text_redacted",
                                                  "n_redactions"))
    b = build("new").withColumn("__h", F.xxhash64("doc_id", "text_redacted",
                                                  "n_redactions"))
    ha = a.agg(F.expr("bit_xor(__h)"), F.count(F.lit(1))).first()
    hb = b.agg(F.expr("bit_xor(__h)"), F.count(F.lit(1))).first()
    print(f"old: rows={ha[1]} hashxor={ha[0]}")
    print(f"new: rows={hb[1]} hashxor={hb[0]}")
    if tuple(ha) != tuple(hb):
        print("RESULT MISMATCH"); sys.exit(1)
    print("results identical (row-hash xor)")

    def run(variant: str) -> float:
        df = build(variant)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("old"); run("new")  # warm
    best = {"old": float("inf"), "new": float("inf")}
    for t in range(trials):
        for v in ("old", "new"):
            dt = run(v)
            best[v] = min(best[v], dt)
            print(f"trial {t} {v:3s}: {dt:.3f}s", flush=True)
    print({v: round(bv, 3) for v, bv in best.items()})


if __name__ == "__main__":
    main()
