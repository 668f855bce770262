"""Physical-layout operators: Z-order clustering and size-targeted writes.

At 100 TB the dominant query cost is the scan, and what the scan costs is
decided at WRITE time: bucketing (``sinks.write_bucketed_table``) removes
join/agg shuffles on a fixed key, while Z-ORDER clustering removes scan I/O
for selective multi-column predicates — files become min/max-tight on every
clustered column at once, so parquet footer pruning (and the engine's own
stats estimator) skips most of the data for a point or range filter on ANY
of them. A plain (insertion-ordered or hash-shuffled) layout prunes on at
most the incidental write order; a lexicographic sort prunes only its
leading column.

Design (the same shape Delta Lake's ``OPTIMIZE ZORDER`` uses, re-expressed
on open Spark APIs):

1. one driver-side multi-column ``approxQuantile`` pass computes equi-depth
   bucket bounds per clustered column (equi-depth, not min/max-linear, so
   skewed columns still spread across buckets);
2. an Arrow-batched pandas UDF assigns each row its per-column bucket via
   vectorized ``np.searchsorted`` and bit-interleaves the bucket ids into
   one Morton (Z) key — the only non-JVM step, O(bits) numpy passes per
   batch; string columns get sampled LEXICOGRAPHIC equi-depth bounds (the
   RangePartitioner trick) rather than hash buckets, because parquet
   footers keep lexicographic string min/max — a hash-clustered layout
   would leave every file spanning the full string domain and prune
   nothing;
3. ``repartitionByRange`` on the key (sampled range bounds → balanced
   files) + ``sortWithinPartitions`` → each output file owns a compact
   Z-range, i.e. a small hyper-rectangle of the clustered space.

The write pays one shuffle + one sort, once; every subsequent selective
scan wins. ``file_prune_fraction`` measures the win from footers alone.

The reference engine has no physical-layout surface at all (it returns
expressions; storage is the caller's problem) — this module, like
``sinks``, is part of the Spark-first scale story.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ZKEY = "__zorder_key"

_NUMERICS = ("tinyint", "smallint", "int", "bigint", "float", "double",
             "decimal", "date", "timestamp", "timestamp_ntz", "boolean")


def _interleave_bits(buckets, bits_per_col: int):
    """Morton-interleave k equal-width bucket-id arrays → one int64 array.

    ``buckets``: list of k numpy int64 arrays, each valued in
    [0, 2**bits_per_col). Bit i of column j lands at position
    ``i * k + j`` — adjacent Z-key rows differ in low-order bits of EVERY
    column, which is exactly what makes each Z-range a hyper-rectangle.
    Pure function, unit-tested directly.
    """
    import numpy as np

    k = len(buckets)
    out = np.zeros(len(buckets[0]), dtype=np.int64)
    for i in range(bits_per_col):
        for j, b in enumerate(buckets):
            out |= ((b >> i) & 1) << (i * k + j)
    return out


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int = 8,
    relative_error: float = 0.01,
    key_col: str = _ZKEY,
    sample_per_bucket: int = 64,
) -> DataFrame:
    """Append the Morton/Z key column for ``cols``.

    One ``approxQuantile`` action computes all numeric columns' equi-depth
    bounds together; string columns share one sampled collect that yields
    lexicographic equi-depth bounds (driver state per column:
    ``2**bits_per_col - 1`` values — KB-scale, broadcast into the UDF
    closure). 8 bits/col keeps the bucket lattice (256^k cells) far finer
    than any realistic file count while the bounds stay tiny.
    """
    import numpy as np

    if not cols:
        raise ValueError("with_zorder_key needs at least one column")
    n_buckets = 1 << bits_per_col
    dtypes = dict(df.dtypes)
    for c in cols:
        if c not in dtypes:
            raise ValueError(f"unknown column {c!r}")

    # JVM-side per-column pre-keys: doubles for orderable types (quantile
    # bucketing below), raw strings for the rest (sampled lexicographic
    # bounds below — hash buckets would defeat footer pruning, which
    # compares against lexicographic string min/max).
    pre: list[Column] = []
    numeric_idx: list[int] = []
    string_idx: list[int] = []
    for i, c in enumerate(cols):
        base = dtypes[c].split("(")[0]
        if base in _NUMERICS:
            expr = F.col(c)
            if base == "date":
                expr = expr.cast("timestamp")
            pre.append(expr.cast("double").alias(f"__zq_{i}"))
            numeric_idx.append(i)
        else:
            pre.append(F.col(c).cast("string").alias(f"__zq_{i}"))
            string_idx.append(i)
    keyed = df.select("*", *pre)

    num_bounds: dict[int, object] = {}
    if numeric_idx:
        qcols = [f"__zq_{i}" for i in numeric_idx]
        probs = [j / n_buckets for j in range(1, n_buckets)]
        quantiles = keyed.approxQuantile(qcols, probs, relative_error)
        for i, q in zip(numeric_idx, quantiles):
            num_bounds[i] = np.asarray(q, dtype=np.float64)

    str_bounds: dict[int, object] = {}
    if string_idx:
        # One shared Bernoulli sample sized for ~sample_per_bucket values
        # per bucket (the RangePartitioner recipe). The count runs on the
        # SOURCE frame, not `keyed` — same row count, but for parquet
        # inputs Catalyst folds count(*) to footer metadata, while the
        # derived __zq_ projections would force a scan (r9 verdict nit).
        # The sample itself is a map-only scan of just the clustered
        # string columns.
        scols = [f"__zq_{i}" for i in string_idx]
        want = n_buckets * sample_per_bucket
        total = df.count()
        frac = min(1.0, (want * 1.5) / max(total, 1))
        rows = keyed.select(*scols).sample(False, frac, seed=42).collect()
        for i in string_idx:
            vals = sorted(v[f"__zq_{i}"] for v in rows
                          if v[f"__zq_{i}"] is not None)
            if vals:
                step = len(vals) / n_buckets
                bnds = [vals[min(int(step * j), len(vals) - 1)]
                        for j in range(1, n_buckets)]
                str_bounds[i] = np.asarray(bnds, dtype=object)
            else:
                str_bounds[i] = np.asarray([], dtype=object)

    bits = bits_per_col
    ncols = len(cols)

    # NOTE: the UDF body is fully self-contained (the interleave loop is
    # inlined rather than calling the module-level helper) so cloudpickle
    # ships it BY VALUE — the executors never need to import this package,
    # which keeps the layout tool usable from a bare spark-submit where
    # only the driver has the library on its path.
    @F.pandas_udf(T.LongType())
    def zkey(*parts):
        import numpy as np  # noqa: F811 — runs on executors
        import pandas as pd

        bucketed = []
        for i in range(ncols):
            if i in str_bounds:
                s = parts[i]
                mask = s.isna().to_numpy()
                vals = s.fillna("").to_numpy(dtype=object)
                if len(str_bounds[i]):
                    b = np.searchsorted(str_bounds[i], vals, side="right")
                    b = np.asarray(b, dtype=np.int64)
                else:
                    b = np.zeros(len(vals), dtype=np.int64)
                b[mask] = 0  # NULLS FIRST, like Spark
            else:
                vals = parts[i].to_numpy(dtype=np.float64, na_value=np.nan)
                b = np.searchsorted(num_bounds[i], vals, side="right")
                b = np.asarray(b, dtype=np.int64)
                b[np.isnan(vals)] = 0
            bucketed.append(b)
        out = np.zeros(len(bucketed[0]), dtype=np.int64)
        for i in range(bits):
            for j, b in enumerate(bucketed):
                out |= ((b >> i) & 1) << (i * ncols + j)
        return pd.Series(out)

    out = keyed.withColumn(key_col, zkey(*[f"__zq_{i}"
                                           for i in range(ncols)]))
    return out.drop(*[f"__zq_{i}" for i in range(ncols)])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    target_files: int = 64,
    bits_per_col: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: cluster ``df`` on ``cols`` into
    ``target_files`` files, each owning a compact Z-range.

    ``repartitionByRange`` samples the key distribution for balanced range
    bounds (no driver-side sort); the within-partition sort keeps row
    groups tight too, so both FILE pruning and ROW-GROUP pruning engage.
    The projection dropping the key preserves the partition-local order.
    """
    keyed = with_zorder_key(df, cols, bits_per_col=bits_per_col)
    (keyed.repartitionByRange(target_files, _ZKEY)
     .sortWithinPartitions(_ZKEY)
     .drop(_ZKEY)
     .write.mode(mode).parquet(path))


def write_sized_parquet(
    df: DataFrame,
    path: str,
    target_file_mb: int = 256,
    shuffle_to_parquet_factor: float = 2.0,
    mode: str = "overwrite",
) -> None:
    """Size-targeted parquet (the small-files / giant-files fix): AQE
    rebalances the write into partitions of ~``target_file_mb`` each.

    Uses the REBALANCE hint + ``advisoryPartitionSizeInBytes`` — Spark's
    own runtime coalescing/splitting, driven by ACTUAL shuffle bytes, not
    a guessed row count (and it splits skewed partitions, which a plain
    ``repartition(n)`` cannot). ``shuffle_to_parquet_factor`` bridges
    shuffle-encoded bytes to parquet-encoded bytes (~2× for typical
    columnar compression; raise it for highly compressible data). Session
    conf is restored after the write.
    """
    spark = df.sparkSession
    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(
            key,
            str(int(target_file_mb * 1024 * 1024
                    * shuffle_to_parquet_factor)))
        df.hint("rebalance").write.mode(mode).parquet(path)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def file_prune_fraction(path: str, col: str, value) -> float:
    """Fraction of the dataset's parquet FILES whose footer min/max admit
    ``col = value`` — what a stats-pruning scan must read. Footer-only
    (no Spark job); the measurement tool for layout decisions and the
    pruning tests. Files with no usable bounds count as must-read."""
    import pyarrow.parquet as pq

    files = [path]
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        usable = True
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema.lower() != col.lower():
                    continue
                st = c.statistics
                if st is None or not st.has_min_max:
                    usable = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if not usable:
                break
        if not usable or lo is None:
            hit += 1
            continue
        # normalize datetime comparability: parquet TIMESTAMP stats come
        # back tz-aware (UTC) from pyarrow while probes are often naive
        # dates/datetimes — the session pins UTC, so stripping tzinfo
        # (and widening a date probe to midnight) compares correctly
        import datetime as _dt
        v = value
        v_end = None
        if isinstance(lo, _dt.datetime):
            if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
                # a date probe means the whole day: the interval
                # [midnight, next midnight) — a file whose range starts
                # after 00:00 but inside the day still contains rows on
                # that date and must count as a hit
                v_end = _dt.datetime(v.year, v.month, v.day) \
                    + _dt.timedelta(days=1)
                v = _dt.datetime(v.year, v.month, v.day)
            lo = lo.replace(tzinfo=None)
            hi = hi.replace(tzinfo=None)
            if isinstance(v, _dt.datetime) and v.tzinfo is not None:
                v = v.replace(tzinfo=None)
        if v_end is not None:
            if lo < v_end and hi >= v:  # range overlaps [v, v_end)
                hit += 1
        elif lo <= v <= hi:
            hit += 1
    return hit / len(files)
