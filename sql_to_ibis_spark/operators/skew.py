"""Skew-mitigation operators.

At 100 TB a handful of hot keys (the null key, a default user id, a viral
document) can put 100× the median load on one shuffle partition and stall
the whole stage on a single straggler task. Spark's AQE skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`, on in our session defaults) handles
sort-merge joins automatically; these helpers cover the cases AQE doesn't:
aggregations over skewed keys, and explicit salting when the operator knows
its hot keys up front (AQE only sees skew after a shuffle materializes).

The reference has no physical layer at all (SURVEY §4) — this is engine-side
extension territory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that splits every left-side key across ``salt`` shuffle
    partitions: the left gets a random salt in [0, salt), the right is
    replicated ``salt`` times (explode over a literal range), and the join
    runs on (key, salt).

    Use when the LEFT side is large with hot keys and the RIGHT side is too
    big to broadcast but much smaller than the left (replication costs
    ``salt × |right|``). For broadcast-able rights, plain ``broadcast()`` is
    strictly better; for two huge sides, prefer AQE skew splitting.

    Result columns = left columns + right's non-key columns (key columns
    appear once, from the left side) — same shape as ``left.join(right, on)``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        # right/full joins would emit `salt` copies of unmatched right rows
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt_col = "__salt"
    l = left.withColumn(salt_col, (F.rand(seed=42) * salt).cast("int"))
    r = right.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, keys + [salt_col], how)
    return out.drop(salt_col)


def skewed_group_count(
    df: DataFrame,
    key_cols: str | list[str],
    salt: int = 16,
) -> DataFrame:
    """Two-phase count for heavily skewed keys: partial count on
    (key, salt) — spreading each hot key over ``salt`` reducers — then a
    final sum over the key. Catalyst's map-side partial aggregation already
    combines within a task; the salt additionally splits a hot key's
    *reduce* work across tasks.

    Returns (key_cols..., n).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__pn"))
    return partial.groupBy(*keys).agg(F.sum("__pn").alias("n"))


def skewed_group_agg(
    df: DataFrame,
    key_cols: str | list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Generalized two-phase aggregation over skewed keys for decomposable
    aggregates. ``aggs`` maps output name → (function, column) where
    function ∈ {sum, count, min, max}. AVG decomposes as sum/count — compute
    both and divide downstream.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    partial_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    merge_fns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for out, (fn, _) in aggs.items():
        if fn not in partial_fns:
            raise ValueError(
                f"{fn!r} is not decomposable here (supported: "
                f"{sorted(partial_fns)})")
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*[
        partial_fns[fn](col).alias(f"__p_{out}")
        for out, (fn, col) in aggs.items()
    ])
    return partial.groupBy(*keys).agg(*[
        merge_fns[fn](f"__p_{out}").alias(out)
        for out, (fn, _) in aggs.items()
    ])


def top_frequent_keys(
    df: DataFrame, key_cols: str | list[str], k: int = 20
) -> DataFrame:
    """Diagnostic: the k heaviest keys and their counts — what you run first
    when a stage stalls, to decide between broadcast, salting, and filter."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc()).limit(k))
