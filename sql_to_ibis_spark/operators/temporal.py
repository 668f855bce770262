"""Temporal join operators Spark lacks as primitives: as-of join and
interval/range join.

Scale design notes:

* **asof_join** — the distributed merge_asof. Implemented as the classic
  union-and-window composition (the same shape Flink's temporal join and
  pandas' merge_asof compute): tag left rows side=1 and right rows side=0,
  union, then one window per key ordered by (ts, side, tiebreak) carrying
  ``last(right_payload, ignorenulls=True)`` forward. ONE shuffle on the key
  column + a per-key sort — no join explosion, no per-row lookups, and the
  window sort is exactly what a 1000-executor range-partitioned sort does
  per partition. Inclusive backward semantics (``left.ts >= right.ts``)
  match DuckDB's ``ASOF JOIN`` and pandas ``merge_asof`` defaults; ties on
  the timestamp are broken by the largest tiebreak column so the result is
  deterministic. A hot key concentrates its sort in one task; AQE cannot
  split a window partition, so extreme key skew should be pre-bucketed by a
  coarser time range upstream (documented, not silently mitigated: as-of
  semantics are order-dependent within a key, so salting would be wrong).

* **range_join** — point-in-interval join without the cartesian blowup.
  Spark executes a bare inequality predicate as BroadcastNestedLoopJoin
  (O(n·m) comparisons even when broadcastable). Instead: bucket time into
  fixed-width bins, explode each interval into the bins it covers, and
  equi-join on (key, bin) with the exact interval predicate as a residual
  filter. Each point has exactly ONE bin, so a (point, interval) pair can
  match at most once — no dedup pass needed. Cost is
  O(points + intervals × bins_per_interval + true_matches): linear when
  ``bin_width`` is on the order of the typical interval length (the same
  strategy as Databricks' range-join bin optimization, re-built here from
  first principles on open-source Spark).

The reference engine (sql_to_ibis) has no temporal-join surface at all —
these exist for the training-data-pipeline use cases (sessionized feature
lookup, "state as of event time") the brief calls out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_seconds(col: Column) -> Column:
    """Epoch seconds as double for TIMESTAMP, TIMESTAMP_NTZ (reinterpreted in
    the session time zone — pinned UTC by session.py) or numeric columns
    (numeric → timestamp → double round-trips unchanged)."""
    return col.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: float | None = None,
    prefix: str = "matched_",
) -> DataFrame:
    """Backward as-of left join: for each left row, attach the columns of the
    single right row with the same ``by`` key and the greatest ``right_ts``
    that is <= ``left_ts`` (inclusive, like DuckDB ``ASOF JOIN`` and pandas
    ``merge_asof``). Left rows with no eligible right row keep nulls.

    ``right_cols`` are emitted as ``{prefix}{col}``. Ties on ``right_ts``
    resolve to the row with the largest first ``right_cols`` value
    (deterministic). ``tolerance_seconds`` additionally requires
    ``left_ts - right_ts <= tolerance`` (matches outside the window are
    nulled, the left row is kept).
    """
    if not right_cols:
        raise ValueError("right_cols must name at least one right column")
    tiebreak = right_cols[0]
    payload = F.struct(
        F.col(right_ts).alias("__rts"),
        F.col(tiebreak).alias("__tb"),
        *[F.col(c).alias(c) for c in right_cols],
    )

    payload_type = right.select(payload.alias("p")).schema["p"].dataType
    row_type = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("r")
    ).schema["r"].dataType
    tb_type = right.schema[tiebreak].dataType

    left_tagged = left.select(
        F.col(by).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
        F.lit(None).cast(tb_type).alias("__tb2"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )

    right_tagged = right.select(
        F.col(by).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(row_type).alias("__row"),
        F.col(tiebreak).alias("__tb2"),
        payload.alias("__payload"),
    )

    unioned = left_tagged.unionByName(right_tagged)

    # right rows (side=0) sort before left rows (side=1) at equal ts →
    # inclusive backward semantics; __tb2 orders equal-ts right rows so
    # `last` deterministically picks the max tiebreak
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(),
                 F.col("__tb2").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    if tolerance_seconds is not None:
        in_tol = (
            _epoch_seconds(F.col("__ts"))
            - _epoch_seconds(F.col("__match.__rts"))
        ) <= F.lit(float(tolerance_seconds))
        matched = matched.withColumn(
            "__match", F.when(in_tol, F.col("__match")))

    return matched.select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    by: str | None = None,
    bin_seconds: int = 600,
    point_cols: list[str] | None = None,
    interval_cols: list[str] | None = None,
) -> DataFrame:
    """Inner join of point rows to every interval row whose
    ``[start_ts, end_ts]`` (inclusive both ends) contains ``point_ts``,
    optionally also matching on an equality key ``by``.

    Executed as a binned equi-join (see module docstring): intervals explode
    into epoch bins of ``bin_seconds``, points bin once, join on
    (key, bin) + residual range filter. Choose ``bin_seconds`` near the
    typical interval length; longer intervals just produce proportionally
    more bin rows (never a cross join).
    """
    point_cols = point_cols if point_cols is not None else points.columns
    interval_cols = (interval_cols if interval_cols is not None
                     else intervals.columns)

    def _bin(col: Column) -> Column:
        return F.floor(_epoch_seconds(col) / bin_seconds).cast("bigint")

    p = points.select(
        *[F.col(c) for c in point_cols],
        F.col(point_ts).alias("__pts"),
        _bin(F.col(point_ts)).alias("__bin"),
        *([F.col(by).alias("__pkey")] if by else []),
    )
    iv = intervals.select(
        *[F.col(c) for c in interval_cols],
        F.col(start_ts).alias("__s"),
        F.col(end_ts).alias("__e"),
        *([F.col(by).alias("__ikey")] if by else []),
    ).withColumn(
        "__bin",
        F.explode(F.sequence(_bin(F.col("__s")), _bin(F.col("__e")))),
    )

    cond = (p["__bin"] == iv["__bin"])
    if by:
        cond = cond & (p["__pkey"] == iv["__ikey"])
    joined = p.join(iv, cond, "inner").filter(
        (F.col("__pts") >= F.col("__s")) & (F.col("__pts") <= F.col("__e"))
    )
    return joined.select(
        *[p[c] for c in point_cols],
        *[iv[c] for c in interval_cols],
    )
