"""Sampling and dataset-split operators for training-data pipelines.

At 100 TB the only splits that survive reruns, backfills, and incremental
ingestion are DETERMINISTIC ones: a row's membership must be a pure function
of its key, never of partition layout or RNG state. Everything here is
expressed with JVM hash/window expressions — no Python, no collect of data
rows (``take_token_budget``'s two-pass scan collects O(partitions)
per-partition totals only), no nondeterministic ``rand()`` in the
persisted path.

Reference has no sampling surface at all; these are Spark-native extensions
(brief: "operations a large-scale training-data pipeline would need").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket_1000(key: Column) -> Column:
    """Deterministic, engine-portable 0..999 bucket from a key: first 8 hex
    chars of md5(key-as-string). md5 is identical everywhere (unlike
    xxhash64 seeds), so a DuckDB/Presto/BigQuery job computes the SAME
    split — the property that makes cross-system reproducibility work."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10) \
        .cast("long") % 1000


def split_train_eval(
    df: DataFrame,
    key_col: str,
    eval_per_mille: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic train/eval split: rows whose md5-bucket falls below
    ``eval_per_mille`` (out of 1000) go to eval. Stable across runs,
    cluster sizes, and engines; a key never migrates between splits when
    data is re-ingested."""
    bucket = _bucket_1000(F.col(key_col))
    return (df.filter(bucket >= eval_per_mille),
            df.filter(bucket < eval_per_mille))


def tag_split(df: DataFrame, key_col: str,
              eval_per_mille: int = 50) -> DataFrame:
    """Same split as :func:`split_train_eval` but as a ``split`` column —
    the form a single-pass curation job sinks partitioned-by-split."""
    bucket = _bucket_1000(F.col(key_col))
    return df.withColumn(
        "split",
        F.when(bucket < eval_per_mille, F.lit("eval")).otherwise(
            F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): e.g. downsample a
    dominant language while keeping the rest. Executes map-side on each
    partition — no shuffle. Seeded, but Bernoulli: exact counts vary
    run-to-run within binomial bounds (use :func:`top_n_per_key` when an
    exact per-stratum quota is required)."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def stratified_sample_deterministic(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum sampling where membership is a pure function of
    ``(id, salt)``: keep a row iff the first 8 hex chars of
    ``md5(id || salt)`` sort below the stratum's fraction threshold
    (lowercase-hex string order == numeric order). Unlike Bernoulli
    ``sampleBy``, the SAME rows are selected on every rerun, every
    partition layout, and every engine that computes md5 — so a DuckDB/
    Trino audit job reproduces the sample exactly. Map-side filter, no
    shuffle. Strata absent from ``fractions`` are dropped (``sampleBy``
    semantics). Changing ``salt`` redraws the sample."""
    key = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8)
    cond = F.lit(False)
    for stratum, frac in fractions.items():
        in_stratum = F.col(strata_col) == stratum
        if frac >= 1.0:
            cond = cond | in_stratum
        else:
            thresh = format(int(frac * 16 ** 8), "08x")
            cond = cond | (in_stratum & (key < F.lit(thresh)))
    return df.filter(cond)


def top_n_per_key(
    df: DataFrame,
    key_col: str,
    n: int,
    id_col: str,
    salt: str = "sample",
) -> DataFrame:
    """EXACT deterministic quota per key: keep ``n`` rows per key, chosen
    by a pseudorandom-but-stable order (md5 of id + salt). One shuffle on
    the key; per-key state is a row_number counter, so skewed strata are
    bounded by AQE skew-split like any window. Changing ``salt`` redraws
    the sample; same salt always returns the same rows."""
    order = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(key_col).orderBy(order, F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n).drop("__rn"))


def take_token_budget(
    df: DataFrame,
    budget_tokens: int,
    order_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int = 32,
    descending: bool = True,
) -> DataFrame:
    """Fill a global token budget with the best documents first: order the
    corpus by ``order_col`` (descending by default — quality-first), take
    documents while the EXCLUSIVE running token total stays under
    ``budget_tokens``. This is the "build an N-token training mix from the
    top of the quality ranking" curation step. The boundary document that
    crosses the budget IS included (its ``tokens_before`` tells the loader
    where to truncate); everything after it is dropped.

    Returns ``(id, n_tokens, tokens_before)`` for selected documents.

    Scale shape: the global ordered prefix sum uses the same two-pass
    distributed scan as ``text.pack_sequences`` — range-repartition on the
    ordering key so partitions are globally ordered, window-scan within
    each partition, prefix-sum the O(partitions) per-partition totals on
    the driver, broadcast the base offsets back. A naive
    ``ORDER BY`` window would run the scan on ONE task; driver state here
    is O(partitions), never O(rows).
    """
    from pyspark.sql import Window

    from sql_to_ibis_spark.operators.dedup import normalized_text

    t = normalized_text(F.col(text_col))
    key = F.col(order_col).desc() if descending else F.col(order_col).asc()
    toks = df.select(
        F.col(id_col), F.col(order_col),
        F.coalesce(F.size(F.split(t, " ")), F.lit(0))
        .cast("bigint").alias("n_tokens"),
    ).repartitionByRange(partitions, key, F.col(id_col))

    part = toks.withColumn("__pid", F.spark_partition_id())
    w = (Window.partitionBy("__pid").orderBy(key, F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # persisted: the per-partition totals collect below executes this
    # subtree once, and the returned plan reuses the cached partitions
    # instead of re-tokenizing and re-shuffling the corpus (measured 2×
    # at sf10). Reclaimed by the ContextCleaner when the returned plan
    # goes unreferenced — same contract as the LSH signature tables.
    local = part.withColumn("__local_cum",
                            F.sum("n_tokens").over(w)).persist()

    totals = sorted(
        local.groupBy("__pid").agg(F.max("__local_cum").alias("t"))
        .collect(), key=lambda r: r["__pid"])
    base, offsets = 0, {}
    for r in totals:
        offsets[r["__pid"]] = base
        base += r["t"]
    spark = df.sparkSession
    base_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()],
        "__pid int, __base long")

    return (
        local.join(F.broadcast(base_df), "__pid")
        .select(
            F.col(id_col), F.col("n_tokens"),
            (F.col("__base") + F.col("__local_cum") - F.col("n_tokens"))
            .alias("tokens_before"),
        )
        .filter(F.col("tokens_before") < budget_tokens)
    )


def mix_sources(
    df: DataFrame,
    budgets: dict[str, int],
    order_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    partitions: int = 32,
    descending: bool = True,
) -> DataFrame:
    """Source-weighted training mix: fill a PER-SOURCE token budget
    quality-first — the "60 % web / 30 % books / 10 % code" data-mixing
    step. For each source named in ``budgets``, order its documents by
    ``order_col`` (descending by default) and keep them while the
    within-source EXCLUSIVE running token total stays under that
    source's budget; the boundary document that crosses it is included
    (``tokens_before`` tells the loader where to truncate). Sources not
    in ``budgets`` are dropped before the shuffle (predicate pushdown).

    Returns ``(id, source, n_tokens, tokens_before)`` where
    ``tokens_before`` is the within-source exclusive prefix sum.

    Scale shape — a GROUPED version of ``take_token_budget``'s two-pass
    distributed prefix sum. The naive plan is a window
    ``PARTITION BY source ORDER BY quality``, which funnels every row
    of a source through ONE task — unbounded at 100 TB where a single
    source is tens of TB. Instead: range-repartition on
    ``(source, quality, id)`` so each source occupies a contiguous run
    of partitions and every partition is internally ordered; cumulative
    sums run per (partition, source) in parallel; the collected
    per-(partition, source) totals are O(partitions + sources) rows —
    each source adds at most one extra (pid, source) pair per partition
    it touches, and contiguity bounds the total — whose per-source
    prefix sums become broadcast base offsets. Driver state never
    scales with rows.
    """
    from sql_to_ibis_spark.operators.dedup import normalized_text

    if not budgets:
        raise ValueError("mix_sources: budgets must name at least one "
                         "source (got an empty dict)")

    t = normalized_text(F.col(text_col))
    key = F.col(order_col).desc() if descending else F.col(order_col).asc()
    toks = (
        df.filter(F.col(source_col).isin(*budgets.keys()))
        .select(
            F.col(id_col), F.col(source_col), F.col(order_col),
            F.coalesce(F.size(F.split(t, " ")), F.lit(0))
            .cast("bigint").alias("n_tokens"),
        )
        .repartitionByRange(partitions, F.col(source_col).asc(), key,
                            F.col(id_col))
    )

    part = toks.withColumn("__pid", F.spark_partition_id())
    w = (Window.partitionBy("__pid", source_col)
         .orderBy(key, F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # persisted for the same reason as take_token_budget: the totals
    # collect below runs this subtree once and the returned plan reuses
    # the cached partitions instead of re-tokenizing the corpus
    local = part.withColumn("__local_cum",
                            F.sum("n_tokens").over(w)).persist()

    totals = sorted(
        local.groupBy("__pid", source_col)
        .agg(F.max("__local_cum").alias("t")).collect(),
        key=lambda r: (r[source_col], r["__pid"]))
    offsets: list[tuple[int, str, int]] = []
    run_source, base = None, 0
    for r in totals:
        if r[source_col] != run_source:
            run_source, base = r[source_col], 0
        offsets.append((r["__pid"], r[source_col], base))
        base += r["t"]
    spark = df.sparkSession
    base_df = spark.createDataFrame(
        offsets, f"__pid int, {source_col} string, __base long")
    budget_df = spark.createDataFrame(
        list(budgets.items()), f"{source_col} string, __budget long")

    return (
        local.join(F.broadcast(base_df), ["__pid", source_col])
        .join(F.broadcast(budget_df), source_col)
        .select(
            F.col(id_col), F.col(source_col), F.col("n_tokens"),
            (F.col("__base") + F.col("__local_cum") - F.col("n_tokens"))
            .alias("tokens_before"), F.col("__budget"),
        )
        .filter(F.col("tokens_before") < F.col("__budget"))
        .drop("__budget")
    )
