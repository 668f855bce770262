"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the whole point of these implementations):

* **exact_dedup** — one hash shuffle on the dedup key (window
  ``row_number`` partitioned by key). No global sort, no collect.
* **minhash_lsh_candidates** — the classic shingle → minhash → band →
  bucket-join pipeline, expressed entirely with JVM-side higher-order
  functions (``transform``/``aggregate``/``xxhash64``): per-row work is
  embarrassingly parallel; the only shuffle is ``groupBy(band_hash)``.
  Candidate pairs are produced per-bucket, never via an all-pairs cross
  join, so cost is O(sum of bucket sizes squared) ≈ linear for
  well-distributed data instead of O(n²).
* **simhash** — per-token hashes computed JVM-side (``xxhash64``); only the
  ±1 bit accumulation runs in an Arrow-batched pandas UDF as one segmented
  numpy reduction per batch (bit-vote accumulation is a poor fit for
  Catalyst expressions). Banding on 16-bit quarters finds all pairs within
  Hamming distance 3 of each other without pairwise comparison.
* **ngram_jaccard_verify** — exact verification joined back onto candidate
  pairs only (never the full table).
"""

from __future__ import annotations

import warnings

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def normalized_text(col: Column) -> Column:
    """Whitespace-collapsed, trimmed, lowercased text (the canonical dedup
    key normalization)."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def exact_dedup(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    normalize_col: str | None = None,
) -> DataFrame:
    """Keep the first row (by ``order_col``) per exact key.

    If ``normalize_col`` is given, a normalized copy named ``<col>_norm`` is
    added and may be used in ``key_cols`` (e.g. ``text_norm``).

    Single shuffle on the key; survives any scale where individual keys fit
    a partition (hot keys are bounded by AQE skew handling).
    """
    from pyspark.sql import Window

    out = df
    if normalize_col is not None:
        out = out.withColumn(f"{normalize_col}_norm",
                             normalized_text(F.col(normalize_col)))
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    out = out.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    drop = ["__rn"]
    if normalize_col is not None:
        drop.append(f"{normalize_col}_norm")
    return out.drop(*drop)


# ------------------------------------------------------------------ MinHash

_HASH_SPACE = (1 << 31) - 1  # all hashing folded into [0, 2^31): keeps every
                             # downstream multiply-add inside signed-64 range
                             # (Spark 4 ANSI mode throws on long overflow, so
                             # wraparound tricks are off the table)


def _token_hashes(text_col: Column) -> Column:
    """31-bit hash per whitespace token (tokens hashed exactly once)."""
    tokens = F.split(normalized_text(text_col), " ")
    return F.transform(tokens, lambda t: F.pmod(F.xxhash64(t), F.lit(_HASH_SPACE)))


def _shingle_hashes(text_col: Column, shingle_size: int) -> Column:
    """Hash of each word ``shingle_size``-gram, computed as a polynomial over
    the token-hash array (no per-shingle string building — measured ~9×
    faster than join-then-xxhash at sf0.1). Short docs yield one shingle."""
    th = _token_hashes(text_col)
    n = F.size(th)
    starts = F.sequence(F.lit(1), F.greatest(n - shingle_size + 1, F.lit(1)))

    def poly(i: Column) -> Column:
        return F.aggregate(
            F.slice(th, i, shingle_size),
            F.lit(0).cast("long"),
            lambda acc, x: F.pmod(acc * 31 + x, F.lit(_HASH_SPACE)),
        )

    return F.transform(starts, poly)


def _minhash_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic multipliers + offsets for universal hashing. Kept below
    2^29 so a·x + b with x < 2^31 never exceeds 2^61 — ANSI-mode-safe (Spark
    4 throws on long overflow by default, so we cannot rely on wraparound)."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 29) | 1, rng.randrange(0, 1 << 29))
        for _ in range(num_hashes)
    ]


def _perm(a: int, b: int):
    """Unary lambda for F.transform (pyspark introspects lambda arity, so
    the constants must be closed over, not default-arg captured).

    The pmod is ESSENTIAL: without it ``a·h + b`` is monotonic in ``h`` and
    every "permutation" picks the same argmin shingle — the signature
    degenerates to 64 copies of one minhash (planted-dup recall gate in
    tests/test_quality_gates.py caught this). Reducing mod a prime breaks
    monotonicity and makes each (a, b) an independent universal hash."""
    return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_HASH_SPACE))


def minhash_signature(
    text_col: Column, num_hashes: int = 64, shingle_size: int = 5
) -> Column:
    """Array of ``num_hashes`` minhash values, entirely via JVM expressions.

    Cost model: shingle hashes are computed exactly ONCE; the ``num_hashes``
    permutations are derived by universal hashing (``a_i·h + b_i``, all
    within signed-64 range) — integer multiply-adds instead of repeated
    string hashing, so signature cost is O(shingles · num_hashes) integer ops
    per row and stays inside whole-stage codegen with no Python."""
    base = _shingle_hashes(text_col, shingle_size)
    mins = [
        F.array_min(F.transform(base, _perm(a, b)))
        for a, b in _minhash_params(num_hashes)
    ]
    return F.array(*mins)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH.

    Returns ``(id_a, id_b, n_matching_bands, est_jaccard)`` with
    ``id_a < id_b``. ``est_jaccard`` is the fraction of matching signature
    positions (an unbiased Jaccard estimate).

    Shuffles: one ``groupBy`` on (band, band_hash) for bucketing, one join
    back to signatures for the estimate. No cross join anywhere.
    """
    rows_per_band = num_hashes // bands
    # two-phase projection: shingle hashes once into __hs, then num_hashes
    # cheap integer permutations over it (CollapseProject keeps the split —
    # verified via .explain: exactly one shingle pipeline in the plan)
    hashed = df.select(
        F.col(id_col).alias("id"),
        _shingle_hashes(F.col(text_col), shingle_size).alias("__hs"),
    )
    sig = hashed.select(
        "id",
        F.array(*[
            F.array_min(F.transform(F.col("__hs"), _perm(a, b)))
            for a, b in _minhash_params(num_hashes)
        ]).alias("sig"),
    )
    # the signature table feeds three plan branches (banding + both sides of
    # the estimate join); persist it so the shingle/minhash pipeline runs
    # exactly once. Size is id + num_hashes longs ≈ 0.5 KB/row — at 1B docs
    # that's ~0.5 TB spread over the cluster, MEMORY_AND_DISK spills fine.
    sig = sig.persist()
    band_cols = [
        F.xxhash64(
            F.lit(b), *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select("id", *band_cols)
    stacked = banded.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bh"))
                for b in range(bands)
            ])
        ).alias("e"),
    ).select("id", "e.band", "e.bh")
    # per-bucket pair generation: ids sharing (band, band_hash)
    pairs = (
        stacked.alias("l")
        .join(stacked.alias("r"),
              (F.col("l.band") == F.col("r.band"))
              & (F.col("l.bh") == F.col("r.bh"))
              & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_matching_bands"))
    )
    # unbiased jaccard estimate from full signatures (join candidates only)
    sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b",
                   lambda a, b: F.when(a == b, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(num_hashes)
    return (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", "n_matching_bands",
                F.round(est, 4).alias("est_jaccard"))
    )


# ------------------------------------------------------------------ SimHash

@pandas_udf(T.LongType())
def _simhash_from_hashes(hash_arrays: pd.Series) -> pd.Series:
    """64-bit SimHash from per-token 64-bit hashes (computed JVM-side with
    ``xxhash64`` — deterministic across processes). The whole Arrow batch is
    accumulated with one numpy segmented reduction: unpack every token hash
    into a (total_tokens, 64) ±1 bit matrix and ``np.add.reduceat`` over the
    per-document offsets — no Python-level per-token loop (~batch-size×
    faster than hashing tokens one by one in Python)."""
    import numpy as np

    n = len(hash_arrays)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return pd.Series(out)
    lens = hash_arrays.map(len).to_numpy(dtype=np.int64)
    nonzero = lens > 0
    if lens.sum() == 0:
        return pd.Series(out)
    flat = np.concatenate(
        [np.asarray(a, dtype=np.int64) for a in hash_arrays if len(a)]
    ).view(np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    # (total_tokens, 64) of ±1 contributions, then one segmented sum per doc
    contrib = (((flat[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
               * 2 - 1)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    acc = np.add.reduceat(contrib, offsets[nonzero], axis=0)
    sig = ((acc > 0).astype(np.uint64) << shifts).sum(axis=1,
                                                      dtype=np.uint64)
    out[nonzero] = sig.view(np.int64)  # two's-complement for Spark LongType
    return pd.Series(out)


def simhash_buckets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash near-dup candidates: documents whose 64-bit signatures share
    at least one of four 16-bit bands (catches all pairs with Hamming
    distance ≤ 3). Returns ``(id_a, id_b, hamming)``.

    Token hashing stays JVM-side (``xxhash64`` inside whole-stage codegen);
    only the ±1 bit accumulation crosses into the Arrow-batched pandas UDF,
    where it is a single segmented numpy reduction per batch."""
    tokens = F.filter(F.split(normalized_text(F.col(text_col)), " "),
                      lambda t: t != "")
    tok_hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    sig = df.select(F.col(id_col).alias("id"),
                    _simhash_from_hashes(tok_hashes).alias("sim"))
    bands = sig.select(
        "id", "sim",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("sim"), b * 16)
                 .bitwiseAND(F.lit(0xFFFF)).alias("bh"),
            )
            for b in range(4)
        ])).alias("e"),
    ).select("id", "sim", "e.band", "e.bh")
    hamming = F.bit_count(F.col("l.sim").bitwiseXOR(F.col("r.sim")))
    return (
        bands.alias("l")
        .join(bands.alias("r"),
              (F.col("l.band") == F.col("r.band"))
              & (F.col("l.bh") == F.col("r.bh"))
              & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                hamming.alias("hamming"))
        .distinct()
    )


# ------------------------------------------------------- Jaccard verification

def ngram_jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """n-gram Jaccard on candidate pairs only (two hash joins; never touches
    non-candidate rows) — over hashed shingle sets, so it's exact up to
    negligible 2^-31 hash collisions. Returns pairs with
    ``jaccard >= threshold``."""
    sets_ = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(_shingle_hashes(F.col(text_col), shingle_size)).alias("sh"),
    )
    a = sets_.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets_.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / F.when(union > 0, union).otherwise(F.lit(1))
    return (
        candidates.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------- duplicate-cluster collapse

def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over near-duplicate pairs → (id, component)
    with ``component`` = min member id.

    MinHash/SimHash emit *pairs*; deduplication needs *clusters* (A~B and
    B~C must collapse to one canonical doc even if A~C was never emitted).
    Each round combines min-label propagation (every node adopts the
    smallest label among itself and its neighbors) with POINTER JUMPING
    (``component := component's component``) so long chains converge in
    O(log diameter) rounds, not O(diameter). Labels are
    ``localCheckpoint``-ed per round — truncating the lineage is what keeps
    the plan from growing superlinearly (a persisted-but-unchecked chain of
    20 self-joins overflows Catalyst's plan-string stack).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"),
                            F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    iterations = 0
    for _ in range(max_iterations):
        iterations += 1
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy(edges["src"].alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (F.coalesce(F.col("nbr_component"), F.col("component"))
                 < F.col("component")).alias("__changed"),
            )
            .localCheckpoint()
        )
        changed = updated.filter(F.col("__changed")).limit(1).count()
        stepped = updated.drop("__changed")
        # pointer jumping: follow the label one hop (labels cover every
        # node id, so the join always matches) — doubles the effective
        # propagation distance each round
        ptr = stepped.select(F.col("id").alias("cid"),
                             F.col("component").alias("cc"))
        labels = (
            stepped.join(ptr, stepped["component"] == ptr["cid"], "left")
            .select("id",
                    F.coalesce("cc", "component").alias("component"))
            .localCheckpoint()
        )
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if stats is not None:
        stats["iterations"] = iterations
        stats["converged"] = converged
    if not converged:
        # labels may be non-minimal → silent under-deduplication downstream;
        # surface it loudly instead of returning quietly
        warnings.warn(
            f"connected_components did not converge within {max_iterations} "
            f"iterations; component labels may be non-minimal — raise "
            f"max_iterations (chains longer than the cap exist in the "
            f"candidate graph)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    **minhash_kwargs,
) -> DataFrame:
    """End-to-end near-dup collapse: MinHash-LSH candidates → exact n-gram
    Jaccard verification → connected components → one surviving row per
    cluster (min id), all non-duplicates untouched.

    Returns the input rows with duplicates removed — the operator a
    pretraining pipeline actually runs. Each stage shuffles only on
    bucket/pair/component keys; nothing is ever collected to the driver.
    """
    candidates = minhash_lsh_candidates(df, text_col, id_col,
                                        **minhash_kwargs)
    verified = ngram_jaccard_verify(df, candidates.select("id_a", "id_b"),
                                    text_col, id_col,
                                    threshold=jaccard_threshold)
    components = connected_components(verified)
    losers = components.filter(F.col("id") != F.col("component")) \
                       .select(F.col("id").alias("__loser"))
    return (
        df.join(losers, df[id_col] == F.col("__loser"), "left_anti")
    )
