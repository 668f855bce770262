"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring how ANN is actually deployed on clusters:

* **brute-force cosine** — exact; JVM-side ``zip_with``/``aggregate`` dot
  products in double precision. For one query vector this is a broadcast +
  map + top-k (``TakeOrderedAndProject``): zero shuffles of the big table.
* **random-hyperplane LSH** — the scale path: sign-bit signatures bucket
  vectors so candidate generation is a bucket-key shuffle instead of an
  all-pairs cross join. Hyperplanes are generated from a fixed seed and
  shipped as literal arrays (tiny: H × dim doubles).

Caching contract: ``lsh_ann_candidates`` / ``embedding_near_duplicates``
persist the signature table (it feeds both sides of the bucket self-join)
and return LAZY DataFrames, so the cache is reclaimed by Spark's
ContextCleaner when the returned plan goes unreferenced — materialize
promptly and drop references in long-lived sessions (see the matching note
in ``operators/dedup.py``). ``ivf_ann_topk_batch`` is eager and unpersists
its index frame before returning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array columns (double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    ))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_vs_query(
    embs: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity against one stored vector.

    Plan shape: fetch the 1-row query vector (driver-side metadata, like
    the IVF paths), Arrow-batched map-side similarity — one ``(n, dim) @
    dim`` matvec per batch instead of n·dim interpreted ``zip_with``
    evals — then ``ORDER BY … LIMIT k`` (Catalyst plans
    TakeOrderedAndProject: per-partition heaps, no full sort, no shuffle
    of the corpus).
    """
    qrow = embs.filter(F.col(id_col) == query_vec_id).select(
        _to_double(F.col(vec_col)).alias("qvec")
    ).head()
    if qrow is None or qrow["qvec"] is None:
        # missing / null-vector query id → empty result with the output
        # schema, preserving the pre-eager-fetch contract (the broadcast
        # cross-join plan this replaced yielded zero rows lazily)
        return (embs.select(F.col(id_col),
                            F.lit(None).cast("double").alias("sim"))
                .limit(0))
    qvec = np.asarray(qrow["qvec"], dtype=np.float64)
    sim = _cosine_vs_const_udf(qvec)(F.col(vec_col))
    return (
        embs.filter(F.col(id_col) != query_vec_id)
        .select(F.col(id_col), F.round(sim, 4).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _sig_vn_udf(dim: int, n_planes: int, seed: int = 42):
    """Arrow-batched UDF: embedding → (LSH bucket, L2-normalized vector) in
    one crossing. The batch is a single ``(n, dim) @ (dim, n_planes)``
    matmul + sign/pack plus one norm pass — Spark's ``aggregate``/
    ``zip_with`` higher-order functions are interpreted per element
    (CodegenFallback), so the expression form costs ~n·dim·n_planes
    interpreted evals where numpy does one BLAS call. Normalizing here means
    downstream pair similarity is a plain dot product."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    planes = _hyperplanes(dim, n_planes, seed)
    powers = (1 << np.arange(n_planes, dtype=np.int64))
    schema = T.StructType([
        T.StructField("bucket", T.LongType()),
        T.StructField("vn", T.ArrayType(T.DoubleType())),
    ])

    @pandas_udf(schema)
    def _f(vecs: pd.Series) -> pd.DataFrame:
        n = len(vecs)
        if n == 0:
            return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                 "vn": pd.Series([], dtype=object)})
        # null embeddings propagate as NULL bucket/vn (np.stack needs a
        # rectangular batch, so null rows are excluded from the matmul)
        valid = ~vecs.isna().to_numpy()
        bucket_o = np.full(n, None, dtype=object)
        vn_o = np.full(n, None, dtype=object)
        if valid.any():
            M = np.stack([np.asarray(v, dtype=np.float64)
                          for v in vecs[valid]])
            proj = M @ planes.T
            bucket = ((proj > 0) @ powers).astype(np.int64)
            norms = np.linalg.norm(M, axis=1)
            norms[norms == 0] = 1.0
            vn = M / norms[:, None]
            bucket_o[valid] = bucket
            rows = np.empty(len(vn), dtype=object)
            rows[:] = list(vn)
            vn_o[valid] = rows
        return pd.DataFrame({"bucket": pd.Series(bucket_o),
                             "vn": pd.Series(vn_o)})

    return _f


def _cosine_vs_const_udf(qvec: np.ndarray, normalize: bool = True):
    """Arrow-batched cosine (or plain dot when ``normalize=False``) of an
    embedding column against one constant query vector shipped in the UDF
    closure — one ``(n, dim) @ dim`` matvec per batch. Division semantics
    match the JVM expression it replaces (0-norm → inf/nan, no masking);
    null embeddings → null sim."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(qvec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    @pandas_udf(T.DoubleType())
    def _f(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype="float64")
        valid = ~vecs.isna().to_numpy()
        out = np.full(n, np.nan)
        if valid.any():
            M = np.stack([np.asarray(v, dtype=np.float64)
                          for v in vecs[valid]])
            dots = M @ q
            if normalize:
                with np.errstate(divide="ignore", invalid="ignore"):
                    dots = dots / (np.linalg.norm(M, axis=1) * qn)
            out[valid] = dots
        res = pd.Series(out)
        if not valid.all():
            res = res.astype(object)
            res[~valid] = None
        return res

    return _f


def _normalize_udf():
    """Arrow-batched L2 normalization of an embedding column (zero vectors
    pass through unchanged, matching ``x / max(norm, …)`` guards upstream;
    null embeddings stay null)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def _f(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype=object)
        valid = ~vecs.isna().to_numpy()
        out = np.full(n, None, dtype=object)
        if valid.any():
            M = np.stack([np.asarray(v, dtype=np.float64)
                          for v in vecs[valid]])
            norms = np.linalg.norm(M, axis=1)
            norms[norms == 0] = 1.0
            vn = M / norms[:, None]
            rows = np.empty(len(vn), dtype=object)
            rows[:] = list(vn)
            out[valid] = rows
        return pd.Series(out)

    return _f


def _pair_dot_udf():
    """Arrow-batched dot product over pair rows of equal-dim vectors (one
    ``einsum`` per batch; for already-normalized inputs this IS cosine)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def _f(a: pd.Series, b: pd.Series) -> pd.Series:
        n = len(a)
        if n == 0:
            return pd.Series([], dtype="float64")
        # null on either side → NULL dot (rectangular batch for np.stack)
        valid = ~(a.isna().to_numpy() | b.isna().to_numpy())
        out = np.full(n, np.nan)
        if valid.any():
            A = np.stack([np.asarray(x, dtype=np.float64) for x in a[valid]])
            B = np.stack([np.asarray(x, dtype=np.float64) for x in b[valid]])
            out[valid] = np.einsum("ij,ij->i", A, B)
        res = pd.Series(out)
        if not valid.all():
            res = res.astype(object)
            res[~valid] = None
        return res

    return _f


def lsh_signature(
    vec_col: Column, dim: int, n_planes: int = 16, seed: int = 42
) -> Column:
    """Sign-bit LSH bucket id: ``sum(2^i · [v·h_i > 0])`` as a long
    (Arrow-batched matmul — see ``_sig_vn_udf``)."""
    return _sig_vn_udf(dim, n_planes, seed)(vec_col)["bucket"]


def lsh_ann_candidates(
    embs: DataFrame,
    dim: int = 64,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Approximate nearest neighbors for *every* vector: bucket by LSH
    signature, rank candidates within each bucket by exact cosine.

    The join is co-located on the bucket key — with 2^n_planes buckets the
    expected bucket size is n/2^planes, so per-bucket pairwise work stays
    bounded as n grows (raise n_planes with scale).
    """
    from pyspark.sql import Window

    # bucket + normalized vector in one Arrow crossing; persisted because
    # the bucket self-join reads the signature table twice
    sv = _sig_vn_udf(dim, n_planes)(F.col(vec_col))
    sig = embs.select(
        F.col(id_col).alias("id"),
        sv["vn"].alias("vn"),
        sv["bucket"].alias("bucket"),
    ).persist()
    pairs = (
        sig.alias("l")
        .join(sig.alias("r"),
              (F.col("l.bucket") == F.col("r.bucket"))
              & (F.col("l.id") != F.col("r.id")))
        .select(
            F.col("l.id").alias("query_id"),
            F.col("r.id").alias("neighbor_id"),
            # inputs are unit vectors → dot == cosine
            F.round(_pair_dot_udf()(F.col("l.vn"), F.col("r.vn")), 4)
             .alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                               F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def build_ivf_index(
    embs: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, np.ndarray]:
    """IVF index build: k-means the corpus into ``nlist`` coarse cells and
    assign every vector to its nearest centroid.

    Returns (assigned_df with a ``cell`` column, centroids ndarray). The fit
    is an eager Spark job (index building always is); the assigned frame is
    lazy and should be persisted/written partitioned-by-cell in a real
    deployment so searches prune cells at the scan.

    Vectors are L2-normalized first, so euclidean k-means approximates
    spherical (cosine) clustering.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # null embeddings cannot be indexed (KMeans rejects null features);
    # dropping them here mirrors how an ANN service treats missing vectors.
    # Normalization is one Arrow matvec per batch (zero vectors pass
    # through unnormalized rather than becoming NaN) — the interpreted
    # per-element transform/aggregate form cost ~n·dim evals.
    norm = embs.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        _normalize_udf()(F.col(vec_col)).alias("nvec"),
    )
    with_vec = norm.withColumn("features", array_to_vector("nvec"))
    model = KMeans(k=nlist, seed=seed, featuresCol="features").fit(with_vec)
    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    assigned = model.transform(with_vec).select(
        "id", "nvec", F.col("prediction").alias("cell"))
    return assigned, centroids


def ivf_ann_topk(
    embs: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: search only the ``nprobe`` cells whose
    centroids are nearest the query — scanning ~nprobe/nlist of the corpus
    instead of all of it (the standard recall/cost dial; raise nlist with
    corpus size, nprobe with recall needs).

    The cell filter is a plain ``isin`` predicate: with the index written
    partitioned-by-cell it becomes partition pruning at the parquet scan.
    """
    assigned, centroids = build_ivf_index(embs, nlist, id_col, vec_col)
    qrow = assigned.filter(F.col("id") == query_vec_id) \
                   .select("nvec").head()
    if qrow is None:
        raise ValueError(f"query vector {query_vec_id} not found")
    qvec = np.array(qrow["nvec"])
    cell_dist = ((centroids - qvec) ** 2).sum(axis=1)
    probe_cells = [int(c) for c in np.argsort(cell_dist)[:nprobe]]

    # normalized → dot == cosine; Arrow matvec against the closure constant
    sim = _cosine_vs_const_udf(qvec, normalize=False)(F.col("nvec"))
    return (
        assigned.filter(F.col("cell").isin(probe_cells))
        .filter(F.col("id") != query_vec_id)
        .select(F.col("id").alias(id_col), F.round(sim, 4).alias("sim"),
                F.col("cell"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _ivf_batch_plan(
    embs: DataFrame,
    query_vec_ids: list[int],
    k: int,
    nlist: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Lazy batched-IVF plan (see ``ivf_ann_topk_batch``): returns
    ``(result_df, persisted_assigned_df)`` so the public wrapper can
    unpersist the index frame after materializing. Split out so tests can
    inspect the plan — it must be ONE broadcast join + ONE window, never a
    per-query union chain."""
    from pyspark.sql import Window

    assigned, centroids = build_ivf_index(embs, nlist, id_col, vec_col)
    assigned = assigned.persist()
    qrows = {
        r["id"]: np.array(r["nvec"])
        for r in assigned.filter(F.col("id").isin(list(query_vec_ids)))
                         .select("id", "nvec").collect()
    }
    missing = [q for q in query_vec_ids if q not in qrows]
    if missing:
        raise ValueError(f"query vectors not found: {missing}")
    # probe-cell selection is pure centroid math: (nq, nlist) distances on
    # the driver (metadata scale — centroids are nlist×dim). Row-wise
    # argsort matches the single-query path bit-for-bit.
    Q = np.stack([qrows[q] for q in query_vec_ids])
    d2 = ((Q[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(d2, axis=1)[:, :nprobe]
    spark = embs.sparkSession
    qdf = spark.createDataFrame(
        [(int(qid), [int(c) for c in probe[i]],
          [float(x) for x in Q[i]])
         for i, qid in enumerate(query_vec_ids)],
        "query_id long, cells array<int>, qvec array<double>",
    ).select("query_id", F.explode("cells").alias("cell"), "qvec")
    # ONE broadcast join against the assigned corpus: each corpus row in a
    # probed cell meets exactly the queries probing that cell; top-k per
    # query is one row_number window. No driver loop, no union chain —
    # plan size is O(1) in the number of queries.
    # normalized → dot == cosine; Arrow-batched pairwise einsum
    sim = _pair_dot_udf()(F.col("nvec"), F.col("qvec"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                               F.col(id_col).asc())
    out = (
        assigned.join(F.broadcast(qdf), "cell")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias(id_col),
                F.round(sim, 4).alias("sim"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k).drop("__rn")
    )
    return out, assigned


def ivf_ann_topk_batch(
    embs: DataFrame,
    query_vec_ids: list[int],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batched IVF top-k: ONE index build serves every query (the way an
    ANN service amortizes the k-means fit), and ALL queries run as ONE
    joined plan: the (query_id, probe_cell, qvec) table — tiny, nq×nprobe
    rows — is broadcast against the cell-assigned corpus, then a single
    ``row_number`` window takes top-k per query. Collecting the query
    *vectors* is driver-side metadata work (they're needed for centroid
    distances); the corpus is only touched by the one join.

    Returns ``(query_id, vec_id, sim)`` with ``k`` rows per query, sim
    descending within each query.
    """
    out, assigned = _ivf_batch_plan(embs, query_vec_ids, k, nlist, nprobe,
                                    id_col, vec_col)
    try:
        # materialize before unpersisting the shared index frame
        return out.localCheckpoint()
    finally:
        assigned.unpersist()


def embedding_near_duplicates(
    embs: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs above ``threshold`` using LSH
    bucketing for candidate generation (same scale argument as above)."""
    sv = _sig_vn_udf(dim, n_planes)(F.col(vec_col))
    sig = embs.select(
        F.col(id_col).alias("id"),
        sv["vn"].alias("vn"),
        sv["bucket"].alias("bucket"),
    ).persist()
    return (
        sig.alias("l")
        .join(sig.alias("r"),
              (F.col("l.bucket") == F.col("r.bucket"))
              & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
            F.round(_pair_dot_udf()(F.col("l.vn"), F.col("r.vn")), 4)
             .alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
