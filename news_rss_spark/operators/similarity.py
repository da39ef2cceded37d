"""Embedding similarity search (engine-new, training-data pipeline).

- ``cosine_topk``: brute-force top-k — the correctness baseline.  The dot
  product is a JVM-side ``aggregate(zip_with(...))`` expression: no Python,
  no shuffle except the final top-k (which AQE keeps tiny: per-partition
  local top-k then a k-row merge via sort-limit).
- ``lsh_bucket_topk``: the scale path — random-hyperplane (sign) LSH.
  Signatures are computed by a vectorized pandas UDF (one numpy matmul per
  Arrow batch); the query probes only its own bucket (+ optional multiprobe
  by flipping bits), turning a 100 TB scan into a bucket-pruned lookup.
  Bucket assignment is deterministic (seeded hyperplanes).
- ``embedding_near_dup_pairs``: cosine >= threshold pair mining, bucketed
  by LSH so the n² verify stays inside buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim_col(vec_col, query: list[float]):
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.sqrt(np.dot(query, query)))
    denom = _norm(vec_col) * F.lit(qn)
    return F.when(denom > 0, _dot(vec_col, q) / denom).otherwise(F.lit(0.0))


def cosine_topk(df: DataFrame, query: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_sim_col(F.col(vec_col), query), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------- LSH

def hyperplanes(dim: int, n_planes: int = 12, seed: int = 42,
                dtype=np.float32) -> np.ndarray:
    """Seeded random hyperplanes.  ``dtype=np.float64`` (with embeddings
    cast to ``array<double>``) makes the sign computation bit-reproducible
    in double precision — the shape the DuckDB oracle queries pin."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(dtype)


def signature_udf(planes: np.ndarray):
    """Vectorized sign-LSH signature: one numpy matmul per Arrow batch."""

    @pandas_udf("int")
    def sig(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # (batch, dim)
        bits = (mat @ planes.T) > 0  # (batch, n_planes)
        out = np.zeros(len(v), dtype=np.int32)
        for j in range(planes.shape[0]):
            out |= bits[:, j].astype(np.int32) << j
        return pd.Series(out)

    return sig


def with_lsh_bucket(df: DataFrame, dim: int, n_planes: int = 12,
                    seed: int = 42, vec_col: str = "embedding",
                    out: str = "bucket", dtype=np.float32) -> DataFrame:
    planes = hyperplanes(dim, n_planes, seed, dtype=dtype)
    return df.withColumn(out, signature_udf(planes)(F.col(vec_col)))


def _query_buckets(query: list[float], planes: np.ndarray,
                   multiprobe: int = 0) -> list[int]:
    q = np.asarray(query, dtype=planes.dtype)
    margins = planes @ q
    base = 0
    for j, m in enumerate(margins):
        base |= int(m > 0) << j
    buckets = [base]
    if multiprobe:
        # flip the bits with the smallest |margin| (most uncertain planes)
        order = np.argsort(np.abs(margins))[:multiprobe]
        for j in order:
            buckets.append(base ^ (1 << int(j)))
    return buckets


def lsh_bucket_topk(df: DataFrame, query: list[float], k: int = 10,
                    dim: int | None = None, n_planes: int = 12,
                    seed: int = 42, multiprobe: int = 3,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id", dtype=np.float32) -> DataFrame:
    """ANN top-k: probe the query's LSH bucket (+ multiprobe neighbors).

    At scale the table is WRITTEN partitioned by bucket, so this filter is
    partition pruning — the scan touches only probed buckets.
    """
    dim = dim or len(query)
    planes = hyperplanes(dim, n_planes, seed, dtype=dtype)
    bucketed = with_lsh_bucket(df, dim, n_planes, seed, vec_col, dtype=dtype)
    probes = _query_buckets(query, planes, multiprobe)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, query, k, vec_col, id_col)


# ---------------------------------------------------------------- IVF

def train_ivf_centroids(df: DataFrame, n_cells: int = 16, seed: int = 42,
                        sample: int = 2048, iters: int = 10,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> np.ndarray:
    """Spherical k-means centroids trained driver-side on a DETERMINISTIC
    sample (first ``sample`` rows by id) — the standard IVF recipe: train on
    a sample, assign distributed.  Returns (n_cells, dim) L2-normalized."""
    rows = (df.orderBy(id_col).limit(sample)
            .select(vec_col).collect())
    x = np.stack([np.asarray(r[0], dtype=np.float32) for r in rows])
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def pinned_centroids(dim: int, n_cells: int = 16, seed: int = 7) -> np.ndarray:
    """Deterministic L2-normalized float64 centroids from a seeded RNG —
    no training, no data dependence.  With these passed to :func:`ivf_topk`
    the whole IVF plan (cell assignment, probe selection, cosine top-k) is
    SQL-expressible, so the driver's DuckDB oracle can check it exactly;
    quality-bearing TRAINED centroids stay recall-tested in pytest."""
    rng = np.random.RandomState(seed)
    c = rng.randn(n_cells, dim)
    return c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)


def cell_udf(centroids: np.ndarray):
    """Vectorized IVF cell assignment: one numpy matmul per Arrow batch.
    Computation dtype follows the centroids' dtype (float32 for trained
    production centroids; float64 for the pinned oracle-checkable path)."""

    @pandas_udf("int")
    def cell(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(centroids.dtype)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(mat @ centroids.T, axis=1).astype(np.int32))

    return cell


def with_ivf_cell(df: DataFrame, centroids: np.ndarray,
                  vec_col: str = "embedding", out: str = "cell") -> DataFrame:
    return df.withColumn(out, cell_udf(centroids)(F.col(vec_col)))


def ivf_topk(df: DataFrame, query: list[float], k: int = 10,
             n_cells: int = 16, n_probe: int = 4, seed: int = 42,
             vec_col: str = "embedding", id_col: str = "vec_id",
             centroids: np.ndarray | None = None) -> DataFrame:
    """IVF ANN top-k: score only the ``n_probe`` cells whose centroids are
    nearest the query.  At scale the table is written partitioned by cell,
    so the filter is partition pruning and the scan touches n_probe/n_cells
    of the data; centroids are trained once and reused across queries."""
    if centroids is None:
        centroids = train_ivf_centroids(df, n_cells, seed,
                                        vec_col=vec_col, id_col=id_col)
    q = np.asarray(query, dtype=centroids.dtype)
    q = q / max(np.linalg.norm(q), 1e-12)
    probes = [int(i) for i in np.argsort(-(centroids @ q))[:n_probe]]
    cand = with_ivf_cell(df, centroids, vec_col).filter(F.col("cell").isin(probes))
    return cosine_topk(cand, query, k, vec_col, id_col)


# ------------------------------------------------- product quantization

def pinned_pq_codebooks(dim: int = 64, m: int = 8, k: int = 16,
                        seed: int = 13) -> np.ndarray:
    """Deterministic float64 PQ codebooks (``m`` subspaces × ``k``
    centroids × ``dim//m`` dims) from a seeded RNG — no training, no data
    dependence, so the whole encode + ADC plan is SQL-expressible and the
    DuckDB oracle can check it exactly (same contract as
    :func:`pinned_centroids`); quality-bearing TRAINED codebooks stay
    recall-tested in pytest via :func:`train_pq_codebooks`."""
    rng = np.random.RandomState(seed)
    return rng.randn(m, k, dim // m)


def train_pq_codebooks(df: DataFrame, dim: int = 64, m: int = 8,
                       k: int = 16, seed: int = 42, sample: int = 2048,
                       iters: int = 10, vec_col: str = "embedding",
                       id_col: str = "vec_id") -> np.ndarray:
    """Per-subspace k-means codebooks trained driver-side on a
    DETERMINISTIC sample (first ``sample`` rows by id) — the standard PQ
    recipe (Jégou et al. 2011 "Product Quantization for Nearest Neighbor
    Search"): train on a sample, encode distributed."""
    rows = df.orderBy(id_col).limit(sample).select(vec_col).collect()
    x = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, dsub))
    for j in range(m):
        s = x[:, j * dsub:(j + 1) * dsub]
        cent = s[rng.choice(len(s), size=min(k, len(s)), replace=False)]
        for _ in range(iters):
            d = ((s[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = np.argmin(d, axis=1)
            for c in range(len(cent)):
                members = s[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def _sq_l2(sub, cent_lit):
    """Left-fold Σ(x−y)² — the fold order is the cross-engine float64
    contract (DuckDB's ``list_reduce`` is the same left fold)."""
    return F.aggregate(F.zip_with(sub, cent_lit, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, t: acc + t)


def pq_encode(df: DataFrame, codebooks: np.ndarray,
              vec_col: str = "embedding", out: str = "codes") -> DataFrame:
    """PQ encode: per subspace, the index of the L2-nearest codebook
    centroid; ``out`` is an array<int> of length ``m``.

    Built entirely from JVM expressions (slice / zip_with / aggregate /
    array_position) — whole-stage codegen, no Python in the hot path.
    At 100 TB the codes column is ``m`` small ints vs ``dim`` floats
    (64-dim float32 → 8 codes = 16-32× smaller scan for every downstream
    ADC query); ties break to the FIRST minimal centroid in both engines
    (numpy argmin, Spark/DuckDB first array_position of the min)."""
    m, _, dsub = codebooks.shape
    v = F.col(vec_col).cast("array<double>")

    def _dists_to(sub):
        # a one-arg closure: a default-arg lambda would have arity 2 and
        # PySpark would bind the second parameter to the ELEMENT INDEX
        return lambda c: _sq_l2(sub, c)

    codes = []
    for j in range(m):
        sub = F.slice(v, j * dsub + 1, dsub)
        cb_j = F.array(*[
            F.array(*[F.lit(float(x)) for x in cent])
            for cent in codebooks[j]])
        d = F.transform(cb_j, _dists_to(sub))
        codes.append((F.array_position(d, F.array_min(d)) - 1).cast("int"))
    return df.withColumn(out, F.array(*codes))


def adc_lut(query: list[float], codebooks: np.ndarray) -> list[list[float]]:
    """The query's m×k squared-distance lookup table, computed in plain
    Python float64 left-fold order.  The values are embedded as LITERALS
    in both the Spark plan and the DuckDB oracle, so the cross-engine
    contract is on these exact bits — shared here so the two sides can
    never drift."""
    m, _, dsub = codebooks.shape
    lut = []
    for j in range(m):
        qs = [float(x) for x in query[j * dsub:(j + 1) * dsub]]
        row = []
        for cent in codebooks[j]:
            acc = 0.0
            for x, y in zip(qs, cent):
                acc = acc + (x - float(y)) * (x - float(y))
            row.append(acc)
        lut.append(row)
    return lut


def pq_adc_topk(df: DataFrame, query: list[float], codebooks: np.ndarray,
                k: int = 10, vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """PQ asymmetric-distance top-k (ADC): the query's per-subspace
    lookup table (m × k squared distances to every centroid) is computed
    ONCE driver-side and embedded as a literal, so scoring a vector is
    ``m`` table lookups + a left-fold sum over its codes — never touches
    the original embedding.  Returns ``(id, code_key, pq_dist)`` where
    ``code_key`` packs the codes into one int64 (4 bits per code) so the
    oracle pins the encode exactly even where distances tie.

    Scale shape: one codegen'd projection over the codes column, then
    TakeOrdered — no shuffle, no UDF, no join; at 100 TB the scan reads
    the m-byte codes instead of the dim×4-byte vectors."""
    m, n_cent, dsub = codebooks.shape
    lut = adc_lut(query, codebooks)
    lut_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
    enc = pq_encode(df, codebooks, vec_col)
    per = F.zip_with(lut_lit, F.col("codes"),
                     lambda l, c: F.element_at(l, c + 1))
    adist = F.aggregate(per, F.lit(0.0), lambda acc, t: acc + t)
    terms = [F.shiftleft(F.element_at(F.col("codes"), j + 1).cast("long"),
                         j * 4) for j in range(m)]
    code_key = terms[0]
    for t in terms[1:]:
        code_key = code_key + t
    return (enc.select(F.col(id_col), code_key.alias("code_key"),
                       adist.alias("_adist"))
            .orderBy(F.col("_adist").asc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, "code_key",
                    F.round(F.col("_adist"), 6).alias("pq_dist")))


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                             dim: int = 64, n_planes: int = 8,
                             seed: int = 42, vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             dtype=np.float32) -> DataFrame:
    """Cosine near-duplicate pairs, LSH-bucketed: the quadratic verify runs
    only within buckets (near-identical vectors collide with high prob.)."""
    b = with_lsh_bucket(df, dim, n_planes, seed, vec_col, dtype=dtype)
    a = b.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket")
    c = b.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
                 F.col("bucket").alias("bucket_b"))
    pairs = a.join(c, (F.col("bucket") == F.col("bucket_b")) & (F.col("a") < F.col("b")))
    denom = _norm(F.col("va")) * _norm(F.col("vb"))
    cos = F.when(denom > 0, _dot(F.col("va"), F.col("vb")) / denom).otherwise(F.lit(0.0))
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def brute_force_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                               vec_col: str = "embedding",
                               id_col: str = "vec_id") -> DataFrame:
    """Exact pair mining (oracle-checkable); quadratic — small inputs only."""
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    c = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    pairs = a.join(c, F.col("a") < F.col("b"))
    denom = _norm(F.col("va")) * _norm(F.col("vb"))
    cos = F.when(denom > 0, _dot(F.col("va"), F.col("vb")) / denom).otherwise(F.lit(0.0))
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def random_projection(df: DataFrame, planes: "np.ndarray",
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``k = planes.shape[0]``
    dimensions: ``(id, dim, value)`` exploded rows with
    ``value = round(<v, planes[dim]>, 6)``.

    THE preprocessing step before any dense pair mining at 100 TB:
    distances are preserved within (1 +/- eps) w.h.p. for
    k = O(ln n / eps^2) — independent of the input dimension — so
    SemDedup / near-dup / clustering passes run on k floats instead of
    d (pass ``hyperplanes(d, k, seed)/sqrt(k)`` for the standard
    Gaussian JL map).  Plan: one codegen'd projection, ZERO shuffle —
    each output dim is a zip_with multiply + ordered left-fold (the
    list_dot_product-equivalent fold every cosine oracle in this repo
    already pins), rounded to 6 so the doubles hash-match DuckDB.
    Exploded (id, dim, value) output keeps the correctness-gate value
    hash schema-stable (array columns hash engine-specifically)."""
    arr = F.col(vec_col).cast("array<double>")
    outs = []
    for j in range(planes.shape[0]):
        lits = F.array(*[F.lit(float(x)) for x in planes[j]])
        dot = F.aggregate(F.zip_with(arr, lits, lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        outs.append(F.round(dot, 6))
    return df.select(F.col(id_col),
                     F.posexplode(F.array(*outs)).alias("dim", "value"))
