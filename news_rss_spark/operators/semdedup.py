"""SemDedup: semantic deduplication via cluster-then-within-cluster cosine
(engine-new, training-data pipeline; Abbas et al. 2023, "SemDedup: Data-
efficient learning at web-scale through semantic deduplication").

The recipe, re-expressed Spark-first:

1. **Cluster** every embedding to its nearest centroid (k-means cells —
   the same assignment primitive as the IVF index in
   :mod:`news_rss_spark.operators.similarity`).
2. **Rank** cluster members by cosine similarity TO THE CENTROID
   (descending, id tiebreak) — the paper's ordering.
3. **Greedy upper-triangle sweep**: a member is a semantic duplicate iff
   some LOWER-ranked member of the same cluster has cosine >= ``eps``
   with it.  This is exactly the paper's "keep one per similarity group"
   matrix sweep, and — unlike connected components — it is a pure
   self-join + EXISTS, so the whole operator is one SQL-expressible plan
   (no iteration, no driver loop).

Scale shape (100 TB): the pairwise verify runs ONLY within a cluster, so
its cost is sum of C(|cell|, 2) — bounded by choosing n_cells so the
expected cell size stays in the thousands (the paper uses 50k clusters
for LAION; cells are also how the work partitions, so the join shuffles
on ``cell`` and AQE handles stragglers).  ``band_census`` from
:mod:`news_rss_spark.operators.text_dedup` applies verbatim to the
``cell`` column as the pre-flight candidate-budget check — run it before
the sweep at a new scale, exactly like the banded text-dedup routes.

Determinism contract: with float64 pinned centroids
(:func:`news_rss_spark.operators.similarity.pinned_centroids`) every
quantity is an IEEE double chain both engines replay bit-identically —
dot products are left folds (Spark ``aggregate(zip_with(...))`` ==
DuckDB ``list_dot_product``), the rank ordering ties break on id, and
the output cosines are rounded to 6 only for display.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from news_rss_spark.operators.similarity import (
    _dot, _norm, with_ivf_cell,
)


def with_centroid_cos(df: DataFrame, centroids: np.ndarray,
                      vec_col: str = "embedding",
                      cell_col: str = "cell",
                      out: str = "cent_cos") -> DataFrame:
    """Cosine of each vector to ITS OWN cell's centroid, as one JVM
    expression: the (n_cells) centroid table is embedded as an
    array-of-array literal indexed by the cell id — no join, no Python.
    Centroids are unit-norm by contract, so cos = dot / |v|."""
    cent_lit = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    v = F.col(vec_col).cast("array<double>")
    own = F.element_at(cent_lit, F.col(cell_col) + 1)
    denom = _norm(v)
    return df.withColumn(
        out, F.when(denom > 0, _dot(v, own) / denom).otherwise(F.lit(0.0)))


def semdedup(df: DataFrame, centroids: np.ndarray, eps: float = 0.9,
             vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Flag semantic duplicates: returns every input id with its cluster,
    its centroid-cosine (rounded 6), and ``keep`` — False iff a
    lower-ranked same-cluster member sits within ``eps`` cosine.

    The output keeps ALL rows (a flag column, not a filtered relation) so
    downstream can choose drop-vs-weight; ``df.filter("keep")`` is the
    paper's deduplicated corpus.
    """
    ranked = (
        with_centroid_cos(
            with_ivf_cell(df, centroids, vec_col), centroids, vec_col)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("cell")
                .orderBy(F.col("cent_cos").desc(), F.col(id_col).asc())))
        .select(F.col(id_col), "cell", "cent_cos", "rank",
                F.col(vec_col).cast("array<double>").alias("_v"))
        # carry the per-row norm THROUGH the pair join: sqrt of the same
        # per-row fold either way, so the pair cosine is bit-identical to
        # recomputing it per pair, at 1/3 of the fold work
        .withColumn("_n", _norm(F.col("_v")))
    )
    x = ranked.select(F.col(id_col), "cell", "cent_cos", "rank",
                      F.col("_v").alias("_vx"), F.col("_n").alias("_nx"))
    y = ranked.select(F.col("cell").alias("_cell_y"),
                      F.col("rank").alias("_rank_y"),
                      F.col("_v").alias("_vy"), F.col("_n").alias("_ny"))
    denom = F.col("_nx") * F.col("_ny")
    cos_xy = F.when(denom > 0, _dot(F.col("_vx"), F.col("_vy")) / denom) \
              .otherwise(F.lit(0.0))
    dup_ids = (
        x.join(y, (F.col("cell") == F.col("_cell_y"))
               & (F.col("_rank_y") < F.col("rank")))
        .filter(cos_xy >= F.lit(float(eps)))
        .select(F.col(id_col)).distinct()
    )
    return (
        x.join(dup_ids.withColumn("_dup", F.lit(True)), [id_col], "left")
        .select(F.col(id_col), F.col("cell"),
                F.round("cent_cos", 6).alias("cent_cos"),
                F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"))
    )
