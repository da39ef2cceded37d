"""Scalar (int8-style) symmetric quantization for embedding columns.

The memory tier between product quantization and full floats: uniform
scalar quantization keeps per-dimension resolution (PQ collapses
subspaces to centroids) while shrinking the scan 4x vs float32 — the
standard rerank-tier encoding in production ANN stacks (FAISS ``SQ8``,
the int8 path of most vector databases).  At 100 TB of embeddings the
brute-force rerank over a candidate set is memory-bound, so scan width
IS throughput.

Codes are SYMMETRIC signed ints, ``round(clip(x, -amax, amax) / amax *
127)`` in [-127, 127] — deliberately zero-centered: with shifted
unsigned codes (``(x - mn) * scale``) the code dot product picks up a
``sum(candidate)`` bias term and stops tracking the true dot product
(found by the recall test here; FAISS's asymmetric SQ carries explicit
correction terms for exactly this).  Symmetric codes make
``dot(codes_q, codes_v) ~ scale^2 * dot(q, v)`` up to quantization
error, so integer code ranking tracks true dot ranking.

Everything is pure JVM expressions: encode is one codegen'd
``transform`` (no shuffle — codes write alongside the vectors), and
similarity is the INTEGER dot product of codes (``zip_with`` multiply +
``aggregate`` sum in BIGINT) — integer end-to-end, so scores are exact,
order-free, and bit-identical in any engine: the oracle replays them
with no float tolerance.

``amax`` is the trained clip magnitude (a corpus percentile scan in
production — here a pinned literal, the pinned-centroid/codebook oracle
convention).  Out-of-range values clip deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sq_encode", "sq_dot_topk"]


def sq_encode(df: DataFrame, vec_col: str = "embedding",
              amax: float = 1.0, levels: int = 256,
              out: str = "codes") -> DataFrame:
    """Add ``out``: array<int> of symmetric codes in
    [-(levels/2 - 1), +(levels/2 - 1)] — code = round(clip(x, -amax,
    amax) / amax * (levels/2 - 1)), half-up (half-down for negatives:
    Spark/DuckDB round() is half-away-from-zero on doubles, which is the
    symmetric contract).  One projection, zero shuffle."""
    if not amax > 0:
        raise ValueError(f"sq_encode: amax must be > 0, got {amax}")
    if levels < 4:
        raise ValueError(f"sq_encode: levels must be >= 4, got {levels}")
    scale = (levels // 2 - 1) / amax
    codes = F.expr(
        f"transform({vec_col}, x -> cast(round(least(greatest("
        f"cast(x as double), cast({-amax!r} as double)), "
        f"cast({amax!r} as double)) "
        f"* cast({scale!r} as double), 0) as int))")
    return df.withColumn(out, codes)


def sq_dot_topk(vecs: DataFrame, query_id: int, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                amax: float = 1.0) -> DataFrame:
    """Top-k by integer code dot product against the query vector's own
    codes: ``(id, dot)`` ordered by (dot desc, id) — ties deterministic.
    The query's codes ride in-plan as a broadcast 1-row relation (the
    documented broadcast-1-row pattern; planned as a broadcast
    nested-loop over exactly one row), the scan reads codes only (4x
    narrower than the float vectors), and the plan ends in
    TakeOrderedAndProject — no shuffle of the corpus."""
    coded = sq_encode(vecs, vec_col, amax).select(id_col, "codes")
    q = (coded.filter(F.col(id_col) == query_id)
         .select(F.col("codes").alias("qc")))
    dot = F.aggregate(
        F.zip_with("codes", "qc", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return (coded.crossJoin(F.broadcast(q))
            .select(id_col, dot.alias("dot"))
            .orderBy(F.desc("dot"), id_col)
            .limit(k))
