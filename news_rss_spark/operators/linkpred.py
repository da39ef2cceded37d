"""Link prediction over the crawl/link graph: common-neighbor and
Adamic-Adar scores (Adamic & Adar 2003, "Friends and neighbors on the
Web").

The candidate-generation dual of the dedup miners: instead of "which
nodes are textually similar", "which nodes the GRAPH thinks should be
connected" — recommendation of next-crawl targets, missing-citation
detection, and ER blocking by shared context all rank unlinked pairs
by their shared neighborhood, down-weighting promiscuous neighbors:
``AA(a, b) = sum over z in N(a) & N(b) of 1 / ln(deg z)``.

Skew contract (the part that matters at web scale): pair candidates
come from 2-paths through each shared neighbor ``z`` — a node of
degree d emits d*(d-1)/2 pairs, so ONE mega-hub would emit a
quadratic blowup by itself.  Hubs are therefore PRUNED at
``max_degree`` (default 64) before the pair join: a node linked by
everyone contributes ~1/ln(huge) ~ 0 signal anyway, so the prune is
the standard LP treatment (it changes scores only by the dropped
near-zero terms, and the cap is part of the operator's declared
contract, replayed by the oracle — not a silent approximation).
Per-round work is then bounded by cap^2 per neighbor node.

Float contract: each 1/ln(deg z) term is rounded to a scaled exact
int64 before the per-pair sum (the drift/vocab_divergence recipe), so
both engines aggregate order-free integers; one final rescale.

Already-connected pairs are anti-joined away — link PREDICTION ranks
absent edges.  Engine-new; grouped with the
pagerank/HITS/k-core/components graph family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["adamic_adar"]


def adamic_adar(edges: DataFrame, max_degree: int = 64,
                src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """``(a, b, common_neighbors, aa_score)`` for unlinked pairs with
    at least one shared (non-hub) neighbor; ``a < b``; ``aa_score``
    rounded to 6 decimals from the exact scaled-int sum."""
    if max_degree < 2:
        raise ValueError(f"max_degree must be >= 2, got {max_degree}")
    a = F.least(F.col(src_col), F.col(dst_col)).cast("long")
    b = F.greatest(F.col(src_col), F.col(dst_col)).cast("long")
    e = (edges.select(a.alias("a"), b.alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct())
    # undirected incidence (z = the neighbor being shared)
    inc = (e.select(F.col("a").alias("z"), F.col("b").alias("n"))
           .unionAll(e.select(F.col("b").alias("z"),
                              F.col("a").alias("n"))))
    deg = inc.groupBy("z").agg(F.count("*").alias("deg"))
    kept = (inc.join(deg.filter((F.col("deg") >= 2) &
                                (F.col("deg") <= max_degree)), "z"))
    term = F.round(F.lit(1e9) / F.log(F.col("deg")), 0).cast("long")
    x = kept.select("z", F.col("n").alias("na"), term.alias("t"))
    y = kept.select("z", F.col("n").alias("nb"))
    pairs = (x.join(y, "z")
             .filter(F.col("na") < F.col("nb"))
             .groupBy(F.col("na").alias("a"), F.col("nb").alias("b"))
             .agg(F.count("*").alias("common_neighbors"),
                  F.sum("t").alias("_aa")))
    return (pairs.join(e, ["a", "b"], "left_anti")
            .select("a", "b",
                    F.col("common_neighbors").cast("long")
                    .alias("common_neighbors"),
                    F.round(F.col("_aa") / 1e9, 6).alias("aa_score")))
