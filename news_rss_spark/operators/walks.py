"""Deterministic random walks over a link graph (DeepWalk/node2vec-style
corpus generation, p=q=1) — the graph-sampling primitive that turns a
100 TB link graph into training sequences for embedding models, and the
companion the rank family (pagerank/HITS/LPA) doesn't cover: those
summarize the graph, walks SAMPLE it.

Determinism contract: every step's neighbor choice is

    idx  = md5_63("salt:start:w:step:cur") mod out_degree(cur)
    next = sorted_neighbors(cur)[idx]

so the walk set is a pure function of (graph, salt) — re-running
reproduces it byte-for-byte (resumable corpus builds), a new salt is a
fresh sample, and the DuckDB oracle replays every choice exactly
(neighbor lists are SORTED on both engines before indexing; Spark's
``collect_list`` order is partition-dependent, ``sort_array`` erases
that).  Walks stop early at dangling nodes (no out-edges): the row
simply has no successor — standard DeepWalk truncation.

Scale shape: the adjacency relation is built ONCE (one distinct + one
hash agg), repartitioned on its key and localCheckpoint'd (the
pagerank lesson: a lazy plan re-mines the graph per step); each step is
one equi-join of the frontier (walk-count rows, NOT corpus rows)
against it.  ``walk_len`` is a small constant, so the loop unrolls to a
fixed chain of narrow joins — no driver-side iteration state beyond
the loop counter.  Hot nodes (everyone walks into the same hub) only
matter if the FRONTIER skews: the join key is ``cur``, and AQE's
skew-join handles a hub frontier the same way it handles any skewed
equi-join (salting is unnecessary because the adjacency side is one
row per node).

Neighbor multiplicity: duplicate edges collapse (simple graph,
``distinct`` — same convention as pagerank); a self-loop is a valid
choice and the walk may sit on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["random_walks"]


def _draw63(*cols) -> F.Column:
    """63-bit md5 slice of the ':'-joined parts — the engine's
    cross-engine draw idiom (DuckDB: CAST('0x'||substr(md5(..),1,15)
    AS BIGINT))."""
    return F.conv(F.substring(
        F.md5(F.concat_ws(":", *cols)), 1, 15), 16, 10).cast("long")


def random_walks(edges: DataFrame, walk_len: int = 4,
                 walks_per_node: int = 2, salt: str = "walk-v1",
                 src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """One row per visited position: ``(start, w, step, node)`` with
    ``step`` 0..walk_len (0 = the start node itself), ``w`` the walk
    index 0..walks_per_node-1.  Walks start from every node with at
    least one out-edge."""
    e = (edges.select(F.col(src_col).cast("long").alias("src"),
                      F.col(dst_col).cast("long").alias("dst"))
         .distinct())
    adj = (e.groupBy("src")
           .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
           .repartition("src")
           .localCheckpoint(eager=True))

    frontier = (adj.select(F.col("src").alias("start"))
                .withColumn("w", F.explode(
                    F.sequence(F.lit(0), F.lit(walks_per_node - 1))))
                .withColumn("cur", F.col("start")))
    out = frontier.select("start", "w", F.lit(0).alias("step"),
                          F.col("cur").alias("node"))
    for step in range(1, walk_len + 1):
        draw = _draw63(F.lit(salt), F.col("start"), F.col("w"),
                       F.lit(step), F.col("cur"))
        # per-step localCheckpoint: the final result unions every step,
        # and a lazy frontier would make union branch k replay all k
        # joins from scratch (the pagerank per-iteration lesson).
        frontier = (frontier.join(adj, frontier["cur"] == adj["src"])
                    .select("start", "w",
                            F.element_at(
                                "nbrs",
                                (F.pmod(draw, F.size("nbrs")) + 1)
                                .cast("int")).alias("cur"))
                    .localCheckpoint(eager=True))
        out = out.unionAll(
            frontier.select("start", "w", F.lit(step).alias("step"),
                            F.col("cur").alias("node")))
    return out.select("start", "w", F.col("step").cast("int"), "node")
