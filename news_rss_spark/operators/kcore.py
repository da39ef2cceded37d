"""k-core decomposition by iterative peeling (Seidman 1983, "Network
structure and minimum degree"; the BigQuery/Pregel-style bulk peel).

The k-core is the maximal subgraph where every node keeps degree >= k
after everyone below k is (repeatedly) removed — the web-graph
diagnostic between local counts and global ranks: link farms and
mutual-admiration spam cliques survive peeling that prunes organically
linked pages, and a corpus's dense citation core is exactly its deep
k-core (PageRank finds POPULAR nodes, the core finds MUTUALLY DENSE
ones — triangles/clustering_coeff see only 3-cycles).

Bounded-round contract (what the oracle replays): the operator runs
EXACTLY ``rounds`` bulk peels — round r computes induced degrees,
drops nodes below ``k``, and induces the surviving edge set — and
returns the nodes of the final induced subgraph with their degrees.
When peeling reaches a fixpoint within the budget this IS the true
k-core (further rounds are no-ops, so Spark's early exit on a stable
edge count returns the identical relation); a path-graph-style
adversarial chain can need O(n) peels, in which case the result is the
honest intermediate (``converged`` is reported by :func:`k_core_stats`
— the components.py max_iter philosophy).  Everything is exact set/
integer arithmetic: no floats, no draws, no ordering sensitivity.

Scale shape (100 TB link graph): each round is one map-side-combined
degree aggregation + two broadcast-or-shuffle semi-joins, all keyed by
node — the per-round cost of one CC/PageRank iteration.  The edge
relation is localCheckpoint'd per round (the components.py lesson:
unchecked loop lineage re-executes the whole peel history every
round); the convergence probe rides the checkpoint's count.  Bulk
peeling removes ALL sub-k nodes per round, so round count tracks the
graph's degeneracy ordering depth, not node count.

Reference anchor: engine-new (the reference has no graph surface);
grouped with the pagerank/HITS/components/label-propagation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_core", "k_core_stats"]


def _normalize(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Undirected simple graph: (a, b) = (least, greatest), self-loops
    dropped, duplicates collapsed (a multi-edge must not double-count
    degree)."""
    a = F.least(F.col(src_col), F.col(dst_col)).cast("long")
    b = F.greatest(F.col(src_col), F.col(dst_col)).cast("long")
    return (edges.select(a.alias("a"), b.alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct())


def _degrees(e: DataFrame) -> DataFrame:
    return (e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node").agg(F.count("*").alias("degree")))


def k_core(edges: DataFrame, k: int, rounds: int = 8,
           src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """``(node, degree)`` — nodes of the ``rounds``-peel k-core with
    their induced degree (>= k by construction; empty when the core
    dissolves)."""
    df, _ = k_core_stats(edges, k, rounds, src_col, dst_col)
    return df


def k_core_stats(edges: DataFrame, k: int, rounds: int = 8,
                 src_col: str = "src", dst_col: str = "dst"
                 ) -> tuple[DataFrame, dict]:
    """Like :func:`k_core` plus ``{"rounds_run", "converged"}`` —
    ``converged`` True means the bounded result IS the true k-core."""
    if k < 1 or rounds < 1:
        raise ValueError(f"k and rounds must be >= 1, got {k}/{rounds}")
    e = _normalize(edges, src_col, dst_col).localCheckpoint(eager=True)
    n_edges = e.count()
    rounds_run, converged = 0, False
    for _ in range(rounds):
        keep = _degrees(e).filter(F.col("degree") >= k).select("node")
        ne = (e.join(keep.withColumnRenamed("node", "a"), "a",
                     "left_semi")
              .join(keep.withColumnRenamed("node", "b"), "b",
                    "left_semi")
              .select("a", "b")
              .localCheckpoint(eager=True))
        n_new = ne.count()
        rounds_run += 1
        e = ne
        if n_new == n_edges:  # fixpoint: remaining rounds are no-ops
            converged = True
            break
        n_edges = n_new
    out = (_degrees(e).filter(F.col("degree") >= k)
           .select("node", F.col("degree").cast("long").alias("degree")))
    return out, {"rounds_run": rounds_run, "converged": converged}
