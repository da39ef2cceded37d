"""Power-iteration PageRank over a link graph — crawl-side URL/source
quality scoring (the classic companion to the frontier/robots/scheduling
operators: rank hosts or pages by link structure to prioritize fetches
and weight training sources).

Semantics (standard Brin/Page with uniform teleport + dangling-mass
redistribution):

    rank'(v) = (1-d)/N + d * ( sum_{u->v} rank(u)/outdeg(u)
                               + dangling_mass/N )

run for a FIXED number of iterations with the engine's 9-digit
per-iteration rounding contract (the k-means precedent: per-key float
sums land in hash-agg order, and rounding each iteration's output to 9
digits makes the result bit-stable across engines/partitionings — the
DuckDB oracle unrolls the same iterations).

Scale shape (the canonical distributed PageRank, e.g. the Spark docs'
own example — but DataFrame-native, no RDDs):

- edges are hash-partitioned on ``src`` ONCE and localCheckpoint'd; every
  iteration's rank join reuses that layout (one shuffle of the static
  edge set total, not per iteration);
- each iteration = join(state, edges) on the src key + one hash
  aggregation on ``dst`` with map-side partial sums — two shuffles of
  rank-sized data, never of the corpus;
- per-iteration state is localCheckpoint'd: the lazy plan would
  otherwise re-mine every prior iteration (measured 7x on the
  components fixpoint, operators/components.py);
- the only driver-side values are N and the per-iteration dangling mass
  (one row each — the same O(1)-rows contract as k-means centroids).

Dangling nodes (no out-links) donate their mass uniformly; nodes with no
in-links still receive teleport mass.  Duplicate edges count once
(``distinct`` — link graphs are simple graphs here); self-links count
like any other edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iters: int = 3, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Ranks after ``iters`` power iterations: ``(node, rank)`` with the
    9-digit per-iteration rounding contract."""
    spark = edges.sparkSession
    e = (edges.select(F.col(src_col).cast("long").alias("src"),
                      F.col(dst_col).cast("long").alias("dst"))
         .distinct()
         .repartition("src")
         .localCheckpoint(eager=True))

    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select(F.col("dst").alias("node")))
             .distinct())
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    base = (nodes.join(deg, nodes["node"] == deg["src"], "left")
            .select("node", "deg")
            .repartition("node")
            .localCheckpoint(eager=True))
    n = base.count()
    if n == 0:
        return base.select("node", F.lit(0.0).alias("rank"))

    one_minus_d = 1.0 - damping
    teleport = one_minus_d / n

    state = base.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        # O(1)-rows driver scalar per iteration, read off the
        # checkpointed state — not a re-execution of prior iterations
        dangling = (state.filter(F.col("deg").isNull())
                    .agg(F.sum("rank").alias("m")).collect()[0]["m"]) or 0.0
        contribs = (state.join(e, state["node"] == e["src"])
                    .select(F.col("dst"),
                            (F.col("rank") / F.col("deg")).alias("c"))
                    .groupBy("dst").agg(F.sum("c").alias("c")))
        state = (base.join(contribs, base["node"] == contribs["dst"], "left")
                 .select("node", "deg",
                         F.round(F.lit(teleport)
                                 + F.lit(damping)
                                 * (F.coalesce(F.col("c"), F.lit(0.0))
                                    + F.lit(dangling / n)),
                                 9).alias("rank"))
                 .localCheckpoint(eager=True))
    return state.select("node", "rank")


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          iters: int = 3, damping: float = 0.85,
                          src_col: str = "src", dst_col: str = "dst",
                          seed_col: str = "node") -> DataFrame:
    """Personalized PageRank (random walk with restart to a SEED set):
    trust propagation from known-good sources — the crawl-prioritization
    / TrustRank-style variant of :func:`pagerank` where teleport and
    dangling mass return to the seeds (uniformly across them) instead of
    to every node:

        rank'(v) = d * sum_{u->v} rank(u)/outdeg(u)
                   + (1-d + d*dangling_mass) * [v in seeds]/|seeds|

    Nodes unreachable from the seeds get rank exactly 0 — the scoring
    property spam-farm demotion relies on.  Same iteration mechanics and
    9-digit rounding contract as pagerank (edges repartitioned+
    checkpointed once, two rank-sized shuffles/iteration, O(1)-row
    driver scalars); the seed relation is broadcast (seed lists are
    small by definition)."""
    e = (edges.select(F.col(src_col).cast("long").alias("src"),
                      F.col(dst_col).cast("long").alias("dst"))
         .distinct()
         .repartition("src")
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select(F.col("dst").alias("node")))
             .distinct())
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    seed_set = seeds.select(F.col(seed_col).cast("long").alias("node")) \
        .distinct()
    n_seeds = seed_set.count()
    base = (nodes.join(deg, nodes["node"] == deg["src"], "left")
            .join(F.broadcast(seed_set.withColumn("is_seed", F.lit(True))),
                  "node", "left")
            .select("node", "deg",
                    F.coalesce("is_seed", F.lit(False)).alias("is_seed"))
            .repartition("node")
            .localCheckpoint(eager=True))
    if n_seeds == 0:
        return base.select("node", F.lit(0.0).alias("rank"))

    state = base.withColumn(
        "rank", F.when(F.col("is_seed"), F.lit(1.0 / n_seeds))
                 .otherwise(F.lit(0.0)))
    for _ in range(iters):
        dangling = (state.filter(F.col("deg").isNull())
                    .agg(F.sum("rank").alias("m")).collect()[0]["m"]) or 0.0
        contribs = (state.join(e, state["node"] == e["src"])
                    .select(F.col("dst"),
                            (F.col("rank") / F.col("deg")).alias("c"))
                    .groupBy("dst").agg(F.sum("c").alias("c")))
        restart = (1.0 - damping) + damping * dangling
        state = (base.join(contribs, base["node"] == contribs["dst"],
                           "left")
                 .select("node", "deg", "is_seed",
                         F.round(
                             F.lit(damping)
                             * F.coalesce(F.col("c"), F.lit(0.0))
                             + F.when(F.col("is_seed"),
                                      F.lit(restart / n_seeds))
                                .otherwise(F.lit(0.0)),
                             9).alias("rank"))
                 .localCheckpoint(eager=True))
    return state.select("node", "rank")
