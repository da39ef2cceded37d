"""HITS (Kleinberg hubs & authorities) over a link graph — the
companion signal to PageRank for crawl prioritization: authorities are
the pages worth EXTRACTING (many good hubs cite them), hubs are the
pages worth RE-CRAWLING for link discovery (they cite many good
authorities).  A frontier weighted by authority feeds the training
corpus; one weighted by hub score feeds link discovery.

Semantics (standard mutual recursion, run a FIXED number of rounds):

    auth'(v) = sum_{u->v} hub(u)     then L1-normalize
    hub'(u)  = sum_{u->v} auth'(v)   then L1-normalize

auth updates from the PREVIOUS hub vector, hub from the NEW auth vector
(Kleinberg's original update order).  L1 normalization (scores sum to 1)
instead of the textbook L2 keeps every operation join+sum+divide — no
sqrt — and the engine's 9-digit per-iteration rounding contract
(pagerank/k-means precedent) makes the result bit-stable across
engines and partitionings; the DuckDB oracle unrolls the same rounds.

Scale shape (same discipline as operators/pagerank.py):

- the static edge set is shuffled TWICE total — one copy hash-partitioned
  on ``src`` (the auth update's join key), one on ``dst`` (the hub
  update's) — both localCheckpoint'd once and reused every round; no
  per-iteration edge shuffle;
- each round = two join+hash-agg pairs over score-sized relations with
  map-side partial sums;
- the L1 normalizer stays IN the plan as a broadcast 1-row aggregate
  (no per-iteration driver collect — tighter than pagerank's dangling
  scalar);
- per-round state is localCheckpoint'd so the lazy plan never replays
  earlier rounds.

Duplicate edges count once (simple graph, like pagerank); nodes with no
in-links get authority 0, no out-links get hub 0 (they still receive
the other score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits(edges: DataFrame, iters: int = 3,
         src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Hub/authority scores after ``iters`` rounds: ``(node, hub, auth)``
    with each score L1-normalized and rounded to 9 digits per round."""
    e = (edges.select(F.col(src_col).cast("long").alias("src"),
                      F.col(dst_col).cast("long").alias("dst"))
         .distinct())
    e_src = e.repartition("src").localCheckpoint(eager=True)
    e_dst = e_src.repartition("dst").localCheckpoint(eager=True)

    base = (e_src.select(F.col("src").alias("node"))
            .unionAll(e_src.select(F.col("dst").alias("node")))
            .distinct()
            .repartition("node")
            .localCheckpoint(eager=True))
    if base.isEmpty():
        return base.select("node", F.lit(0.0).alias("hub"),
                           F.lit(0.0).alias("auth"))

    def _normalized(raw: DataFrame, key: str, out: str) -> DataFrame:
        # raw: (key, s) un-normalized sums over existing edges; nodes
        # missing from raw score 0.  Normalizer = in-plan broadcast
        # 1-row sum (never a driver collect).
        total = raw.agg(F.sum("s").alias("_t"))
        return (base.join(raw, base["node"] == raw[key], "left")
                .crossJoin(F.broadcast(total))
                .select("node",
                        F.round(F.coalesce(F.col("s"), F.lit(0.0))
                                / F.col("_t"), 9).alias(out)))

    state = base.withColumn("hub", F.lit(1.0)).withColumn("auth", F.lit(1.0))
    for _ in range(iters):
        auth_raw = (state.select("node", "hub")
                    .join(e_src, state["node"] == e_src["src"])
                    .groupBy("dst").agg(F.sum("hub").alias("s")))
        auth = _normalized(auth_raw, "dst", "auth")
        hub_raw = (auth.join(e_dst, auth["node"] == e_dst["dst"])
                   .groupBy("src").agg(F.sum("auth").alias("s")))
        hub = _normalized(hub_raw, "src", "hub")
        state = (auth.join(hub, "node")
                 .select("node", "hub", "auth")
                 .localCheckpoint(eager=True))
    return state


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph:
    ``(node, n_triangles)`` — the spam-farm / link-ring detector (dense
    mutual-link neighbourhoods triangle-heavily; organic link graphs do
    not), and the numerator of the local clustering coefficient.

    The compact-forward / node-iterator-with-ordering algorithm (Schank
    & Wagner 2005), the shape every distributed triangle count uses:

    - edges are DIRECTED low-id -> high-id once (each triangle {a<b<c}
      is then counted exactly once as the wedge a->b, a->c closed by
      b->c — no 6x overcount, no distinct);
    - wedges come from ONE self-join of the directed edge list on the
      low endpoint; the closing check is ONE more equi-join against the
      same edge list.  Two shuffles on compact int pairs;
    - at web scale the low-id orientation is replaced by degree
      orientation (direct toward the higher-degree endpoint) which
      bounds the wedge fan-out of hub nodes by sqrt(m) — the id-based
      variant keeps the oracle trivially replayable and is exact on any
      graph, just skew-exposed if ids correlate with degree.

    Nodes in no triangle are absent (join back against the node list
    and ``coalesce(0)`` for a dense relation).
    """
    e = (pairs.select(F.least("a", "b").alias("lo"),
                      F.greatest("a", "b").alias("hi"))
         .filter(F.col("lo") != F.col("hi"))
         .distinct())
    w1 = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    w2 = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = (w1.join(w2, "a").filter(F.col("b") < F.col("c")))
    closed = wedges.join(
        e.select(F.col("lo").alias("b"), F.col("hi").alias("c")),
        ["b", "c"])
    per_corner = (closed.select(F.col("a").alias("node"))
                  .unionByName(closed.select(F.col("b").alias("node")))
                  .unionByName(closed.select(F.col("c").alias("node"))))
    return (per_corner.groupBy("node")
            .agg(F.count("*").cast("long").alias("n_triangles")))


def clustering_coefficient(pairs: DataFrame) -> DataFrame:
    """Local clustering coefficient per node: ``(node, degree,
    n_triangles, coeff)`` with ``coeff = 2T / (d * (d - 1))`` rounded to
    6 digits (0.0 for degree < 2) — how close each node's neighbourhood
    is to a clique.  Degree = distinct undirected neighbours; triangles
    from :func:`triangle_counts`; one extra hash agg + one join."""
    sym = (pairs.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
           .unionByName(
               pairs.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
           .filter(F.col("node") != F.col("nbr"))
           .distinct())
    deg = sym.groupBy("node").agg(F.count("*").cast("long").alias("degree"))
    tri = triangle_counts(pairs)
    out = deg.join(tri, "node", "left").na.fill({"n_triangles": 0})
    coeff = F.when(
        F.col("degree") >= 2,
        F.round(2.0 * F.col("n_triangles")
                / (F.col("degree") * (F.col("degree") - 1)), 6)
    ).otherwise(F.lit(0.0))
    return out.select("node", "degree", "n_triangles",
                      coeff.alias("coeff"))
