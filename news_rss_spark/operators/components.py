"""Duplicate-cluster resolution: connected components over a near-dup
pair graph + keeper selection (engine-new; the step that turns pairwise
LSH/SimHash output into per-document keep/drop decisions in a
training-data dedup pipeline).

Algorithm: iterative min-label propagation.  labels(node) starts as the
node id; each round every node takes the min of its own label and its
neighbors' labels; fixpoint == connected components (component id = min
node id in the component, which doubles as the keeper id).

Scale shape:
- edges are symmetrized once and hash-partitioned by ``dst``; every
  round is ONE shuffle (join labels on dst, groupBy node with a map-side
  partial min) — no collect, no driver-side graph;
- rounds needed = graph diameter; LSH near-dup clusters are clique-ish
  (diameter 1-3), so the loop converges in 2-4 rounds — this is NOT a
  general web-graph CC (for billion-edge power-law / long-chain graphs
  use :func:`connected_components_star`, the large-star/small-star
  alternation with the same per-round plan shape but O(log^2 n) round
  count independent of diameter);
- each round ``localCheckpoint``s the labels to truncate the lineage the
  driver loop would otherwise stack up (20 rounds of joins in one plan);
- convergence check is a count over the joined old/new labels — cheap
  relative to the round's shuffle and exact (no fixed round count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(nodes: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id",
                         max_iter: int = 20) -> DataFrame:
    """(node) x (a, b) pairs -> (node, component); component = min node id
    reachable.  Nodes absent from ``pairs`` keep their own id (singletons).
    """
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")) \
        .union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))) \
        .distinct()
    # materialize the edge list ONCE: every propagation round joins it, and
    # an upstream pair-mining plan (LSH/SimHash) would otherwise re-execute
    # per round — measured 7x slowdown on the sf0.1 graph without this
    edges = edges.localCheckpoint(eager=True)

    # iterate ONLY over nodes that have at least one edge: near-dup graphs
    # are overwhelmingly singletons (comp == own id by definition), so the
    # loop's working set is O(edges), not O(corpus); singletons re-attach
    # after the fixpoint with one anti-join.  Per-round shuffle width is
    # left to AQE coalescing (measured identical to hand-sizing on a small
    # graph) — mutating the session's shuffle-partition conf here would
    # leak into concurrent jobs on a shared session.
    touched = edges.select(F.col("src").alias("node")).distinct()
    labels = touched.withColumn("comp", F.col("node"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        prop = (edges.join(labels, edges["dst"] == labels["node"])
                .select(F.col("src").alias("node"), "comp"))
        new_labels = (labels.unionByName(prop)
                      .groupBy("node").agg(F.min("comp").alias("comp"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), on="node")
                   .filter(F.col("n.comp") != F.col("o.comp"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    singletons = (nodes.select(F.col(id_col).alias("node"))
                  .join(touched, on="node", how="left_anti")
                  .withColumn("comp", F.col("node")))
    return labels.unionByName(singletons)


def connected_components_star(nodes: DataFrame, pairs: DataFrame,
                              id_col: str = "doc_id",
                              max_iter: int = 50) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    web-graph escape hatch :func:`connected_components`'s docstring
    promises: convergence in O(log^2 n) rounds regardless of diameter,
    where min-label propagation needs diameter-many rounds (a crawl
    graph's chains are long; a near-dup graph's are not).

    Per round both operations are ONE groupBy (map-side partial min) +
    ONE broadcast-or-shuffle join of the edge list against the |nodes|-
    sized min relation — the same per-round shuffle shape as the
    propagation variant, but the edge list itself contracts toward the
    star graph (child -> component-min) instead of staying fixed:

    - large-star: for each node u, attach every STRICTLY LARGER
      neighbour to m = min(N(u) + {u});
    - small-star: direct edges large->small, then attach every
      not-larger neighbour (and u itself) to m.

    Both preserve connectivity and only ever link a node to a smaller
    label, so the fixpoint is edges (v, component_min) — the labels are
    read off the converged edge set.  Each round's edge set is
    localCheckpoint'd (iterative lineage truncation, as in the
    propagation variant).  Output schema and values are IDENTICAL to
    :func:`connected_components` — one oracle covers both.

    Cost shape: on a toy graph the wall time is round_count x fixed
    stage-scheduling overhead (~10 tiny stages/round — a 5k-node,
    diameter-100 chain converges in 8 rounds but still pays ~1.4 s/round
    at local[32]); on a production graph the same ~10 stages are each
    data-dominated, which is exactly when this variant's
    diameter-independent round count beats propagation."""
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")) \
        .filter(F.col("src") != F.col("dst"))
    edges = edges.localCheckpoint(eager=True)
    touched = (edges.select(F.col("src").alias("node"))
               .union(edges.select(F.col("dst").alias("node")))
               .distinct().localCheckpoint(eager=True))

    def _min_rel(e: DataFrame) -> DataFrame:
        # m(u) = min over the grouped neighbourhood and u itself
        return (e.groupBy("src").agg(F.min("dst").alias("mn"))
                .select("src", F.least("src", "mn").alias("m")))

    old_count = edges.count()
    for _ in range(max_iter):
        # -- large-star over the symmetrized edge set
        sym = (edges.union(edges.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst"))))
        mins = _min_rel(sym)
        large = (sym.join(mins, "src")
                 .filter(F.col("dst") > F.col("src"))
                 .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
                 .filter(F.col("src") != F.col("dst")).distinct())
        # -- small-star over edges directed large -> small
        directed = large.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"))
        mins2 = _min_rel(directed)
        attach = (directed.join(mins2, "src")
                  .select(F.col("dst").alias("src"), F.col("m").alias("dst")))
        self_attach = mins2.select(F.col("src"), F.col("m").alias("dst"))
        new_edges = (attach.union(self_attach)
                     .filter(F.col("src") != F.col("dst")).distinct()
                     .localCheckpoint(eager=True))
        # convergence: both sides are distinct sets, so equal counts plus
        # new subset-of old (one early-exit exceptAll) implies equality —
        # the count on the just-checkpointed frame is near-free, and
        # contracting rounds (counts differ) skip the exceptAll entirely
        new_count = new_edges.count()
        changed = (new_count != old_count
                   or new_edges.exceptAll(edges).limit(1).count() > 0)
        edges, old_count = new_edges, new_count
        if not changed:
            break
    # converged star graph: every non-root points at its component min
    # (exactly one edge per child at the fixpoint; the min-agg also keeps
    # the readout single-rowed if max_iter cut convergence short); roots
    # appear only on the dst side and label themselves
    lbl = (edges.groupBy("src").agg(F.min("dst").alias("comp"))
           .withColumnRenamed("src", "node"))
    labels = (touched.join(lbl, on="node", how="left")
              .select("node", F.coalesce("comp", F.col("node")).alias("comp")))
    singletons = (nodes.select(F.col(id_col).alias("node"))
                  .join(touched, on="node", how="left_anti")
                  .withColumn("comp", F.col("node")))
    return labels.unionByName(singletons)


def dedup_clusters(df: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   max_iter: int = 20,
                   algorithm: str = "propagation",
                   components: DataFrame | None = None) -> DataFrame:
    """(doc_id, component, is_keeper): keeper = the component's min id —
    the deterministic survivor a dedup pipeline retains.

    ``algorithm='propagation'`` (default) is min-label propagation —
    right for clique-ish near-dup graphs (diameter 1-3).
    ``algorithm='star'`` is the large-star/small-star alternation —
    right for long-chain / power-law graphs where round count must not
    scale with diameter.  Identical output either way.

    ``components``: optionally a precomputed (node, comp) labeling over
    the same graph — the ``sig=`` sharing contract of the pair miners:
    when several keeper policies run over one pair graph, compute the
    CC fixpoint once and pass it to each."""
    comp = components
    if comp is None:
        cc = (connected_components_star if algorithm == "star"
              else connected_components)
        comp = cc(df.select(id_col), pairs, id_col, max_iter)
    return comp.select(
        F.col("node").alias(id_col),
        F.col("comp").alias("component"),
        (F.col("node") == F.col("comp")).alias("is_keeper"),
    )


def dedup_clusters_ranked(df: DataFrame, pairs: DataFrame,
                          rank_col: str,
                          id_col: str = "doc_id",
                          max_iter: int = 20,
                          algorithm: str = "propagation",
                          components: DataFrame | None = None) -> DataFrame:
    """Quality-ranked survivor selection: (doc_id, component, is_keeper)
    where the keeper is the cluster member with the HIGHEST ``rank_col``
    (ties broken by min id) instead of :func:`dedup_clusters`' min-id
    convention.  Production near-dup pipelines keep the "best" member —
    longest file (BigCode/SantaCoder), highest quality score (RefinedWeb)
    — not an arbitrary one, so the ranking column is the caller's policy.

    Plan shape, chosen for 100 TB: the per-cluster argmax is
    ``groupBy(component).agg(max(struct(rank, -id)))`` — a hash
    aggregation with map-side partial combine, so even a pathological
    million-member boilerplate cluster collapses to one row per map task
    before the shuffle (a ``row_number() over (partition by component
    order by rank desc)`` window would instead sort and ship every
    member of the hot cluster to one reducer).  Struct comparison is
    lexicographic, so ``max(struct(rank, -id))`` = highest rank, then
    smallest id.  ``rank_col`` must be numeric and non-null; ``id_col``
    must be numeric (the tiebreak negates it).  ``components``: optional
    precomputed (node, comp) labeling, as in :func:`dedup_clusters`.
    """
    comp = components
    if comp is None:
        cc = (connected_components_star if algorithm == "star"
              else connected_components)
        comp = cc(df.select(id_col), pairs, id_col, max_iter)
    labeled = (comp.select(F.col("node").alias(id_col),
                           F.col("comp").alias("component"))
               .join(df.select(id_col, rank_col), on=id_col))
    winners = (labeled.groupBy("component")
               .agg(F.max(F.struct(F.col(rank_col).alias("r"),
                                   (-F.col(id_col)).alias("neg_id")))
                    .alias("w"))
               .select("component", (-F.col("w.neg_id")).alias("_keeper_id")))
    return (labeled.join(winners, on="component")
            .select(F.col(id_col), F.col("component"),
                    (F.col(id_col) == F.col("_keeper_id")).alias("is_keeper")))


def keep_only_keepers(df: DataFrame, pairs: DataFrame,
                      id_col: str = "doc_id") -> DataFrame:
    """Drop every non-keeper row (the actual dedup): left-semi join on the
    keeper set."""
    keepers = dedup_clusters(df, pairs, id_col) \
        .filter("is_keeper").select(F.col(id_col))
    return df.join(keepers, on=id_col, how="left_semi")


def label_propagation(pairs: DataFrame, rounds: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, deterministic variant) over an undirected pair graph:
    ``(node, community)`` after a FIXED number of rounds.

    Where connected components answer "is there ANY path" (every
    near-dup clique plus its bridges collapses to one id), LPA finds
    DENSE regions: each round every node adopts the most frequent label
    among its neighbours, so sparse bridges between two dense clusters
    lose the vote and the clusters keep distinct labels.  The classic
    algorithm breaks ties randomly and updates asynchronously — both
    non-reproducible at cluster scale — so this variant is pinned:
    synchronous rounds, ties by MIN label, fixed round count (the same
    determinism-over-convergence trade the repo's k-means/PageRank
    oracles make; the fixpoint of the deterministic variant can
    oscillate 2-cycles, which a fixed round count sidesteps).

    Per round the plan is ONE shuffle: join labels to the symmetrized
    edge list on src, then ``groupBy(dst, label).count`` (map-side
    combine on hot labels) and an argmax via ``max(struct(count,
    -label))`` — a second hash agg, NO per-node window sort.  Labels
    localCheckpoint per round (iterative lineage truncation, as in
    connected_components).  Isolated nodes never appear in ``pairs``
    and are their own community by definition — callers re-attach them
    the way connected_components handles singletons.
    """
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")) \
        .union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))) \
        .distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    for _ in range(rounds):
        votes = (edges.join(labels, edges["src"] == labels["node"])
                 .groupBy(F.col("dst").alias("n"), F.col("label"))
                 .agg(F.count("*").alias("cnt")))
        # argmax with min-label tiebreak as ONE order-independent agg:
        # max(struct(cnt, -label)) picks the biggest count, then the
        # smallest label (bigger -label == smaller label)
        labels = (votes.groupBy(F.col("n").alias("node"))
                  .agg(F.max(F.struct(F.col("cnt"),
                                      (-F.col("label")).alias("neg")))
                       .alias("m"))
                  .select("node", (-F.col("m.neg")).alias("label"))
                  .localCheckpoint(eager=True))
    return labels.select("node", F.col("label").alias("community"))
