"""spark-submit probe: HyperBall neighborhood function at graph scale.

Usage:
    spark-submit --master local[32] --driver-memory 24g --py-files pkg.zip \
        BENCH/hyperball_scale_driver.py <n_nodes>

Synthesizes a directed graph distributed (no external data): per node i,
a multiplicative-hash long-range edge, a ring edge, and (every 5th node)
an edge into one of 8 hub nodes — the deliberate power-law pressure.
Runs hyperball(iters=3, p=6) and reports per-run wall, edges/s, and the
mean neighborhood-function value per radius (the distance-distribution
curve), plus sanity gates: N̂_0 in the 1-element linear-counting band for
EVERY node and monotone means.  The per-round shuffle is the register
relation (<= 64 rows/node) joined against edges — never pairs-of-balls —
so throughput here is the per-executor number a 10^11-edge crawl graph
would tile.
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from news_rss_spark.operators.hyperball import harmonic_centrality, hyperball


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    topology = sys.argv[3] if len(sys.argv) > 3 else "expander"
    spark = (
        SparkSession.builder.appName("hyperball-scale")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    ids = spark.range(n).select(F.col("id").alias("src"))
    if topology == "cycles":
        # disjoint 5-cycles: every ball converges at radius 4, so rounds
        # 5+ must be ~free — the frontier-pruning demonstration
        edges = ids.select(
            "src", (F.col("src") - F.col("src") % 5
                    + (F.col("src") + 1) % 5).alias("dst"))
    else:
        edges = (
            ids.select("src", ((F.col("src") * 2654435761) % n).alias("dst"))
            .unionByName(ids.select("src",
                                    ((F.col("src") + 1) % n).alias("dst")))
            .unionByName(
                ids.filter(F.col("src") % 5 == 0)
                   .select("src", (F.col("src") % 8).alias("dst")))
            .filter(F.col("src") != F.col("dst"))
        )
    path = "/dev/shm/hyperball-edges"
    edges.write.mode("overwrite").parquet(path)
    e = spark.read.parquet(path)
    n_edges = e.count()

    t0 = time.time()
    nf = hyperball(e, iters=iters, p=6)
    means = {int(r["t"]): (float(r["m"]), int(r["c"]))
             for r in nf.groupBy("t")
             .agg(F.round(F.avg("n_est"), 3).alias("m"),
                  F.count(F.lit(1)).alias("c")).collect()}
    t1 = time.time()
    curve = [means[t][0] for t in sorted(means)]
    n0_band = nf.filter("t = 0").filter(
        "n_est < 0.9 OR n_est > 1.1").count()
    print(json.dumps({
        "stage": "hyperball", "nodes": means[0][1], "edges": n_edges,
        "iters": iters, "p": 6, "sec": round(t1 - t0, 1),
        "edges_per_sec_per_round": round(iters * n_edges / (t1 - t0)),
        "mean_ball_by_t": curve,
        "n0_outside_band": n0_band,
        "monotone": curve == sorted(curve)}), flush=True)

    # classic harmonic centrality ranks IN-reachability ("how many nodes
    # can reach me, discounted by distance") — run the same machinery on
    # the REVERSED edges; the 8 planted hubs must dominate the top ranks
    t2 = time.time()
    nf_in = hyperball(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        iters=iters, p=6)
    hc = harmonic_centrality(nf_in)
    top = [(int(r["node"]), float(r["harmonic"]))
           for r in hc.orderBy(F.desc("harmonic"), F.asc("node"))
           .limit(8).collect()]
    t3 = time.time()
    hubs_in_top = sum(1 for node, _ in top if node < 8)
    print(json.dumps({
        "stage": "harmonic_centrality_in", "sec": round(t3 - t2, 1),
        "top8": top, "hubs_in_top8": hubs_in_top}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
