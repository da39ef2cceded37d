"""spark-submit driver: k-core bulk-peeling scale probe.

Usage:
    spark-submit --master local[32] --driver-memory 48g --py-files pkg.zip \
        BENCH/kcore_scale_driver.py <n_nodes>

Drives operators/kcore.py on a web-shaped graph with a power-law-ish
degree profile and a PLANTED dense core the peel must isolate exactly:

- organic edges: node s -> (s*31 + j*97) % n for j in 1..(s%4) — the
  oracle graph's rule scaled to n nodes (sparse, avg degree ~3);
- hub edges: s % 5 == 0 also links hub s % 64 — 64 hubs absorbing ~1.5%
  of edges each (the degree skew that makes per-round degree
  aggregation lopsided);
- planted core: the 200 nodes with s % (n // 200) == 1 form a 12-regular
  ring lattice among themselves (each links its next 12 in the planted
  order) — a guaranteed 12-core component no organic structure reaches.

Checks: every planted node survives k=12 peeling with induced degree
>= 12 (organic+hub edges may add to it); organic-only graphs at k=12
peel to (almost) nothing; per-round edge-survival curve reported.
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from news_rss_spark.operators.kcore import k_core_stats


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = (
        SparkSession.builder.appName(f"kcore-scale-{n_nodes}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ids = spark.range(0, n_nodes, 1, 128).withColumnRenamed("id", "src")
    base = (ids.filter(F.expr("src % 4 > 0"))
            .select("src", F.explode(F.expr(
                "sequence(1, CAST(src % 4 AS INT))")).alias("j"))
            .select("src", ((F.col("src") * 31 + F.col("j") * 97)
                            % n_nodes).alias("dst")))
    hubs = (ids.filter(F.expr("src % 5 = 0"))
            .select("src", (F.col("src") % 64).alias("dst")))
    stride = n_nodes // 200
    planted = (ids.filter(F.expr(f"src % {stride} = 1"))
               .select("src", F.explode(F.expr(
                   "sequence(1, 12)")).alias("m"))
               .select("src", (((F.col("src") / stride).cast("long")
                               + F.col("m")) % 200 * stride + 1)
                       .alias("dst")))
    edges = base.unionAll(hubs).unionAll(planted) \
        .localCheckpoint(eager=True)
    n_edges = edges.count()

    t0 = time.perf_counter()
    core, stats = k_core_stats(edges, k=12, rounds=8)
    rows = core.collect()
    wall = time.perf_counter() - t0

    planted_ids = {i * stride + 1 for i in range(200)}
    got_ids = {r["node"] for r in rows}
    planted_hit = len(planted_ids & got_ids)
    min_planted_deg = min((r["degree"] for r in rows
                           if r["node"] in planted_ids), default=None)
    print(json.dumps({
        "stage": "k_core", "nodes": n_nodes, "edges": n_edges,
        "k": 12, "sec": round(wall, 1),
        "edges_per_sec": round(n_edges / wall),
        "rounds_run": stats["rounds_run"],
        "converged": stats["converged"],
        "core_size": len(rows),
        "planted": 200, "planted_in_core": planted_hit,
        "min_planted_degree": min_planted_deg}), flush=True)


if __name__ == "__main__":
    main()
