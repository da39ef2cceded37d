"""spark-submit driver for the two-cluster-size scaling benchmark.

Usage (via bench_scaling.py, the orchestrator):

    spark-submit --master local[N] --py-files pkg.zip \
        BENCH/scale_driver.py <input_parquet> <work_dir> <cores>

Times the FULL flagship job — mapInArrow extraction, within-run dedup,
bucketed sink write, lineage append — over a pre-landed corpus, after a
small warmup job that spins up the JVM + Python worker pool, and prints one
JSON line: {"cores": N, "docs": n, "sec": t, "docs_per_sec": r}.

This is the sandbox stand-in for running the same job on N and 4N executor
clusters (BASELINE.json north_rule): local[8] vs local[32] exercises the
identical partitioning/shuffle/task structure at two parallelism levels.
"""

import json
import shutil
import sys
import time
from datetime import datetime

from pyspark.sql import SparkSession

from news_rss_spark.plans.pipeline import run_extraction_job
from news_rss_spark.sources.synth import documents_df

NOW = datetime(2025, 1, 15, 12, 0, 0)


def main() -> None:
    input_path, work_dir, cores = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = (
        SparkSession.builder.appName(f"scale-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the input lands as ~64 bucket-clustered files of compressed text;
        # one file per scan split keeps the kernel stage as wide as the
        # layout and preserves bucket clustering (a packed multi-file split
        # would still be correct, a byte-range split of one file would not
        # occur: single row-group files are never split mid-group)
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "16m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: full job shape on a tiny corpus (JVM JIT + python workers)
    warm = documents_df(spark, 512, seed=99, num_partitions=cores)
    run_extraction_job(spark, warm, f"{work_dir}/warm_sink",
                       f"{work_dir}/warm_lineage", NOW, "warm")

    docs = spark.read.parquet(input_path)
    n_docs = docs.count()  # also primes the file index / footer cache

    for d in ("sink", "lineage"):
        shutil.rmtree(f"{work_dir}/{d}", ignore_errors=True)
    t0 = time.perf_counter()
    res = run_extraction_job(spark, docs, f"{work_dir}/sink",
                             f"{work_dir}/lineage", NOW, "bench",
                             resume=False, input_clustered_by_bucket=True)
    sec = time.perf_counter() - t0

    print(json.dumps({
        "cores": cores,
        "docs": n_docs,
        "published": res.published_count,
        "sec": round(sec, 3),
        "docs_per_sec": round(n_docs / sec, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
