"""SparkSession factory tuned for the extraction workload.

Local mode is the sandbox stand-in for a multi-executor cluster; all sizing
knobs are expressed so the same code scales to 1000 executors:

- AQE on (runtime coalescing + skew-join splitting),
- shuffle partitions sized to cores locally (cluster: 2-3x total cores),
- Arrow batch size bounded so one batch of full article pages stays well
  inside executor memory (page HTML ~ tens of KB; 2048 rows * 50 KB ~ 100 MB
  per batch worst case — lower if needed via SPARK_GRAFT_ARROW_BATCH),
- parquet input split size left at 128 MB default (maxPartitionBytes) so a
  100 TB scan yields ~800k input tasks, the right granularity for resume.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "news_rss_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    arrow_batch = os.environ.get("SPARK_GRAFT_ARROW_BATCH", "2048")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", arrow_batch)
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # throughput GC: G1's GCLocker stalls on Arrow's JNI-critical sections
        # serialize high-thread-count Arrow-UDF stages (measured 4x slowdown
        # at local[32]); ParallelGC has no such interaction.  On a real
        # cluster set the same via spark.executor.extraJavaOptions.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
